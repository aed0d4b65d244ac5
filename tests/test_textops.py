"""Tests for text-analysis functions and corpus dedup / similarity /
multimodal operators (the training-data pipeline layer)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_crawler_spark.functions import text as T
from go_crawler_spark.operators.dedup_corpus import (
    embedding_near_dups,
    exact_dedup,
    exact_dup_groups,
    minhash_near_dups,
    simhash_near_dups,
)
from go_crawler_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synthetic_media_df,
)
from go_crawler_spark.operators.similarity import brute_force_topk, ivf_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "The quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (3, "The quick brown fox jumps over the lazy dog near the river bend today"),  # near dup of 1
        (4, "Der schnelle braune Fuchs springt und ist nicht mit der Katze"),
        (5, "completely different content about spark engines and shuffles at scale"),
        (6, "El rapido zorro marron salta sobre el perro que es para una prueba"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTextFunctions:
    def test_token_count(self, spark):
        df = spark.createDataFrame([("a b  c",), ("",), ("  x ",)], "t string")
        got = [r[0] for r in df.select(T.token_count(F.col("t"))).collect()]
        assert got == [3, 0, 1]

    def test_lang_id(self, docs):
        got = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", T.lang_id(F.col("text")).alias("lang")).collect()}
        assert got[1] == "en"
        assert got[4] == "de"
        assert got[6] == "es"
        assert got[7] == "und"

    def test_quality_bounds(self, docs):
        scores = [r[0] for r in docs.select(T.quality_score(F.col("text"))).collect()]
        assert all(0.0 <= s <= 1.0 for s in scores)

    def test_fingerprint_normalization(self, spark):
        df = spark.createDataFrame(
            [("Hello,   World!",), ("hello world",)], "t string"
        )
        fps = [r[0] for r in df.select(T.fingerprint_md5(F.col("t"))).collect()]
        assert fps[0] == fps[1]

    def test_token_ngrams(self, spark):
        df = spark.createDataFrame([("a b c d",)], "t string")
        got = df.select(T.token_ngrams(F.col("t"), 2).alias("g")).collect()[0]["g"]
        assert got == ["a b", "b c", "c d"]


class TestExactDedup:
    def test_keeps_min_id(self, docs):
        kept = {r["doc_id"] for r in exact_dedup(docs, "text", "doc_id").collect()}
        assert 1 in kept and 2 not in kept
        assert {3, 4, 5, 6, 7} <= kept

    def test_groups(self, docs):
        groups = exact_dup_groups(docs, "text", "doc_id").collect()
        assert len(groups) == 1
        assert groups[0]["member_ids"] == [1, 2]


class TestMinhashLSH:
    def test_near_dups_found(self, docs):
        pairs = minhash_near_dups(
            docs, "text", "doc_id", n_hashes=64, n_bands=16, threshold=0.5
        ).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in got       # exact dup → jaccard 1.0
        assert (1, 3) in got       # one-token change → high jaccard
        assert all({a, b} != {1, 5} for a, b in got)  # unrelated not paired

    def test_jaccard_values(self, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_near_dups(docs, "text", "doc_id", threshold=0.3).collect()
        }
        assert pairs[(1, 2)] == pytest.approx(1.0)
        assert 0.3 < pairs[(1, 3)] < 1.0


class TestSimhash:
    def test_exact_dups_distance_zero(self, docs):
        pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dups(docs, "text", "doc_id", max_hamming=6).collect()}
        assert pairs.get((1, 2)) == 0
        assert all({a, b} != {1, 5} for a, b in pairs)

    def test_near_dup_within_guarantee(self, spark):
        """The 4×16-bit chunk scheme guarantees recall for hamming ≤ 3
        (pigeonhole); one changed token in a long doc lands within it."""
        base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, base + " bank"), (3, base + " bend"), (5, "totally unrelated words here")],
            "doc_id long, text string",
        )
        pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dups(df, "text", "doc_id", max_hamming=3).collect()}
        assert (1, 3) in pairs and pairs[(1, 3)] <= 3
        assert all({a, b} != {1, 5} for a, b in pairs)


class TestEmbeddingOps:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rng = np.random.RandomState(0)
        base = rng.standard_normal(16)
        rows = [
            (1, base.tolist()),
            (2, (base + 0.01 * rng.standard_normal(16)).tolist()),  # near dup
            (3, rng.standard_normal(16).tolist()),
            (4, rng.standard_normal(16).tolist()),
            (5, (-base).tolist()),  # anti-correlated
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_embedding_near_dups(self, vecs):
        pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(vecs, "embedding", "vec_id", dim=16, threshold=0.95).collect()}
        assert (1, 2) in pairs
        assert all({a, b} != {1, 5} for a, b in pairs)

    def test_brute_force_topk(self, spark, vecs):
        queries = spark.createDataFrame(
            [(100, [float(x) for x in np.random.RandomState(0).standard_normal(16)])],
            "query_id long, query_vec array<double>",
        )
        top = brute_force_topk(vecs, queries, k=3).collect()
        assert len(top) == 3
        assert top[0]["vec_id"] == 1  # query == base vector of id 1
        assert top[0]["score"] == pytest.approx(1.0)
        assert [r["rank"] for r in sorted(top, key=lambda r: r["rank"])] == [1, 2, 3]

    def test_ivf_matches_brute_force_top1(self, spark, vecs):
        queries = spark.createDataFrame(
            [(100, [float(x) for x in np.random.RandomState(0).standard_normal(16)])],
            "query_id long, query_vec array<double>",
        )
        ivf = ivf_topk(vecs, queries, k=1, n_cells=2, n_probe=2)
        assert ivf.collect()[0]["vec_id"] == 1


class TestMultimodal:
    def test_feature_extraction(self, spark):
        media = synthetic_media_df(spark, 12)
        feats = extract_features(media).collect()
        assert len(feats) == 12
        for r in feats:
            assert len(r["feature"]) == 32
            assert r["n_bytes"] > 0
            assert abs(sum(r["feature"]) - 1.0) < 1e-9  # L1-normalized histogram

    def test_deterministic(self, spark):
        media = synthetic_media_df(spark, 6)
        a = sorted((r["media_id"], tuple(r["feature"])) for r in extract_features(media).collect())
        b = sorted((r["media_id"], tuple(r["feature"])) for r in extract_features(media).collect())
        assert a == b

    def test_auto_mode_without_pil_is_stub(self, spark):
        import go_crawler_spark.operators.multimodal as mm

        if mm._pil_image() is not None:
            pytest.skip("PIL installed; auto resolves to real")
        media = synthetic_media_df(spark, 3)
        a = sorted(map(tuple, extract_features(media, decode="auto").collect()))
        b = sorted(map(tuple, extract_features(media, decode="stub").collect()))
        assert a == b
        with pytest.raises(RuntimeError, match="PIL"):
            extract_features(media, decode="real").collect()

    def test_real_decode_with_pil(self, spark):
        """Real codec path: valid PNG → luminance histogram; corrupt
        payload → NULL feature row, never a task failure."""
        import go_crawler_spark.operators.multimodal as mm

        if mm._pil_image() is None:
            pytest.skip("PIL not installed in this container")
        import io

        Image = mm._pil_image()
        buf = io.BytesIO()
        Image.new("L", (8, 8), color=128).save(buf, format="PNG")
        rows = [
            (0, "image", buf.getvalue(), None),
            (1, "image", b"not an image", None),
        ]
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in extract_features(media, decode="real").collect()}
        feat = out[0]["feature"]
        assert feat is not None and len(feat) == 32
        assert abs(sum(feat) - 1.0) < 1e-9
        assert feat[16] == 1.0  # all pixels = 128 → bin 16
        assert out[1]["feature"] is None

    def test_frame_sample(self, spark):
        media = synthetic_media_df(spark, 9)
        frames = frame_sample(media, every_ms=1000).collect()
        assert frames
        vids = {r["media_id"] for r in frames}
        assert all(m % 3 == 2 for m in vids)  # only kind == video
        for r in frames:
            assert r["frame_bytes"] is not None
