"""Unit tests for the retrieval tier: BM25 scoring (operators/index.py::
bm25_topk) and reciprocal-rank fusion (operators/index.py::rrf_fuse).
Cross-engine DuckDB parity is pinned by tests/test_queries_oracle.py
(`bm25_topk_docs`, `hybrid_retrieval_rrf`); these tests pin the operator
SEMANTICS on hand-built corpora where the expected scores are computable
by hand from the published formulas (Robertson BM25 with the Lucene idf;
Cormack et al. 2009 RRF with k0=60)."""

from __future__ import annotations

import math

import pytest

from go_crawler_spark.operators.index import bm25_topk, rrf_fuse


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_expected(corpus, terms, k1=1.2, b=0.75):
    """Pure-Python replica with the repo's rounding protocol."""
    toks = {i: t.lower().split() for i, t in corpus}
    toks = {i: t for i, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    idf = {
        q: round(math.log((n - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1.0), 9)
        for q in terms
    }
    out = {}
    for i, t in toks.items():
        contribs = []
        for q in terms:
            tf = t.count(q)
            if not tf:
                continue
            dl = len(t)
            contribs.append(
                round(
                    idf[q] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)),
                    9,
                )
            )
        if contribs:
            out[i] = (len(contribs), round(sum(contribs), 6))
    return out


def test_bm25_matches_hand_formula(spark):
    corpus = [
        (0, "spark join spark window"),
        (1, "join window stream stream stream"),
        (2, "nothing matches here at all"),
        (3, "spark"),
    ]
    got = {
        r["doc_id"]: (r["n_hit_terms"], r["score"])
        for r in bm25_topk(
            _docs(spark, corpus), ["spark", "join", "stream"], top_n=10
        ).collect()
    }
    assert got == _bm25_expected(corpus, ["spark", "join", "stream"])


def test_bm25_rare_term_outscores_common(spark):
    # same tf/dl everywhere; the rarer term must carry the higher idf
    corpus = [(i, "common filler words here") for i in range(8)]
    corpus[0] = (0, "common rare words here")
    res = bm25_topk(_docs(spark, corpus), ["common", "rare"], top_n=10).collect()
    by_id = {r["doc_id"]: r["score"] for r in res}
    assert by_id[0] > max(v for k, v in by_id.items() if k != 0)


def test_bm25_length_normalization(spark):
    # equal tf: the shorter document scores higher (b > 0)
    corpus = [
        (0, "spark alpha"),
        (1, "spark alpha beta gamma delta epsilon zeta eta theta"),
    ]
    res = {r["doc_id"]: r["score"] for r in
           bm25_topk(_docs(spark, corpus), ["spark"], top_n=10).collect()}
    assert res[0] > res[1]


def test_bm25_empty_terms_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark, [(0, "x")]), [])


def test_bm25_top_n_and_tiebreak(spark):
    # four identical docs → identical scores; the slice keeps lowest ids
    corpus = [(i, "spark spark") for i in range(4)]
    res = bm25_topk(_docs(spark, corpus), ["spark"], top_n=2).collect()
    assert [r["doc_id"] for r in res] == [0, 1]


def _tier(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_hand_computed(spark):
    lex = _tier(spark, [(10, 1), (11, 2), (12, 3)])
    sem = _tier(spark, [(11, 1), (13, 2)])
    rows = {r["doc_id"]: r for r in
            rrf_fuse({"lex": lex, "sem": sem}, top_n=10).collect()}
    # doc 11 in both tiers: 1/62 + 1/61
    assert rows[11]["lex_rank"] == 2 and rows[11]["sem_rank"] == 1
    assert rows[11]["rrf_score"] == round(
        round(1 / 62, 9) + round(1 / 61, 9), 6)
    # doc 10 lex-only: sem_rank NULL, score 1/61
    assert rows[10]["sem_rank"] is None
    assert rows[10]["rrf_score"] == round(round(1 / 61, 9), 6)
    # doc 13 sem-only
    assert rows[13]["lex_rank"] is None
    assert rows[13]["rrf_score"] == round(round(1 / 62, 9), 6)
    # both-tier doc must outrank every single-tier doc here
    assert rows[11]["rrf_score"] > max(
        rows[10]["rrf_score"], rows[12]["rrf_score"], rows[13]["rrf_score"])


def test_rrf_order_and_topn(spark):
    lex = _tier(spark, [(i, i + 1) for i in range(5)])
    sem = _tier(spark, [(i, i + 1) for i in range(5)])
    out = rrf_fuse({"lex": lex, "sem": sem}, top_n=3).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]  # best ranks first


def test_rrf_tie_breaks_on_id(spark):
    # two docs with symmetric ranks across tiers → equal score, id order
    lex = _tier(spark, [(7, 1), (3, 2)])
    sem = _tier(spark, [(3, 1), (7, 2)])
    out = rrf_fuse({"lex": lex, "sem": sem}, top_n=10).collect()
    assert out[0]["rrf_score"] == out[1]["rrf_score"]
    assert [r["doc_id"] for r in out] == [3, 7]


def test_rrf_single_tier(spark):
    lex = _tier(spark, [(1, 1), (2, 2)])
    out = rrf_fuse({"lex": lex}, top_n=10).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0].asDict().keys() == {"doc_id", "lex_rank", "rrf_score"}


def test_rrf_empty_tiers_raises(spark):
    with pytest.raises(ValueError):
        rrf_fuse({})


# --- word_blocklist_gate (C4-style content gate; lives here with the
# other token-stream ops sharing the normalize+tokens pipeline) ---

from go_crawler_spark.operators.quality import word_blocklist_gate


def test_blocklist_counts_occurrences_not_distinct(spark):
    docs = _docs(spark, [(0, "bad bad good"), (1, "good fine")])
    rows = {r["doc_id"]: r for r in
            word_blocklist_gate(docs, ["bad"]).collect()}
    assert rows[0]["n_flagged"] == 2 and rows[0]["n_tokens"] == 3
    assert rows[0]["flagged_frac"] == round(2 / 3, 6)
    assert rows[0]["keep"] is False          # C4 default: any hit drops
    assert rows[1]["n_flagged"] == 0 and rows[1]["keep"] is True


def test_blocklist_threshold(spark):
    docs = _docs(spark, [(0, "bad x"), (1, "bad bad x"), (2, "bad bad bad")])
    got = {r["doc_id"]: r["keep"] for r in
           word_blocklist_gate(docs, ["bad"], max_flagged=2).collect()}
    assert got == {0: True, 1: True, 2: False}


def test_blocklist_whole_word_only(spark):
    # substring of a longer token must not match (word gate, not grep)
    docs = _docs(spark, [(0, "badly embedded notbad")])
    r = word_blocklist_gate(docs, ["bad"]).collect()[0]
    assert r["n_flagged"] == 0 and r["keep"] is True


def test_blocklist_normalization_case(spark):
    # gate runs on the normalized stream: case-insensitive match
    docs = _docs(spark, [(0, "BAD Bad bAd")])
    r = word_blocklist_gate(docs, ["bad"]).collect()[0]
    assert r["n_flagged"] == 3 and r["keep"] is False


def test_blocklist_empty_doc_and_empty_list(spark):
    docs = _docs(spark, [(0, ""), (1, "   ")])
    for r in word_blocklist_gate(docs, ["bad"]).collect():
        assert r["n_flagged"] == 0 and r["n_tokens"] == 0
        assert r["flagged_frac"] == 0.0 and r["keep"] is True
    docs2 = _docs(spark, [(0, "anything goes")])
    r = word_blocklist_gate(docs2, []).collect()[0]
    assert r["n_flagged"] == 0 and r["keep"] is True


# --- domain_quality_gate (RefinedWeb-style source-level filter) ---

import hashlib

from go_crawler_spark.operators.quality import domain_quality_gate


def _ddocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, domain string, text string")


def _w(tok: str) -> int:
    h = hashlib.md5(tok.encode()).hexdigest()
    return int(h[:2], 16) - 128


def test_domain_mean_is_token_weighted(spark):
    # one domain, two docs of different lengths: the statistic must be
    # Σscore/Σtokens over the domain stream, not a mean of per-doc means
    a, b = "alpha beta", "gamma gamma gamma gamma"
    docs = _ddocs(spark, [(0, "d.org", a), (1, "d.org", b)])
    toks = a.split() + b.split()
    expect = round(sum(_w(t) for t in toks) / len(toks), 6)
    rows = domain_quality_gate(docs, min_mean_w=-1e9).collect()
    assert all(r["domain_mean_w"] == expect for r in rows)
    assert all(r["domain_docs"] == 2 and r["keep"] is True for r in rows)


def test_domain_gate_splits_and_tags_every_doc(spark):
    docs = _ddocs(spark, [(0, "good.org", "alpha"), (1, "good.org", "alpha"),
                          (2, "bad.org", "beta")])
    wa, wb = _w("alpha"), _w("beta")
    thr = (wa + wb) / 2
    got = {r["doc_id"]: r["keep"] for r in
           domain_quality_gate(docs, min_mean_w=thr).collect()}
    hi_is_a = wa > wb
    assert got == {0: hi_is_a, 1: hi_is_a, 2: not hi_is_a}


def test_domain_min_docs_defers_low_evidence(spark):
    docs = _ddocs(spark, [(0, "solo.org", "alpha"),
                          (1, "big.org", "alpha"), (2, "big.org", "alpha")])
    got = {r["doc_id"]: r["keep"] for r in
           domain_quality_gate(docs, min_mean_w=-1e9, min_docs=2).collect()}
    assert got == {0: False, 1: True, 2: True}


def test_domain_all_empty_docs_mean_zero(spark):
    docs = _ddocs(spark, [(0, "e.org", ""), (1, "e.org", "   ")])
    rows = domain_quality_gate(docs).collect()
    assert all(r["domain_mean_w"] == 0.0 for r in rows)
    assert all(r["keep"] is False for r in rows)  # 0.0 > 0.0 is False
