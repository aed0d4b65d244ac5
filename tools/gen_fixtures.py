#!/usr/bin/env python
"""Generate expected-output fixtures for the driver-contract queries that
have no closed-form ANSI-SQL oracle (crawl schedule, LSH tiers, IVF ANN,
streaming metrics, multimodal features).

Every fixture is computed by an INDEPENDENT implementation — the
pure-Python crawl simulator (go_crawler_spark/simulator.py), pure
numpy/python re-derivations of the minhash/simhash/LSH/IVF math using
tools/xxh64.py (a from-scratch xxhash64 pinned against F.xxhash64) — so an
engine bug cannot leak into its own oracle. The one exception is
``streaming_host_metrics``: its expected table is the BATCH DataFrame
evaluation of the same aggregation (HLL approx_count_distinct is not
reasonably re-derivable), which pins stream-vs-batch equality plus
stability.

Fixtures land in fixtures/*.parquet as single files, keyed by ``sf``
(documents/embeddings-derived) or ``scale`` (synthetic-corpus-derived);
the DuckDB oracle picks the key from the registered tables' row counts.
Rerun after changing datagen, the simulator, or any fixtured operator:

    python tools/gen_fixtures.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.xxh64 import xxh64_str  # noqa: E402

FIXTURES = os.path.join(REPO, "fixtures")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SFS = ("0.001", "0.01", "0.1")
SCALES = {"0.001": 48, "0.01": 240, "0.1": 1200}  # __spark_entry__._crawl_scale

# ---------------------------------------------------------------------------
# text normalization — ASCII-exact replica of functions/text.py (Java regex
# \s is ASCII-only; Spark trim strips 0x20 only)
# ---------------------------------------------------------------------------

_NON_ALNUM = re.compile(r"[^a-z0-9 \t\n\x0b\f\r]")
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def normalize_for_fingerprint(text: str) -> str:
    return _WS.sub(" ", _NON_ALNUM.sub("", text.lower())).strip(" ")


def ws_tokens(s: str) -> list[str]:
    """F.split(trim(s), '\\s+') semantics: split of '' yields ['']."""
    return _WS.split(s.strip(" "))


def token_ngrams(text: str, n: int = 3) -> list[str]:
    toks = ws_tokens(normalize_for_fingerprint(text))
    if len(toks) - (n - 1) < 1:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


# ---------------------------------------------------------------------------
# inputs
# ---------------------------------------------------------------------------


def load_documents(sf: str) -> list[tuple[int, str]]:
    t = pq.read_table(os.path.join(TESTDATA, f"sf{sf}", "documents.parquet"))
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def load_embeddings(sf: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(os.path.join(TESTDATA, f"sf{sf}", "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    order = np.argsort(ids)
    return ids[order], vecs[order]


def write(name: str, rows: list[dict], schema: pa.Schema) -> None:
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, os.path.join(FIXTURES, f"{name}.parquet"))
    print(f"{name}: {len(rows)} rows")


# ---------------------------------------------------------------------------
# crawl fixtures (pure-Python simulator)
# ---------------------------------------------------------------------------


def gen_crawl_flagship() -> None:
    from go_crawler_spark.config import CrawlConfig
    from go_crawler_spark.datagen import default_seeds, generate_corpus_dict
    from go_crawler_spark.simulator import simulate

    rows = []
    for sf, scale in SCALES.items():
        cfg = CrawlConfig(max_count=30, host_slots_per_round=4)
        sim = simulate(generate_corpus_dict(scale, 42), default_seeds(), cfg)
        for it in sim.schedule:
            rows.append(
                dict(url=it.url, kind=it.kind, depth=it.depth, seq=it.seq,
                     host=it.host, enqueue_round=it.enqueue_round, scale=scale)
            )
    write(
        "crawl_flagship",
        rows,
        pa.schema(
            [("url", pa.string()), ("kind", pa.string()), ("depth", pa.int32()),
             ("seq", pa.int64()), ("host", pa.string()),
             ("enqueue_round", pa.int32()), ("scale", pa.int32())]
        ),
    )


def gen_crawl_trap_refresh() -> None:
    """Expected fetched-log of the in-loop trap defense: the pure-Python
    simulator (go_crawler_spark/simulator.py — an independent sequential
    implementation, bit-for-bit parity pinned by tests/test_traps.py) over
    the deterministic trap universe (datagen.trap_corpus_dict): the /gen/
    template becomes prolific + content-poor during the crawl, the round-2
    census flags it, and its minted grandchildren die as skipped_trap while
    the /real/ chain keeps fetching."""
    from go_crawler_spark.config import CrawlConfig
    from go_crawler_spark.datagen import trap_corpus_dict, trap_seeds
    from go_crawler_spark.simulator import simulate

    rows = []
    for sf, scale in SCALES.items():
        cfg = CrawlConfig(max_count=500)
        sim = simulate(
            trap_corpus_dict(scale), trap_seeds(), cfg,
            trap_refresh_rounds=1, trap_min_urls=20,
        )
        for it in sim.schedule:
            if it.fetch_round < 0:
                continue
            rows.append(
                dict(url=it.url, kind=it.kind, depth=it.depth, seq=it.seq,
                     round=it.fetch_round, status=it.status, scale=scale)
            )
    write(
        "crawl_trap_refresh",
        rows,
        pa.schema(
            [("url", pa.string()), ("kind", pa.string()), ("depth", pa.int32()),
             ("seq", pa.int64()), ("round", pa.int32()),
             ("status", pa.string()), ("scale", pa.int32())]
        ),
    )


_ANCHOR_TAG_RE = re.compile(r"<a\b([^>]*)>(.*?)</a\s*>", re.I | re.S)
_ANCHOR_HREF_RE = re.compile(
    r"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)
_ANCHOR_INNER_TAG_RE = re.compile(r"<[^>]*>")


def gen_anchor_pairs() -> None:
    """Expected (dst, anchor) pairs for anchor_text_agg — an INDEPENDENT
    regex-based parse (vs the engine's HTMLParser subclass in
    functions/htmlx.py::extract_anchor_texts): find <a ...>...</a> spans,
    take the first href, strip nested markup, unescape entities, collapse
    whitespace, drop empties, strip the fragment and absolutize."""
    import html as _html
    from urllib.parse import urljoin

    from go_crawler_spark.datagen import generate_corpus_dict, page_url

    rows = []
    for sf, scale in SCALES.items():
        corpus = generate_corpus_dict(scale, 42)
        for i in range(scale):
            u = page_url(i)
            body = corpus[u].decode("utf-8", "replace")
            for m in _ANCHOR_TAG_RE.finditer(body):
                hm = _ANCHOR_HREF_RE.search(m.group(1))
                if not hm:
                    continue
                href = _html.unescape(
                    hm.group(1) or hm.group(2) or hm.group(3) or ""
                )
                text = " ".join(
                    _html.unescape(
                        _ANCHOR_INNER_TAG_RE.sub("", m.group(2))
                    ).split()
                )
                if not text:
                    continue
                dst = urljoin(u, href.split("#", 1)[0])
                rows.append(dict(dst=dst, anchor=text, scale=scale))
    write(
        "anchor_pairs",
        rows,
        pa.schema(
            [("dst", pa.string()), ("anchor", pa.string()),
             ("scale", pa.int32())]
        ),
    )


def gen_crawl_children() -> None:
    from go_crawler_spark.datagen import page_html, page_url
    from go_crawler_spark.functions.htmlx import resolve_links_and_assets

    rows = []
    for sf, scale in SCALES.items():
        for i in range(scale):
            u = page_url(i)
            for kind, child, pos in resolve_links_and_assets(
                u, page_html(i, scale, 42)
            ):
                rows.append(
                    dict(url=u, kind=kind, child_url=child, pos=pos, scale=scale)
                )
    write(
        "crawl_children",
        rows,
        pa.schema(
            [("url", pa.string()), ("kind", pa.string()),
             ("child_url", pa.string()), ("pos", pa.int32()),
             ("scale", pa.int32())]
        ),
    )


# ---------------------------------------------------------------------------
# simhash (independent re-derivation; pigeonhole ⇒ expected = ALL pairs
# with hamming ≤ 3)
# ---------------------------------------------------------------------------


def simhash_of(text: str) -> int:
    toks = ws_tokens(normalize_for_fingerprint(text))
    hs = np.array([xxh64_str(t) for t in toks], dtype=np.int64).astype(np.uint64)
    if len(hs) == 0:
        return 0
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    sim = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            sim |= np.uint64(1) << np.uint64(i)
    return int(sim.astype(np.int64))


def gen_simhash_pairs() -> None:
    rows = []
    for sf in SFS:
        docs = load_documents(sf)
        ids = np.array([d for d, _ in docs], dtype=np.int64)
        sims = np.array([simhash_of(t) for _, t in docs], dtype=np.int64).astype(np.uint64)
        n = len(ids)
        for i in range(n):
            x = sims[i] ^ sims[i + 1 :]
            hd = np.array([bin(int(v)).count("1") for v in x], dtype=np.int32)
            for j in np.flatnonzero(hd <= 3):
                a, b = int(ids[i]), int(ids[i + 1 + j])
                lo, hi = (a, b) if a < b else (b, a)
                rows.append(dict(id_a=lo, id_b=hi, hamming=int(hd[j]), sf=sf))
    write(
        "simhash_pairs",
        rows,
        pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()),
             ("hamming", pa.int32()), ("sf", pa.string())]
        ),
    )


# ---------------------------------------------------------------------------
# minhash + LSH banding (independent re-derivation of the banded buckets;
# numpy permutation params shared with the operator via _minhash_params —
# a fixed published constant of the scheme, not engine execution)
# ---------------------------------------------------------------------------


def gen_minhash_pairs(threshold: float = 0.5) -> None:
    from go_crawler_spark.operators.dedup_corpus import _MERSENNE, _minhash_params

    n_hashes, n_bands, shingle_n, seed = 64, 16, 3, 42
    rpb = n_hashes // n_bands
    a, b = _minhash_params(n_hashes, seed)
    au = a.astype(np.uint64)[:, None]
    bu = b.astype(np.uint64)[:, None]
    mers = np.uint64(_MERSENNE)
    mix1 = np.uint64(0x9E3779B97F4A7C15)
    mix2 = np.uint64(0xBF58476D1CE4E5B9)

    rows = []
    for sf in SFS:
        docs = load_documents(sf)
        shingle_sets = {}
        buckets: dict[tuple[int, int], list[int]] = {}
        for doc_id, text in docs:
            sh = token_ngrams(text, shingle_n)
            shingle_sets[doc_id] = set(sh)
            if sh:
                h = np.array([xxh64_str(s) for s in sh], dtype=np.int64).astype(np.uint64)
                mins = ((au * h[None, :] + bu) % mers).min(axis=1)
            else:
                mins = np.full(n_hashes, mers, dtype=np.uint64)
            banded = mins.reshape(n_bands, rpb)
            bh = np.full(n_bands, mix1, dtype=np.uint64)
            for r in range(rpb):
                bh = (bh ^ (banded[:, r] + mix1)) * mix2
            for bi in range(n_bands):
                buckets.setdefault((bi, int(bh[bi].astype(np.int64))), []).append(doc_id)
        pairs = set()
        for members in buckets.values():
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    pairs.add((ms[i], ms[j]))
        for ia, ib in sorted(pairs):
            sa, sb = shingle_sets[ia], shingle_sets[ib]
            union = len(sa | sb)
            jac = (len(sa & sb) / union) if union else 0.0
            if jac >= threshold:
                rows.append(dict(id_a=ia, id_b=ib, jaccard=jac, sf=sf))
    write(
        "minhash_pairs",
        rows,
        pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()),
             ("jaccard", pa.float64()), ("sf", pa.string())]
        ),
    )


# ---------------------------------------------------------------------------
# embedding LSH buckets + IVF candidate sets (independent numpy)
# ---------------------------------------------------------------------------


def gen_neardup_components() -> None:
    """Union-find over the (independently derived) minhash near-dup pairs —
    expected output of dedup_corpus.connected_components over those edges.
    Runs after gen_minhash_pairs (reads its parquet)."""
    data = pq.read_table(os.path.join(FIXTURES, "minhash_pairs.parquet")).to_pydict()
    rows = []
    for sf in SFS:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, s in zip(data["id_a"], data["id_b"], data["sf"]):
            if s != sf:
                continue
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for node in sorted(parent):
            rows.append(dict(node=node, component=find(node), sf=sf))
    write(
        "neardup_components",
        rows,
        pa.schema(
            [("node", pa.int64()), ("component", pa.int64()), ("sf", pa.string())]
        ),
    )


def gen_embedding_lsh_buckets(
    n_planes: int = 4, n_tables: int = 32, dim: int = 64, seed: int = 7
) -> None:
    planes = np.random.RandomState(seed).standard_normal((n_tables, n_planes, dim))
    rows = []
    for sf in SFS:
        ids, vecs = load_embeddings(sf)
        for vid, v in zip(ids, vecs):
            signs = (planes @ v) > 0  # (n_tables, n_planes)
            buckets = (signs.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
            for ti, bk in enumerate(buckets):
                rows.append(
                    dict(vec_id=int(vid), table_idx=ti, bucket=int(bk), sf=sf)
                )
    write(
        "embedding_lsh_buckets",
        rows,
        pa.schema(
            [("vec_id", pa.int64()), ("table_idx", pa.int32()),
             ("bucket", pa.int64()), ("sf", pa.string())]
        ),
    )


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def gen_ivf_candidates(
    n_cells: int = 8, n_probe: int = 4, sample_rows: int = 4096,
    iters: int = 5, seed: int = 42,
) -> None:
    """Replicates operators/similarity.py train_ivf_centroids + ivf_assign +
    the probe selection of ivf_topk (sample = vectors sorted by vec_id)."""
    rows = []
    for sf in SFS:
        ids, vecs = load_embeddings(sf)
        sample = _normalize_rows(vecs[:sample_rows])
        rng = np.random.RandomState(seed)
        centroids = sample[
            rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
        ]
        for _ in range(iters):
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(len(centroids)):
                members = sample[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = _normalize_rows(centroids)
        cells = np.argmax(_normalize_rows(vecs) @ centroids.T, axis=1)

        qmask = ids < 3
        qids = ids[qmask]
        qm = _normalize_rows(vecs[qmask])
        probes = np.argsort(-(qm @ centroids.T), axis=1)[:, :n_probe]
        for qi, qid in enumerate(qids):
            probe_set = set(int(c) for c in probes[qi])
            for vid, cell in zip(ids, cells):
                if int(cell) in probe_set:
                    rows.append(dict(query_id=int(qid), vec_id=int(vid), sf=sf))
    write(
        "ann_ivf_candidates",
        rows,
        pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()), ("sf", pa.string())]),
    )


# ---------------------------------------------------------------------------
# multimodal features (pure-python replica of the stub decode)
# ---------------------------------------------------------------------------


def _media_payloads(n: int, seed: int):
    import random

    kinds = ("image", "audio", "video")
    for i in range(n):
        rng = random.Random((seed << 16) ^ i)
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(128 + (i % 64) * 7))
        duration = 3000 + 100 * (i % 10) if kind == "video" else None
        yield i, kind, payload, duration


def gen_multimodal_frames(n: int = 64, seed: int = 42, every_ms: int = 1000) -> None:
    """Replicates operators/multimodal.py frame_sample: video rows only,
    timestamps sequence(0, duration_ms-1, step), frame = 64-byte payload
    window at offset (ts % 997)."""
    rows = []
    for i, kind, payload, duration in _media_payloads(n, seed):
        if kind != "video":
            continue
        for ts in range(0, max(duration - 1, 0) + 1, every_ms):
            start = ts % 997  # 0-based; Spark substring is 1-based +1
            rows.append(
                dict(media_id=i, ts_ms=ts, frame_bytes=payload[start : start + 64])
            )
    write(
        "multimodal_frames",
        rows,
        pa.schema(
            [("media_id", pa.int64()), ("ts_ms", pa.int32()),
             ("frame_bytes", pa.binary())]
        ),
    )


def gen_multimodal(n: int = 64, seed: int = 42) -> None:
    rows = []
    for i, kind, payload, _duration in _media_payloads(n, seed):
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=32, range=(0, 256))
        total = hist.sum()
        feats = (hist / total if total else hist).astype(np.float64)
        # same left-fold order as F.aggregate over the feature array
        acc = 0.0
        for x in feats.tolist():
            acc = acc + x
        rows.append(dict(media_id=i, kind=kind, n_bytes=len(payload), feature_l1=acc))
    write(
        "multimodal_features",
        rows,
        pa.schema(
            [("media_id", pa.int64()), ("kind", pa.string()),
             ("n_bytes", pa.int64()), ("feature_l1", pa.float64())]
        ),
    )


# ---------------------------------------------------------------------------
# streaming host metrics (batch evaluation of the same aggregation — pins
# stream==batch; HLL distinct is engine-defined)
# ---------------------------------------------------------------------------


def gen_streaming_host_metrics() -> None:
    from pyspark.sql import SparkSession

    from go_crawler_spark.datagen import generate_pages_df
    from go_crawler_spark.streaming.pipeline import (
        extract_children_stream,
        windowed_host_metrics,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("gen-fixtures")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    try:
        for sf, scale in SCALES.items():
            pages = generate_pages_df(spark, scale, seed=42)
            metrics = windowed_host_metrics(extract_children_stream(pages))
            for r in metrics.collect():
                rows.append(
                    dict(win_start=r["win_start"], host=r["host"],
                         links_discovered=r["links_discovered"],
                         assets_found=r["assets_found"],
                         approx_distinct_urls=r["approx_distinct_urls"],
                         scale=scale)
                )
    finally:
        spark.stop()
    write(
        "streaming_host_metrics",
        rows,
        pa.schema(
            [("win_start", pa.timestamp("us")), ("host", pa.string()),
             ("links_discovered", pa.int64()), ("assets_found", pa.int64()),
             ("approx_distinct_urls", pa.int64()), ("scale", pa.int32())]
        ),
    )


def gen_robots_rules() -> None:
    """Expected RFC 9309 parse of the synthetic robots corpus
    (functions/robots.py::SYNTHETIC_ROBOTS_CORPUS — shared INPUT; the
    parse below is an independent implementation of RFC 9309 §2.2:
    regex-driven line classification + index-based group spans, vs the
    engine's sequential state machine)."""
    import re as _re

    from go_crawler_spark.functions.robots import SYNTHETIC_ROBOTS_CORPUS

    line_re = _re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*$")

    def indep_regex(pat: str) -> str:
        end = pat.endswith("$")
        core = pat[:-1] if end else pat
        out = []
        for ch in core:
            out.append(".*" if ch == "*" else _re.escape(ch))
        return "^" + "".join(out) + ("$" if end else "")

    rows = []
    for host, body in SYNTHETIC_ROBOTS_CORPUS:
        # classify every line first
        parsed = []  # (kind, value)
        for ln in body.split("\n"):
            ln = ln.split("#")[0]
            m = line_re.match(ln)
            if not m:
                continue
            key, val = m.group(1).lower(), m.group(2)
            if key == "user-agent":
                parsed.append(("ua", val.lower()))
            elif key in ("allow", "disallow") and val:
                parsed.append((key, val))
        # group spans: a UA line opens a header unless the previous
        # line was also a UA line (then it extends it)
        i = 0
        while i < len(parsed):
            if parsed[i][0] != "ua":
                i += 1  # rule outside any group: undefined, skip
                continue
            agents = []
            while i < len(parsed) and parsed[i][0] == "ua":
                agents.append(parsed[i][1])
                i += 1
            while i < len(parsed) and parsed[i][0] != "ua":
                kind, pat = parsed[i]
                for a in agents:
                    rows.append(
                        dict(host=host, agent=a, allow=(kind == "allow"),
                             pattern=pat, pattern_len=len(pat),
                             regex=indep_regex(pat))
                    )
                i += 1
    write(
        "robots_rules",
        rows,
        pa.schema(
            [("host", pa.string()), ("agent", pa.string()),
             ("allow", pa.bool_()), ("pattern", pa.string()),
             ("pattern_len", pa.int32()), ("regex", pa.string())]
        ),
    )


def gen_cms_host_counts(depth: int = 4, width: int = 1 << 12) -> None:
    """Count-min-sketch estimates per documents.source — independent
    replica of operators/sketches.py: positions from the pinned
    multi-column xxhash64 fold (xxh64_long(seed_i, seed=xxh64_str(key)))
    and a pure-python counter table; all integer math, bit-exact."""
    from collections import Counter

    from go_crawler_spark.operators.sketches import CMS_SEED_BASE
    from tools.xxh64 import xxh64_long

    mask = (1 << 64) - 1
    rows = []
    for sf in SFS:
        t = pq.read_table(
            os.path.join(TESTDATA, f"sf{sf}", "documents.parquet"),
            columns=["source"],
        )
        sources = t["source"].to_pylist()
        counts = Counter(sources)
        table = [[0] * width for _ in range(depth)]
        pos_cache: dict[str, list[int]] = {}

        def positions(key: str) -> list[int]:
            p = pos_cache.get(key)
            if p is None:
                h0 = xxh64_str(key) & mask
                p = [xxh64_long(CMS_SEED_BASE + i, seed=h0) % width
                     for i in range(depth)]
                pos_cache[key] = p
            return p

        for key, n in counts.items():
            for i, p in enumerate(positions(key)):
                table[i][p] += n
        for key in sorted(counts):
            est = min(table[i][p] for i, p in enumerate(positions(key)))
            rows.append(dict(source=key, cms_count=est, sf=sf))
    write(
        "cms_host_counts",
        rows,
        pa.schema(
            [("source", pa.string()), ("cms_count", pa.int64()),
             ("sf", pa.string())]
        ),
    )


def gen_semdedup(k: int = 8, n_iters: int = 4, threshold: float = 0.4) -> None:
    """Independent replica of operators/semdedup.py's SemDeDup-style
    cluster+prune, following the operator's published determinism protocol
    (exact decimal element sums, 9-dp HALF_UP centroid quantization,
    (a*b).sum(-1) reductions — see the operator docstring). Pure python/
    numpy, no Spark."""
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    rows = []
    for sf in SFS:
        ids, vecs = load_embeddings(sf)
        nrm = np.sqrt((vecs * vecs).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        m = vecs / nrm[:, None]
        d = m.shape[1]
        cents = m[:k].copy()  # ids are sorted ascending in load_embeddings

        q15 = Decimal("1e-15")
        q9 = Decimal("1e-9")
        with localcontext() as ctx:
            ctx.prec = 50
            for _ in range(n_iters):
                dots = (m[:, None, :] * cents[None, :, :]).sum(axis=2)
                asg = np.argmax(dots, axis=1)
                for c in range(k):
                    members = m[asg == c]
                    if not len(members):
                        continue
                    for j in range(d):
                        s = sum(
                            (Decimal(repr(float(v))).quantize(
                                q15, rounding=ROUND_HALF_UP)
                             for v in members[:, j]),
                            Decimal(0),
                        )
                        mean = (s / len(members)).quantize(
                            q9, rounding=ROUND_HALF_UP)
                        cents[c, j] = float(mean)
        dots = (m[:, None, :] * cents[None, :, :]).sum(axis=2)
        asg = np.argmax(dots, axis=1)

        for c in sorted(set(asg.tolist())):
            sel = np.flatnonzero(asg == c)
            sub_ids = ids[sel]  # ids sorted ⇒ sub_ids sorted
            sub = m[sel]
            n = len(sub_ids)
            parent = list(range(n))

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            sims = (sub[:, None, :] * sub[None, :, :]).sum(axis=2)
            for i in range(n):
                for j in range(i + 1, n):
                    if sims[i, j] >= threshold:
                        ri, rj = find(i), find(j)
                        if ri != rj:
                            parent[max(ri, rj)] = min(ri, rj)
            for i in range(n):
                rows.append(dict(
                    vec_id=int(sub_ids[i]), cluster=int(c),
                    keep=bool(find(i) == i), sf=sf,
                ))
    write(
        "semdedup",
        rows,
        pa.schema(
            [("vec_id", pa.int64()), ("cluster", pa.int32()),
             ("keep", pa.bool_()), ("sf", pa.string())]
        ),
    )


def gen_redirect_edges() -> None:
    """INPUT fixture for the redirect_resolve contract query: the shared
    deterministic edge graph (datagen.redirect_edges) committed as parquet
    so the DuckDB oracle's hop-capped recursive CTE and the engine's
    pointer-doubling resolver read identical bytes. The implementations
    are independent; only the input is shared."""
    from go_crawler_spark.datagen import redirect_edges

    rows = [dict(src_url=s, dst_url=d) for s, d in redirect_edges(40)]
    write(
        "redirect_edges",
        rows,
        pa.schema([("src_url", pa.string()), ("dst_url", pa.string())]),
    )


def gen_canonical_pages() -> None:
    """INPUT fixture for canonical_consolidation: the deterministic
    (url, html) corpus (datagen.canonical_corpus_rows) committed per scale
    so the DuckDB oracle re-derives the canonical mapping from the raw
    html with its own regexp engine."""
    from go_crawler_spark.datagen import canonical_corpus_rows

    rows = []
    for sf, scale in SCALES.items():
        for url, html in canonical_corpus_rows(scale * 5):
            rows.append(dict(url=url, html=html, scale=scale))
    write(
        "canonical_pages",
        rows,
        pa.schema([("url", pa.string()), ("html", pa.string()),
                   ("scale", pa.int32())]),
    )


def gen_bpe_merges(n_merges: int = 12) -> None:
    """Independent pure-Python replica of
    operators/bpe.py::learn_bpe_merges (Sennrich et al. 2016): word
    census over the normalized token stream, then n_merges rounds of
    (overlapping) weighted pair counting + greedy left-to-right
    non-overlapping replacement. Ties broken (count DESC, left ASC,
    right ASC) — the same total order the Spark argmax uses."""
    rows = []
    for sf in SFS:
        vocab: dict[str, int] = {}
        for _doc_id, text in load_documents(sf):
            for w in ws_tokens(normalize_for_fingerprint(text)):
                if w:
                    vocab[w] = vocab.get(w, 0) + 1
        sym = {w: list(w) for w in vocab}
        for step in range(1, n_merges + 1):
            stats: dict[tuple[str, str], int] = {}
            for w, c in vocab.items():
                s = sym[w]
                for i in range(len(s) - 1):
                    p = (s[i], s[i + 1])
                    stats[p] = stats.get(p, 0) + c
            if not stats:
                break
            (left, right), cnt = min(
                stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            rows.append(
                dict(step=step, left=left, right=right,
                     merged=left + right, pair_count=cnt, sf=sf)
            )
            for w, s in sym.items():
                out: list[str] = []
                for t in s:
                    if out and out[-1] == left and t == right:
                        out[-1] = left + right
                    else:
                        out.append(t)
                sym[w] = out
    write(
        "bpe_merges",
        rows,
        pa.schema(
            [("step", pa.int32()), ("left", pa.string()),
             ("right", pa.string()), ("merged", pa.string()),
             ("pair_count", pa.int64()), ("sf", pa.string())]
        ),
    )


def gen_bpe_encode(n_merges: int = 12) -> None:
    """Independent replica of operators/bpe.py::bpe_encode_docs over the
    merges gen_bpe_merges learns: re-run the training loop (merges applied
    to the word census in rank order — after the last round ``sym[w]`` IS
    w's encoding under the learned table, the same sequential-rank rule
    the engine's encoder applies), then bill each document's token stream
    against the per-word piece counts."""
    rows = []
    for sf in SFS:
        docs = load_documents(sf)
        vocab: dict[str, int] = {}
        doc_words: list[tuple[int, list[str]]] = []
        for doc_id, text in docs:
            ws = [w for w in ws_tokens(normalize_for_fingerprint(text)) if w]
            doc_words.append((doc_id, ws))
            for w in ws:
                vocab[w] = vocab.get(w, 0) + 1
        sym = {w: list(w) for w in vocab}
        for _step in range(n_merges):
            stats: dict[tuple[str, str], int] = {}
            for w, c in vocab.items():
                s = sym[w]
                for i in range(len(s) - 1):
                    p = (s[i], s[i + 1])
                    stats[p] = stats.get(p, 0) + c
            if not stats:
                break
            (left, right), _cnt = min(
                stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            for w, s in sym.items():
                out: list[str] = []
                for t in s:
                    if out and out[-1] == left and t == right:
                        out[-1] = left + right
                    else:
                        out.append(t)
                sym[w] = out
        for doc_id, ws in doc_words:
            if not ws:
                continue
            rows.append(
                dict(
                    doc_id=doc_id,
                    n_words=len(ws),
                    n_pieces=sum(len(sym[w]) for w in ws),
                    sf=sf,
                )
            )
    write(
        "bpe_encode",
        rows,
        pa.schema(
            [("doc_id", pa.int64()), ("n_words", pa.int64()),
             ("n_pieces", pa.int64()), ("sf", pa.string())]
        ),
    )


def main() -> None:
    os.makedirs(FIXTURES, exist_ok=True)
    gen_cms_host_counts()
    gen_semdedup()
    gen_crawl_flagship()
    gen_crawl_trap_refresh()
    gen_anchor_pairs()
    gen_crawl_children()
    gen_simhash_pairs()
    gen_minhash_pairs()
    gen_neardup_components()
    gen_embedding_lsh_buckets()
    gen_ivf_candidates()
    gen_multimodal()
    gen_multimodal_frames()
    gen_streaming_host_metrics()
    gen_robots_rules()
    gen_redirect_edges()
    gen_canonical_pages()
    gen_bpe_merges()
    gen_bpe_encode()


if __name__ == "__main__":
    main()
