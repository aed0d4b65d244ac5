"""CCNet-style perplexity bucketing (operators/perplexity.py): the Spark
pipeline is pinned against a pure-Python replica of the add-one bigram
LM, plus edge-case and threshold-contract checks. The cross-engine
DuckDB oracle runs via tests/test_queries_oracle.py (query
``ccnet_perplexity_buckets``)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from go_crawler_spark.operators.perplexity import (
    HEAD,
    MIDDLE,
    TAIL,
    bucket_by_thresholds,
    lm_counts,
    perplexity_scores,
    score_thresholds,
)

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps again and again today"),
    (3, "spark engines shuffle data over the cluster the cluster"),
    (4, "the quick brown fox"),
    (5, "zzz qqq completely unrelated gibberish words"),
    (6, ""),  # no tokens → no score row
    (7, "single"),  # one token, no bigram → no score row
    (8, "the the the the the"),
    (9, "Punct-only!!! ??? ..."),  # normalizes to punct-free tokens
]


def _norm(t: str) -> str:
    t = re.sub(r"[^a-z0-9\s]", "", t.lower())
    return re.sub(r"\s+", " ", t).strip()


def _toks(t: str) -> list[str]:
    n = _norm(t)
    return n.split(" ") if n else []


def _replica(rows, ref_pred, min_count):
    ref = [_toks(t) for i, t in rows if ref_pred(i)]
    unic = Counter(w for ts in ref for w in ts)
    bigc = Counter(
        (ts[i], ts[i + 1]) for ts in ref for i in range(len(ts) - 1)
    )
    bigc = Counter({k: c for k, c in bigc.items() if c >= min_count})
    v = len(unic)
    out = {}
    for i, t in rows:
        ts = _toks(t)
        prs = [(ts[j], ts[j + 1]) for j in range(len(ts) - 1)]
        if not prs:
            continue
        s = sum(
            round(
                math.log(bigc.get(p, 0) + 1)
                - math.log(unic.get(p[0], 0) + v + 1),
                9,
            )
            for p in prs
        )
        out[i] = (len(prs), round(-s / len(prs), 6))
    return out


@pytest.fixture(scope="module")
def ppl_docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


class TestPerplexity:
    def test_scores_match_python_replica(self, spark, ppl_docs):
        for min_count in (1, 2):
            big, uni, v = lm_counts(
                ppl_docs.filter("doc_id % 3 != 0"), min_count=min_count
            )
            got = {
                r["doc_id"]: (r["n_bigrams"], r["avg_neg_logp"])
                for r in perplexity_scores(ppl_docs, big, uni, v).collect()
            }
            want = _replica(ROWS, lambda i: i % 3 != 0, min_count)
            assert set(got) == set(want)
            for k, (n, s) in want.items():
                assert got[k][0] == n
                assert got[k][1] == pytest.approx(s, abs=1e-12)

    def test_tokenless_docs_have_no_row(self, spark, ppl_docs):
        big, uni, v = lm_counts(ppl_docs, min_count=1)
        ids = {
            r["doc_id"]
            for r in perplexity_scores(ppl_docs, big, uni, v).collect()
        }
        assert 6 not in ids and 7 not in ids  # empty / single-token

    def test_oov_only_doc_gets_uniform_penalty(self, spark):
        # a doc of entirely unseen tokens gets exactly the uniform OOV
        # penalty ln(V+1) per token — worse than any document whose
        # bigrams were all observed in training. (It is NOT the global
        # maximum: an unseen bigram after a FREQUENT context word is
        # more surprising under add-one smoothing, by design.)
        rows = ROWS + [(10, "xyzzy plugh frobnicate quux")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        big, uni, v = lm_counts(docs.filter("doc_id <= 5"), min_count=1)
        got = {
            r["doc_id"]: r["avg_neg_logp"]
            for r in perplexity_scores(docs, big, uni, v).collect()
        }
        assert got[10] == pytest.approx(math.log(v + 1), abs=1e-6)
        # doc 4 is a verbatim prefix of training doc 1: all bigrams seen
        assert got[10] > got[4]

    def test_bucket_contract(self, spark, ppl_docs):
        big, uni, v = lm_counts(ppl_docs, min_count=1)
        scored = perplexity_scores(ppl_docs, big, uni, v).persist()
        t1, t2 = score_thresholds(scored, exact=True)
        assert t1 <= t2
        out = bucket_by_thresholds(scored, t1, t2).collect()
        for r in out:
            want = (
                HEAD
                if r["avg_neg_logp"] <= t1
                else MIDDLE if r["avg_neg_logp"] <= t2 else TAIL
            )
            assert r["bucket"] == want
        # every bucket is inhabited at 1/3-2/3 cuts on distinct scores
        assert {r["bucket"] for r in out} == {HEAD, MIDDLE, TAIL}

    def test_min_count_prunes_bigram_table(self, spark, ppl_docs):
        big1, _, _ = lm_counts(ppl_docs, min_count=1)
        big2, _, _ = lm_counts(ppl_docs, min_count=2)
        assert big2.count() < big1.count()
        assert big2.filter("c2 < 2").count() == 0
