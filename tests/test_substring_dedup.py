"""Exact duplicate-substring spans vs an independent pure-Python
implementation (dict-of-grams + manual interval merge), plus the excision
round-trip and the JVM-only plan guarantee."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from go_crawler_spark.operators.substring_dedup import (
    duplicate_ngram_spans,
    excise_duplicate_spans,
)

BOILER = "all rights reserved contact us at example dot com for details"
DOCS = [
    (1, f"alpha beta gamma {BOILER} delta epsilon"),
    (2, f"unrelated opening words {BOILER} and a different tail here"),
    # within-doc repeat: the same 4-gram twice in one document
    (3, "x y z repeat me now please repeat me now please tail words"),
    (4, "completely unique text with no duplicated windows at all okay"),
    (5, "short doc"),  # < k tokens: no windows
    # two overlapping duplicated regions merge into one maximal span
    (6, f"{BOILER} {BOILER}"),
]
K = 4


def py_spans(docs: list[tuple], k: int, min_count: int = 2) -> set[tuple]:
    toks = {i: re.split(r"\s+", t.strip().lower()) for i, t in docs}
    count: dict[tuple, int] = {}
    for i, tt in toks.items():
        for p in range(len(tt) - k + 1):
            g = tuple(tt[p:p + k])
            count[g] = count.get(g, 0) + 1
    out = set()
    for i, tt in toks.items():
        hits = [p for p in range(len(tt) - k + 1)
                if count[tuple(tt[p:p + k])] >= min_count]
        spans: list[list] = []  # [start, end, n]
        for p in hits:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
                spans[-1][2] += 1
            else:
                spans.append([p, p + k, 1])
        out |= {(i, s, e, n) for s, e, n in spans}
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_matches_pure_python(spark, docs_df):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_ngram_spans(docs_df, k=K).collect()
    }
    assert got == py_spans(DOCS, K)


def test_span_shapes(spark, docs_df):
    rows = {r["doc_id"]: r for r in duplicate_ngram_spans(docs_df, k=K).collect()
            if r["doc_id"] in (1, 4, 5)}
    # doc 1 carries one maximal span covering the shared boilerplate
    assert 1 in rows
    s1 = rows[1]
    t1 = DOCS[0][1].split()
    assert " ".join(t1[s1["span_start"]:s1["span_end"]]).find(
        "all rights reserved") != -1
    # unique and too-short docs have no spans
    assert 4 not in rows and 5 not in rows


def test_within_doc_repeat_detected(spark, docs_df):
    rows = [r for r in duplicate_ngram_spans(docs_df, k=K).collect()
            if r["doc_id"] == 3]
    assert rows, "a k-gram repeated inside one document must count"


def test_xxhash_variant_matches_md5(spark, docs_df):
    md5 = duplicate_ngram_spans(docs_df, k=K)
    xx = duplicate_ngram_spans(docs_df, k=K, hash_fn=F.xxhash64)
    assert sorted(map(tuple, md5.collect())) == sorted(map(tuple, xx.collect()))


def test_excision(spark, docs_df):
    spans = duplicate_ngram_spans(docs_df, k=K)
    clean = {r["doc_id"]: r for r in
             excise_duplicate_spans(docs_df, spans).collect()}
    # removed token counts equal total span lengths
    by_doc: dict[int, int] = {}
    for r in spans.collect():
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + (
            r["span_end"] - r["span_start"])
    for i, text in DOCS:
        assert clean[i]["n_removed_tokens"] == by_doc.get(i, 0)
    # untouched docs round-trip their tokens
    assert clean[4]["clean_text"] == DOCS[3][1].lower()
    # the boilerplate is gone from both carriers
    for i in (1, 2):
        assert "rights reserved" not in clean[i]["clean_text"]


def test_excision_pathological_alternating_spans(spark):
    """The linear gap-slice excision must stay correct on the worst case
    for a per-token exists() mask: a doc alternating duplicated and unique
    k-grams, i.e. ~tokens/2 disjoint spans. Oracle = a pure-Python token
    mask over the same spans."""
    # "d0 d0 d0 d0 u<i>" blocks: each 4-token run of "dup dup dup dup" is
    # duplicated across blocks (and in doc 99); the u<i> separators are
    # unique, so every block yields its own maximal span
    blocks = [f"dup dup dup dup u{i}" for i in range(50)]
    pathological = " ".join(blocks)
    docs = spark.createDataFrame(
        [(1, pathological), (99, "dup dup dup dup tail of the second doc")],
        "doc_id int, text string",
    )
    spans = duplicate_ngram_spans(docs, k=K)
    span_rows = [
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in spans.collect()
    ]
    assert sum(1 for d, *_ in span_rows if d == 1) == 50  # one span per block
    clean = {r["doc_id"]: r for r in
             excise_duplicate_spans(docs, spans).collect()}

    def py_excise(text: str, doc_spans: list[tuple]) -> tuple[str, int]:
        toks = re.split(r"\s+", text.strip().lower())
        drop = set()
        for s, e in doc_spans:
            drop |= set(range(s, e))
        kept = [t for i, t in enumerate(toks) if i not in drop]
        return " ".join(kept), len(toks) - len(kept)

    for doc_id, text in [(1, pathological),
                         (99, "dup dup dup dup tail of the second doc")]:
        want_text, want_n = py_excise(
            text, [(s, e) for d, s, e in span_rows if d == doc_id])
        assert clean[doc_id]["clean_text"] == want_text
        assert clean[doc_id]["n_removed_tokens"] == want_n


def test_plan_is_jvm_only(spark, docs_df):
    plan = duplicate_ngram_spans(
        docs_df, k=K
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
