"""Sliding-window chunker: model-equivalence vs a pure-Python replica of
the window rule plus edge cases (short docs, stride > size, stride == size,
empty/punctuation-only text)."""

from __future__ import annotations

import re

import pytest

from go_crawler_spark.operators.chunking import chunk_windows


def _model(texts, size, stride):
    """Independent replica: normalize, tokenize, window."""
    out = []
    for doc_id, text in texts:
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", text.lower())).strip()
        if not norm:
            continue
        toks = norm.split(" ")
        n = len(toks)
        s = 1
        idx = 0
        last = max(min(n - size + stride, n), 1)
        while s <= last:
            idx += 1
            win = toks[s - 1 : s - 1 + size]
            out.append((doc_id, idx, s, len(win), " ".join(win)))
            s += stride
    return sorted(out)


def _run(spark, texts, size, stride):
    df = spark.createDataFrame(texts, "doc_id int, text string")
    rows = chunk_windows(df, size=size, stride=stride).collect()
    return sorted(tuple(r) for r in rows)


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()


def _doc(i, n):
    return (i, " ".join(WORDS[j % len(WORDS)] for j in range(n)))


@pytest.mark.parametrize(
    "size,stride", [(4, 3), (4, 4), (4, 8), (1, 1), (64, 48)]
)
def test_chunk_windows_model_equivalence(spark, size, stride):
    texts = [_doc(i, n) for i, n in enumerate([0, 1, 2, 3, 4, 5, 7, 8, 9, 16, 65, 200])]
    texts.append((99, "  ...  !!!  "))  # normalizes to empty -> no rows
    texts.append((98, "Punct, MIXED case; ok!"))
    assert _run(spark, texts, size, stride) == _model(texts, size, stride)


def test_chunk_windows_coverage_and_overlap(spark):
    # every token index is covered; consecutive windows overlap by
    # size - stride; only the last window may be short
    size, stride = 6, 4
    rows = _run(spark, [_doc(1, 23)], size, stride)
    covered = set()
    for _, idx, start, n_tokens, _text in rows:
        assert n_tokens == size or idx == len(rows)
        covered.update(range(start, start + n_tokens))
    assert covered == set(range(1, 24))
    starts = [r[2] for r in rows]
    assert starts == list(range(1, starts[-1] + 1, stride))


def test_chunk_windows_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_windows(df, size=0)
    with pytest.raises(ValueError):
        chunk_windows(df, stride=0)
