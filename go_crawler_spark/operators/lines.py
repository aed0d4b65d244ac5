"""Line-level corpus cleaning [EXTENSION — LLM-data pipeline].

The reference stores fetched pages verbatim (cmd/crawler/main.go:330-360
saves raw bytes; internal/pageparser.go extracts links, never text lines).
A production webtext pipeline cleans page TEXT line-by-line before
training: C4 (Raffel et al. 2020, §2.2) retains only lines that end in
terminal punctuation and have enough words, drops code/boilerplate lines,
and drops pages left with too few lines; RefinedWeb (Penedo et al. 2023)
and MassiveText (Rae et al. 2021) additionally deduplicate EXACT lines
corpus-wide (navigation menus, cookie banners, footers repeat verbatim on
millions of pages), keeping one canonical occurrence.

``line_filters`` fuses both passes over one exploded line table.

Scale shape (the part that must survive 100 TB):
- The rule pass is map-only JVM (regexp + split on the line, no Python,
  no shuffle).
- The corpus-wide dedup NEVER window-sorts on the line key: a mega-dup
  line ("Accept cookies") would serialize one task. Instead the
  first-writer is a ``min(struct(id, idx))`` two-phase aggregate keyed on
  ``xxhash64(line)`` — partial min map-side, so the hot key arrives at
  the reducer as one row per upstream partition — and survivors are
  recovered with a semi-join on the (id, idx) COORDINATES, a unique,
  perfectly uniform key. Line text crosses exactly one exchange (the
  per-doc reassembly groupBy, keyed on the id).
- Reassembly sorts each doc's surviving lines inside ``array_sort`` on
  the collected (idx, line) structs — per-row work, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["line_filters", "LINE_TERMINAL_PUNCT_RE"]

# C4 rule 1: keep lines ending in terminal punctuation (period,
# exclamation, question mark, closing quote). Class syntax identical in
# Java regex and RE2 (the DuckDB oracle).
LINE_TERMINAL_PUNCT_RE = '[.!?"]$'


def line_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 3,
    dedup_lines: bool = True,
) -> DataFrame:
    """C4-style line filtering + RefinedWeb-style exact-line dedup.

    Rules, applied per line of ``\\n``-separated text (C4 §2.2):
    - keep only lines whose trimmed form ends in terminal punctuation;
    - keep only lines with at least ``min_words`` whitespace tokens;
    - drop lines containing ``{`` (code) or the word ``javascript``
      (C4 applies these page-level; line-level is the RefinedWeb
      refinement and strictly gentler on mixed pages);
    - after filtering (and dedup), drop documents with fewer than
      ``min_lines`` surviving lines.

    ``dedup_lines=True`` additionally removes every duplicate occurrence
    of a rule-surviving line corpus-wide, keeping the first writer in
    (id, line-index) order — deterministic under any partitioning.

    Returns one row per SURVIVING document:
    ``(id_col, clean_text, n_lines, n_kept, n_dropped_rules,
    n_dropped_dup)`` with clean_text the kept lines re-joined by ``\\n``
    in original order.
    """
    line_t = F.trim(F.col("line"))
    n_words = F.size(F.split(line_t, r"\s+"))
    rule_ok = (
        line_t.rlike(LINE_TERMINAL_PUNCT_RE)
        & (n_words >= min_words)
        & ~line_t.contains("{")
        & ~F.lower(line_t).contains("javascript")
    )

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_idx0", "line"),
    ).select(
        id_col,
        (F.col("_idx0") + 1).alias("idx"),
        "line",
        rule_ok.alias("_ok"),
    )

    passed = lines.filter("_ok").select(id_col, "idx", "line")

    if dedup_lines:
        # first-writer election: associative min over (id, idx) structs,
        # partial-aggregated map-side so a corpus-wide mega-dup line never
        # concentrates its occurrences on one reducer (the window
        # row_number alternative would).
        winners = (
            passed.groupBy(F.xxhash64(F.trim("line")).alias("_lh"))
            .agg(
                F.min(
                    F.struct(
                        F.col(id_col).alias("d"), F.col("idx").alias("i")
                    )
                ).alias("w")
            )
            .select(F.col("w.d").alias(id_col), F.col("w.i").alias("idx"))
        )
        kept = passed.join(winners, [id_col, "idx"], "left_semi")
    else:
        kept = passed

    per_doc = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("_ok"), 1).otherwise(0)).alias("_n_passed"),
    )
    kept_agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return (
        per_doc.join(kept_agg, id_col)
        .filter(F.col("n_kept") >= min_lines)
        .select(
            F.col(id_col),
            "clean_text",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_kept").cast("long").alias("n_kept"),
            (F.col("n_lines") - F.col("_n_passed"))
            .cast("long")
            .alias("n_dropped_rules"),
            (F.col("_n_passed") - F.col("n_kept"))
            .cast("long")
            .alias("n_dropped_dup"),
        )
    )
