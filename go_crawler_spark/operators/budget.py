"""Page budget (Q2): ordered limit over pages only.

ref: internal/queue.go:101-106 — only ``*Page`` items count toward
``pagesLimit``; the seed is counted; assets are never limited. CRITICAL
ordering subtlety reproduced exactly: in ``Push`` the seen-set insert
happens *before* the budget check (queue.go:92-106), so a page refused by
the budget is still marked seen forever and can never be re-enqueued.

The ordered limit runs as a distributed top-K (Catalyst TakeOrderedAndProject)
on the canonical order key — no single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def apply_page_budget(
    candidates: DataFrame, budget_remaining: int, order_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Split deduped candidates into (enqueued, refused_pages).

    Pages beyond ``budget_remaining`` in canonical order are refused;
    assets always pass. Both partitions of the split are returned because
    refused pages must still enter ``seen`` (queue.go:92-106).
    """
    pages = candidates.filter(F.col("kind") == "page")
    assets = candidates.filter(F.col("kind") != "page")
    if budget_remaining <= 0:
        return assets, pages
    admitted = pages.orderBy(*[F.col(c) for c in order_cols]).limit(budget_remaining)
    refused = pages.join(admitted.select("url"), on="url", how="left_anti")
    return admitted.unionByName(assets), refused
