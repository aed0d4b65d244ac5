"""Scalable deterministic global sequence assignment.

The reference's frontier is FIFO with a single dispatcher thread
(internal/queue.go:35-72), so every item has an implicit global arrival
index. Reproducing a *contiguous* global index in a distributed engine with
a single-partition ``row_number()`` window would serialize the whole round
through one task — unacceptable at 10^10-URL scale.

Instead: range-partition by the (total) order key, count rows per
partition, compute partition offsets on the driver (tiny — one int per
partition), then add local ranks inside each partition with ``mapInPandas``.
Two passes over the data, no global shuffle to one task.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

# below this row count a single-task sort beats the two extra passes the
# range-partition scheme needs (sampling runs once per action)
SMALL_INPUT_ROWS = 100_000


def assign_global_seq(
    df: DataFrame,
    order_cols: Sequence[str],
    start: int = 0,
    out_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign ``out_col`` = start, start+1, ... in the total order given by
    ``order_cols`` (which must be a total order — no ties), without a
    single-partition window.
    """
    out, _ = assign_global_seq_counted(df, order_cols, start, out_col, num_partitions)
    return out


def assign_global_seq_counted(
    df: DataFrame,
    order_cols: Sequence[str],
    start: int = 0,
    out_col: str = "seq",
    num_partitions: int | None = None,
    count_by: str | None = None,
) -> tuple[DataFrame, dict]:
    """Like :func:`assign_global_seq` but also returns the group counts the
    pass-1 job computed anyway — ``{value: n}`` grouped by ``count_by``
    (or ``{None: total}``), so callers don't pay extra count() jobs.
    """
    cols = [F.col(c) for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism

    # pass 1a: cheap global counts (no repartition). Small inputs take the
    # single-partition fast path — range-partition sampling costs two extra
    # passes and only pays off when the batch is large.
    pre = df.groupBy(count_by).count().collect() if count_by else [
        {"count": df.count()}
    ]
    by_value: dict = {}
    for r in pre:
        key = r[count_by] if count_by else None
        by_value[key] = by_value.get(key, 0) + r["count"]
    total = sum(by_value.values())

    if total <= SMALL_INPUT_ROWS:
        parted = df.coalesce(1).sortWithinPartitions(*cols)
        offsets = {0: start}
    else:
        # repartitionByRange RESAMPLES boundaries on every action — the
        # count pass and the assignment pass would see different
        # partitions. Materialize the partitioning once (eager local
        # checkpoint): both passes then share identical partitions, and a
        # lost partition fails the job instead of silently resampling.
        parted = (
            df.repartitionByRange(n, *cols)
            .sortWithinPartitions(*cols)
            .localCheckpoint(eager=True)
        )
        counts_df = (
            parted.withColumn("_pid", F.spark_partition_id()).groupBy("_pid").count()
        )
        counts = {r["_pid"]: r["count"] for r in counts_df.collect()}
        offsets = {}
        acc = start
        for pid in range(max(counts.keys(), default=-1) + 1):
            offsets[pid] = acc
            acc += counts.get(pid, 0)

    schema = StructType(parted.schema.fields + [StructField(out_col, LongType(), False)])
    b_offsets = df.sparkSession.sparkContext.broadcast(offsets)

    # pass 2: local cumulative index + broadcast offset (Arrow batches)
    def add_seq(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        local = b_offsets.value.get(pid, 0)
        for pdf in pdf_iter:
            k = len(pdf)
            pdf = pdf.copy()
            pdf[out_col] = range(local, local + k)
            local += k
            yield pdf

    return parted.mapInPandas(add_seq, schema), by_value
