"""Table-io shim: parquet backend semantics (the path every crawl/resume
test exercises implicitly) plus the Iceberg gating contract."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from go_crawler_spark.tableio import (
    IcebergTableIO,
    ParquetTableIO,
    iceberg_available,
    make_tableio,
)


@pytest.fixture()
def io(spark):
    return ParquetTableIO(spark, tempfile.mkdtemp(prefix="tio_"))


def test_write_read_roundtrip_and_observe(spark, io):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("m"))
    out = {}
    back = io.write(df, "t1", observe=[F.count(F.lit(1)).alias("n")], obs_out=out)
    assert out["n"] == 100
    assert back.count() == 100
    assert io.exists("t1") and not io.exists("t2")
    assert io.read("t1").count() == 100


def test_list_delete_and_staging_cleanup(spark, io):
    df = spark.range(5)
    io.write(df, "enqueue_0")
    io.write(df, "enqueue_1")
    io.write(df, "fetched_0")
    assert io.list_names("enqueue_") == ["enqueue_0", "enqueue_1"]
    # orphaned staging dir from a torn write must be invisible + cleanable
    os.makedirs(os.path.join(io.workdir, "enqueue_2._tmp"))
    assert io.list_names("enqueue_") == ["enqueue_0", "enqueue_1"]
    io.cleanup_staging()
    assert not os.path.exists(os.path.join(io.workdir, "enqueue_2._tmp"))
    io.delete_stale("enqueue_1")
    assert io.list_names("enqueue_") == ["enqueue_0"]


def test_replace_inplace_roundtrip(spark, io):
    io.write(spark.range(10), "enqueue_0")
    merged = io.read("enqueue_0").withColumn("x", F.col("id") * 2)
    back = io.replace(merged, "enqueue_0")
    assert back.count() == 10 and "x" in back.columns
    # no residue from the commit sequence
    assert not os.path.exists(os.path.join(io.workdir, "enqueue_0._old"))
    assert not os.path.exists(os.path.join(io.workdir, "enqueue_0._tmp"))


def _torn_state(spark, io, crash_after: str) -> None:
    """Manufacture each intermediate state of replace's commit sequence:
    stage -> rename-aside -> rename-in -> drop-old."""
    io.write(spark.range(5), "enqueue_0")
    path = os.path.join(io.workdir, "enqueue_0")
    spark.range(7).write.mode("overwrite").parquet(path + "._tmp")  # staged
    if crash_after == "stage":
        return
    os.rename(path, path + "._old")  # old aside
    if crash_after == "aside":
        return
    os.rename(path + "._tmp", path)  # new in place
    if crash_after == "rename_in":
        return
    raise AssertionError(crash_after)


def test_replace_crash_recovery_all_states(spark, io):
    """ADVICE r2 (medium): a crash mid-replace must never lose the table —
    in particular cleanup_staging must not delete the ._tmp that holds the
    only merged copy. Every torn state heals to a complete table."""
    path = os.path.join(io.workdir, "enqueue_0")
    for crash_after, want_rows in (
        ("stage", 5),       # commit never started: old copy wins, tmp dropped
        ("aside", 7),       # staged copy complete: promoted
        ("rename_in", 7),   # new copy already in place: old residue dropped
    ):
        _torn_state(spark, io, crash_after)
        io.cleanup_staging()  # resume/compact entry point runs this first
        assert io.read("enqueue_0").count() == want_rows, crash_after
        assert not os.path.exists(path + "._old"), crash_after
        assert not os.path.exists(path + "._tmp"), crash_after
        assert io.list_names("enqueue_") == ["enqueue_0"], crash_after
        io.delete_stale("enqueue_0")


def test_replace_lost_staging_restores_old(spark, io):
    """Pathological: ._old exists but both the new table and ._tmp are
    gone (staging dir removed by an operator) — the old table restores."""
    path = os.path.join(io.workdir, "enqueue_0")
    io.write(spark.range(5), "enqueue_0")
    os.rename(path, path + "._old")
    io.cleanup_staging()
    assert io.read("enqueue_0").count() == 5
    assert not os.path.exists(path + "._old")


def test_multi_read_unions(spark, io):
    io.write(spark.range(3), "a_0")
    io.write(spark.range(4), "a_1")
    assert io.read("a_0", "a_1").count() == 7


def test_manifest_roundtrip(spark, io):
    assert io.get_manifest() is None
    io.put_manifest({"round": 3, "seq_next": 17})
    assert io.get_manifest() == {"round": 3, "seq_next": 17}


def test_iceberg_gating(spark):
    """No Iceberg catalog configured in the sandbox: availability is
    False, the explicit backend raises, and 'auto' falls back to
    parquet."""
    assert not iceberg_available(spark, "crawl")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        IcebergTableIO(spark, "crawl", "state")
    tio = make_tableio(spark, tempfile.mkdtemp(prefix="tio_"), "auto")
    assert isinstance(tio, ParquetTableIO)


def test_iceberg_backend_roundtrip(spark):
    """Exercised only when an Iceberg catalog + runtime jar are present
    (not in this sandbox)."""
    if not iceberg_available(spark, "crawl"):
        pytest.skip("no Iceberg catalog/jar in this environment")
    tio = IcebergTableIO(spark, "crawl", "state_test")
    tio.write(spark.range(10), "t")
    assert tio.read("t").count() == 10
    tio.put_manifest({"round": 1})
    assert tio.get_manifest() == {"round": 1}
    tio.delete("t")
    assert not tio.exists("t")
