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
