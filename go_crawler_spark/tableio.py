"""Table IO shim: parquet-directory checkpoints or Iceberg tables.

The crawl loop's per-round state (enqueue/fetched/blocked/frontier logs +
a manifest) goes through this interface (SURVEY §7 step 1; the north rule
names Iceberg as the production table format):

- :class:`ParquetTableIO` — the sandbox/default backend: one parquet
  directory per table under a workdir, atomic publish via write-to-temp +
  rename, manifest as a JSON file. Exactly the semantics the engine has
  always used; all crawl/resume tests run through it.
- :class:`IcebergTableIO` — the cluster backend, active when an Iceberg
  catalog is configured on the session AND the runtime jar is present
  (:func:`iceberg_available`). Tables live under a namespace; publishes
  are Iceberg atomic snapshot commits (createOrReplace), so the
  torn-round story is handled by the format: an interrupted write never
  becomes a snapshot, and resume-time cleanup is DROP of the stale
  tables. Snapshot history additionally allows rolling a table back
  (``rollback_to_before``) without rewriting files — the Iceberg upgrade
  of the manifest-scan resume. This branch follows the public
  Iceberg-Spark API; the sandbox ships no iceberg-spark runtime jar, so
  it is exercised only by a skip-marked test and gated at runtime.

Both backends share the retry + observed-metrics write contract of
``plans/crawl._write``.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from go_crawler_spark.config import RetryConfig
from go_crawler_spark.operators.retrying import retry_call


def _run_write(df: DataFrame, publish, retry_cfg, observe, obs_out) -> None:
    """Shared write protocol: optional observed metrics + retry around an
    atomic publish callable."""

    def action() -> None:
        out_df = df
        obs = None
        if observe is not None:
            from pyspark.sql import Observation

            obs = Observation()
            out_df = df.observe(obs, *observe)
        publish(out_df)
        if obs is not None and obs_out is not None:
            obs_out.clear()
            obs_out.update(obs.get)

    if retry_cfg is not None:
        retry_call(action, retry_cfg)
    else:
        action()


class ParquetTableIO:
    """Parquet-directory backend (workdir/<name>/ per table)."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def write(
        self,
        df: DataFrame,
        name: str,
        retry_cfg: Optional[RetryConfig] = None,
        observe: Optional[list] = None,
        obs_out: Optional[dict] = None,
    ) -> DataFrame:
        path = self._path(name)

        def publish(out_df: DataFrame) -> None:
            tmp = path + "._tmp"
            out_df.write.mode("overwrite").parquet(tmp)
            if os.path.exists(path):
                shutil.rmtree(path)
            os.rename(tmp, path)

        _run_write(df, publish, retry_cfg, observe, obs_out)
        return self.read(name)

    def replace(
        self,
        df: DataFrame,
        name: str,
        retry_cfg: Optional[RetryConfig] = None,
    ) -> DataFrame:
        """Crash-safe IN-PLACE replace of an existing table whose new
        content is *derived from the old* (compaction). ``write``'s
        publish (rmtree old, then rename tmp) has a window where neither
        copy exists — and a crash there would let ``cleanup_staging``
        delete the ``._tmp`` holding the only merged copy. Here:

        1. stage the full merged copy to ``name._tmp`` (inputs, including
           the old table, stay readable; the retry wraps ONLY this step,
           so a replayed plan still finds its sources);
        2. rename old aside to ``name._old`` (atomic);
        3. rename ``._tmp`` into place (atomic);
        4. drop ``._old``.

        Every intermediate state is healed by ``recover_replaces`` (run
        first inside ``cleanup_staging``): an ``._old`` present means the
        commit sequence started, and either the new copy (``name`` or a
        complete ``._tmp``) wins or the old is restored — the table is
        never lost."""
        path = self._path(name)
        tmp, old = path + "._tmp", path + "._old"
        if os.path.exists(old):  # heal any earlier torn replace first
            self.recover_replaces()

        def stage(out_df: DataFrame) -> None:
            out_df.write.mode("overwrite").parquet(tmp)

        _run_write(df, stage, retry_cfg, None, None)
        # commit sequence: two atomic renames, then cleanup
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
        return self.read(name)

    def recover_replaces(self) -> None:
        """Heal torn ``replace`` commits (presence of a ``._old`` dir).
        Called before staging cleanup so a merged ``._tmp`` that already
        reached the commit sequence is promoted, not deleted.

        A ``._old`` exists only after the staged copy completed (the
        rename-aside is the first post-stage step), so whichever of
        ``name`` / ``._tmp`` is present is a complete merged copy; if
        neither survived, the old table is restored verbatim."""
        for d in list(os.listdir(self.workdir)):
            if not d.endswith("._old"):
                continue
            name = d[: -len("._old")]
            path, old, tmp = self._path(name), self._path(d), self._path(name) + "._tmp"
            if os.path.exists(path):
                shutil.rmtree(old)  # crashed after step 3
            elif os.path.exists(tmp):
                os.rename(tmp, path)  # crashed between steps 2 and 3
                shutil.rmtree(old)
            else:
                os.rename(old, path)  # staged copy lost: restore the old

    def read(self, *names: str) -> DataFrame:
        return self.spark.read.parquet(*(self._path(n) for n in names))

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def list_names(self, prefix: str = "") -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.workdir)
            if d.startswith(prefix)
            and not d.endswith("._tmp") and not d.endswith("._old")
            and os.path.isdir(self._path(d))
        )

    def delete(self, name: str) -> None:
        p = self._path(name)
        if os.path.exists(p):
            shutil.rmtree(p)

    def delete_stale(self, name: str) -> None:
        """Remove a table AND any torn staging/rename-aside copy of it."""
        self.delete(name)
        for suffix in ("._tmp", "._old"):
            p = self._path(name) + suffix
            if os.path.exists(p):
                shutil.rmtree(p)

    def cleanup_staging(self) -> None:
        """Heal torn ``replace`` commits FIRST (their ``._tmp`` may hold
        the only copy of a compacted table), then drop orphaned ``._tmp``
        staging dirs (a plain write that died before its atomic rename)."""
        self.recover_replaces()
        for d in os.listdir(self.workdir):
            if d.endswith("._tmp"):
                shutil.rmtree(os.path.join(self.workdir, d), ignore_errors=True)

    def get_manifest(self) -> Optional[dict]:
        p = os.path.join(self.workdir, "MANIFEST.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def put_manifest(self, manifest: dict) -> None:
        with open(os.path.join(self.workdir, "MANIFEST.json"), "w") as f:
            json.dump(manifest, f)


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True iff ``catalog`` is configured as an Iceberg SparkCatalog and
    the runtime classes are loadable in this JVM."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:
        return False


class IcebergTableIO:
    """Iceberg-catalog backend (``<catalog>.<namespace>.<name>`` per
    table). Publishes are atomic snapshot commits; an interrupted write
    leaves no snapshot, so resume needs no torn-write scan."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        if not iceberg_available(spark, catalog):
            raise RuntimeError(
                f"catalog '{catalog}' is not a loadable Iceberg catalog; "
                "configure spark.sql.catalog.<name> with the iceberg-spark "
                "runtime jar on the classpath"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def write(
        self,
        df: DataFrame,
        name: str,
        retry_cfg: Optional[RetryConfig] = None,
        observe: Optional[list] = None,
        obs_out: Optional[dict] = None,
    ) -> DataFrame:
        def publish(out_df: DataFrame) -> None:
            out_df.writeTo(self._ident(name)).createOrReplace()

        _run_write(df, publish, retry_cfg, observe, obs_out)
        return self.read(name)

    def replace(
        self,
        df: DataFrame,
        name: str,
        retry_cfg: Optional[RetryConfig] = None,
    ) -> DataFrame:
        """In-place replace: an Iceberg ``createOrReplace`` is an atomic
        snapshot commit and the self-referencing read resolves against the
        pre-commit snapshot (data files survive until snapshot expiry), so
        the plain write path IS already crash-safe here."""
        return self.write(df, name, retry_cfg)

    def recover_replaces(self) -> None:
        pass

    def read(self, *names: str) -> DataFrame:
        out = None
        for n in names:
            t = self.spark.table(self._ident(n))
            out = t if out is None else out.unionByName(t)
        return out

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._ident(name))

    def list_names(self, prefix: str = "") -> list[str]:
        rows = self.spark.sql(
            f"SHOW TABLES IN {self.catalog}.{self.namespace}"
        ).collect()
        return sorted(
            r["tableName"] for r in rows if r["tableName"].startswith(prefix)
        )

    def delete(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self._ident(name)}")

    # Iceberg commits are atomic — there is no torn staging copy
    delete_stale = delete

    def cleanup_staging(self) -> None:
        pass

    def rollback_to_before(self, name: str, timestamp_ms: int) -> None:
        """Snapshot-based rollback (the Iceberg upgrade of manifest-scan
        resume): restore ``name`` to its last snapshot before
        ``timestamp_ms`` without rewriting data files."""
        self.spark.sql(
            f"CALL {self.catalog}.system.rollback_to_timestamp("
            f"'{self.namespace}.{name}', TIMESTAMP '{timestamp_ms}')"
        )

    def get_manifest(self) -> Optional[dict]:
        if not self.exists("manifest"):
            return None
        rows = self.read("manifest").collect()
        return json.loads(rows[0]["payload"]) if rows else None

    def put_manifest(self, manifest: dict) -> None:
        df = self.spark.createDataFrame(
            [(json.dumps(manifest),)], "payload string"
        )
        df.writeTo(self._ident("manifest")).createOrReplace()


def make_tableio(spark: SparkSession, workdir: str, backend: str = "parquet",
                 catalog: str = "crawl", namespace: str = "state"):
    """Backend factory: explicit ``backend`` wins; 'auto' picks Iceberg
    when a loadable catalog is configured, else parquet."""
    if backend == "iceberg":
        return IcebergTableIO(spark, catalog, namespace)
    if backend == "auto" and iceberg_available(spark, catalog):
        return IcebergTableIO(spark, catalog, namespace)
    return ParquetTableIO(spark, workdir)
