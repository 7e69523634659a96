"""Iceberg table helpers — the production storage layer, catalog-gated.

The north rule targets Iceberg tables of Common-Crawl-style pages at
10^12-document scale with the explicit partition spec
``bucket(B, url), days(warc_ts)``. The Iceberg runtime jars are not in
this sandbox, so every helper degrades explicitly:

- :func:`iceberg_available` probes the catalog once;
- the read/write/DDL helpers raise ``IcebergUnavailable`` with the exact
  SQL they *would* run, so the parquet fallback paths elsewhere
  (``sources.pages.write_pages_partitioned``, ``operators.retention``)
  stay authoritative locally while the Iceberg mapping stays executable
  documentation.

On a real cluster: ``spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-<ver> --conf
spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog ...`` and all
of these helpers become live.

Environment re-checked 2026-08-17 (rounds 5 AND 6, independent checks):
no iceberg jar anywhere on the filesystem (``find / -name
'*iceberg*'``), pyspark's bundled jars dir has none, pyiceberg is not
importable, and the network is blocked outright (urllib to Maven
Central -> URLError), so the runtime remains environment-blocked; the
frozen golden-SQL surface (coverage-asserted in
``tests/test_textops.py::test_iceberg_golden_surface_complete``) stays
the best obtainable evidence.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(RuntimeError):
    """Raised when no Iceberg catalog is configured; carries the SQL that
    would have run so callers/tests can assert the mapping."""

    def __init__(self, sql: str) -> None:
        super().__init__(
            "no Iceberg catalog configured (runtime jars absent in this "
            f"sandbox); would run:\n{sql}")
        self.sql = sql


def iceberg_available(spark: SparkSession,
                      catalog: str = "lake") -> bool:
    """True when *catalog* resolves to a live Iceberg catalog."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    except Exception:
        impl = None
    return bool(impl and "iceberg" in impl.lower())


def pages_table_ddl(table: str, url_buckets: int = 128) -> str:
    """DDL for the pages table with the north-rule partition spec."""
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n"
        "  url string, warc_ts timestamp, html binary, text string,\n"
        "  lang string)\n"
        "USING iceberg\n"
        f"PARTITIONED BY (bucket({url_buckets}, url), days(warc_ts))"
    )


def rollup_table_ddl(table: str) -> str:
    """DDL for a rollup-tier table, day-partitioned for retention expiry."""
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n"
        "  series_key string, bucket_ts timestamp, min double, max double,\n"
        "  sum double, count bigint, mean double, last double,\n"
        "  last_ts timestamp)\n"
        "USING iceberg\n"
        "PARTITIONED BY (days(bucket_ts))"
    )


def retention_sql(table: str, cutoff_iso_day: str,
                  ts_col: str = "warc_ts") -> str:
    """Metadata-only expiry: DELETE aligned to the partition spec prunes
    whole partitions without rewriting data files, then snapshot expiry
    reclaims storage. ``ts_col`` is the table's partition time column —
    ``warc_ts`` for pages/samples, ``bucket_ts`` for rollup tiers."""
    return (
        f"DELETE FROM {table} WHERE {ts_col} < DATE '{cutoff_iso_day}';\n"
        f"CALL system.expire_snapshots(table => '{table}', "
        "retain_last => 1)"
    )


def create_table(spark: SparkSession, ddl: str) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailable(ddl)
    spark.sql(ddl)


def append(df: DataFrame, table: str) -> None:
    """Idempotent-friendly append (pair with MERGE for exactly-once)."""
    if not iceberg_available(df.sparkSession):
        raise IcebergUnavailable(f"INSERT INTO {table} SELECT ...")
    df.writeTo(table).append()


def overwrite_partitions(df: DataFrame, table: str) -> None:
    """Dynamic partition overwrite — the Iceberg form of the resume
    protocol in ``plans.pipeline`` (replayed partitions replace atomically).
    """
    if not iceberg_available(df.sparkSession):
        raise IcebergUnavailable(
            f"INSERT OVERWRITE {table} PARTITION (...) SELECT ...")
    df.writeTo(table).overwritePartitions()


def read_table(spark: SparkSession, table: str,
               snapshot_id: Optional[int] = None) -> DataFrame:
    """Scan, optionally time-traveling to a snapshot (resume/audit)."""
    if not iceberg_available(spark):
        raise IcebergUnavailable(f"SELECT * FROM {table}")
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.table(table)


# ---------------------------------------------------------------------------
# Write-audit-publish (WAP): staged commits for the pipeline's lineage
# protocol. A run writes to an audit branch, validation queries read the
# branch, and publish is an atomic metadata-only fast-forward of main —
# the Iceberg form of plans.pipeline's staging-dir + sentinel commit.
# ---------------------------------------------------------------------------

def wap_branch_ddl(table: str, run_id: str) -> str:
    """Create the audit branch a run stages its commits on."""
    return f"ALTER TABLE {table} CREATE BRANCH IF NOT EXISTS audit_{run_id}"


def wap_write_conf(run_id: str) -> dict:
    """Session confs routing writes to the audit branch. Set before the
    stage's writeTo/overwritePartitions; unset (or end the session) after."""
    return {"spark.wap.branch": f"audit_{run_id}"}


def wap_publish_sql(table: str, run_id: str) -> str:
    """Atomically publish the audited branch: fast-forward main to it,
    then drop the branch. Both statements are metadata-only."""
    return (
        f"CALL system.fast_forward(table => '{table}', "
        f"branch => 'main', to => 'audit_{run_id}');\n"
        f"ALTER TABLE {table} DROP BRANCH audit_{run_id}"
    )


def wap_stage(df: DataFrame, table: str, run_id: str,
              overwrite: bool = True) -> None:
    """Full WAP staging step: branch DDL + branch-routed write. Raises
    :class:`IcebergUnavailable` carrying every statement it would run
    when no catalog is live (so tests pin the exact mapping)."""
    spark = df.sparkSession
    if not iceberg_available(spark):
        mode = ("INSERT OVERWRITE ... PARTITION (...)" if overwrite
                else "INSERT INTO ...")
        raise IcebergUnavailable(
            f"{wap_branch_ddl(table, run_id)};\n"
            f"SET spark.wap.branch = audit_{run_id};\n"
            f"{mode} -- {table}")
    spark.sql(wap_branch_ddl(table, run_id))
    for k, v in wap_write_conf(run_id).items():
        spark.conf.set(k, v)
    try:
        if overwrite:
            df.writeTo(table).overwritePartitions()
        else:
            df.writeTo(table).append()
    finally:
        for k in wap_write_conf(run_id):
            spark.conf.unset(k)


def wap_publish(spark: SparkSession, table: str, run_id: str) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailable(wap_publish_sql(table, run_id))
    for stmt in wap_publish_sql(table, run_id).split(";\n"):
        spark.sql(stmt)
