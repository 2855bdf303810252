"""Lakehouse table IO for the token/rollup tables.

The BASELINE target is an Iceberg table of 10^12 pre-tokenized sequences;
this module is the engine's single IO seam so the binding is a config
choice, not a code change:

- `format="iceberg"` (cluster): requires the iceberg-spark-runtime jar and
  a catalog (`spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`).
  Reads get Iceberg's partition pruning + metadata-level filter pushdown;
  tier writes use `writeTo(...).append()` and the manifest integrates with
  Iceberg snapshots.
- `format="parquet"` (this sandbox — no Iceberg runtime jar baked in):
  path-based tables with the same layout.

Recommended physical layout at 10^12 rows (DDL below): partition by
days(event_ts) — retention drops whole partitions; bucket(256, source) —
co-locates each series for window kernels while splitting hot sources
across buckets (skew); tier tables partitioned by (tier, days(bucket_ts)).

Example Iceberg DDL::

    CREATE TABLE lake.tokens (
      doc_id string, tokens array<int>, n_tok int,
      source string, event_ts timestamp)
    USING iceberg
    PARTITIONED BY (days(event_ts), bucket(256, source))

Citations: the reference's connector layer normalizes every source to the
same frame shape (connectors/druid/_druid.py:195, rds/_base.py:43) — here
that normal form IS the table schema (datagen.TOKEN_SCHEMA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from numalogic_spark.datagen import TOKEN_SCHEMA


def read_tokens(spark: SparkSession, table_or_path: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "iceberg":
        return spark.read.table(table_or_path)
    df = spark.read.schema(TOKEN_SCHEMA).parquet(table_or_path)
    return df


def write_tier(df: DataFrame, table_or_path: str, fmt: str = "parquet", mode: str = "append") -> None:
    """Tier tables are partitioned by (tier, day of bucket_ts): retention
    (drop 1m data older than X) becomes a partition-level delete."""
    if fmt == "iceberg":
        w = df.writeTo(table_or_path)
        (w.append() if mode == "append" else w.overwritePartitions())
        return
    from pyspark.sql import functions as F

    (
        df.withColumn("_day", F.to_date("bucket_ts"))
        .write.mode(mode)
        .partitionBy("tier", "_day")
        .parquet(table_or_path)
    )


def expire_tier(
    spark: SparkSession, table_or_path: str, tier: str, older_than_day: str, fmt: str = "parquet"
) -> None:
    """Retention: drop a tier's partitions older than a day boundary.
    Iceberg: metadata-only DELETE (partition predicate → no data rewrite);
    parquet: remove the partition DIRECTORIES — the same O(partitions)
    operation, never a table rewrite."""
    if fmt == "iceberg":
        spark.sql(
            f"DELETE FROM {table_or_path} WHERE tier = '{tier}' AND bucket_ts < TIMESTAMP '{older_than_day}'"
        )
        return
    # Hadoop FileSystem API so s3a/hdfs tier tables expire too (a local
    # glob would silently no-op on remote URIs)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    cutoff = older_than_day[:10]
    tier_path = jvm.org.apache.hadoop.fs.Path(f"{table_or_path}/tier={tier}")
    fs = tier_path.getFileSystem(hconf)
    if not fs.exists(tier_path):
        return
    for status in fs.listStatus(tier_path):
        name = status.getPath().getName()
        if name.startswith("_day=") and name.split("=", 1)[1] < cutoff:
            fs.delete(status.getPath(), True)
