"""Checkpoint manifest: per-partition lineage + metrics + resume.

BASELINE.json: "every stage writes per-partition lineage + metrics to a
checkpoint manifest so a killed job resumes at partition granularity".
Reference analog: TrainMsgDeduplicator's read/train-timestamp ack-gating
(/root/reference/numalogic/udfs/tools.py:220-370) — dedup at the unit-of-
work level, re-expressed here as content-fingerprinted input buckets.

Design (all content-derived — no wall-clock in the resume decision):
- work unit = hash bucket of a stable row id: bucket = pmod(xxhash64(id), B)
- fingerprint per bucket = (row_count, sum(xxhash64(id))) — order-independent,
  so identical input always fingerprints identically regardless of
  partitioning/scheduling
- the job's output is written parquet-partitioned by bucket with DYNAMIC
  partition overwrite, so re-processing a bucket is idempotent
- manifest row per completed bucket: bucket, fingerprint, rows_in, rows_out,
  min/max ts, wall_sec (metric only). Appended AFTER the bucket's data
  lands; a crash in between just re-runs that bucket next time.
- resume = anti-join of current fingerprints vs manifest; changed or absent
  buckets re-run, completed ones are skipped without touching their data.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"


def bucketize(df: DataFrame, id_col: str, n_buckets: int) -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)))


def bucket_fingerprints(df: DataFrame, id_col: str, ts_col: str, n_buckets: int) -> DataFrame:
    return (
        bucketize(df, id_col, n_buckets)
        .groupBy(BUCKET_COL)
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            # decimal(38,0) sum: order-independent and cannot overflow even
            # at 10^12 rows (1e12 · 2^63 ≈ 9e30 < 10^38)
            F.sum(F.xxhash64(F.col(id_col)).cast("decimal(38,0)")).alias("fingerprint"),
            F.min(ts_col).alias("min_ts"),
            F.max(ts_col).alias("max_ts"),
        )
    )


def load_manifest(spark: SparkSession, manifest_path: str) -> DataFrame | None:
    if not os.path.exists(manifest_path):
        return None
    try:
        return spark.read.parquet(manifest_path)
    except Exception:  # noqa: BLE001 — empty/corrupt manifest dir → full run
        return None


def run_with_manifest(
    spark: SparkSession,
    df: DataFrame,
    job: Callable[[DataFrame], DataFrame],
    out_path: str,
    manifest_path: str,
    id_col: str = "doc_id",
    ts_col: str = "event_ts",
    n_buckets: int = 32,
) -> dict:
    """Run `job` over only the buckets whose input changed; returns a
    summary dict {processed_buckets, skipped_buckets, rows_out}.

    `job` maps the bucketized input subset (with BUCKET_COL attached) to an
    output DataFrame that must retain BUCKET_COL (grouping keys derived per
    bucket keep it naturally).
    """
    fps = bucket_fingerprints(df, id_col, ts_col, n_buckets).persist()
    manifest = load_manifest(spark, manifest_path)
    if manifest is not None:
        done = manifest.select(BUCKET_COL, "fingerprint", "rows_in").distinct()
        todo_df = fps.join(done, [BUCKET_COL, "fingerprint", "rows_in"], "left_anti")
    else:
        todo_df = fps
    todo = sorted(r[BUCKET_COL] for r in todo_df.select(BUCKET_COL).collect())
    all_buckets = sorted(r[BUCKET_COL] for r in fps.select(BUCKET_COL).collect())
    skipped = [b for b in all_buckets if b not in set(todo)]
    if not todo:
        fps.unpersist()
        return {"processed_buckets": [], "skipped_buckets": skipped, "rows_out": 0}

    subset = bucketize(df, id_col, n_buckets).filter(F.col(BUCKET_COL).isin(todo))
    t0 = time.time()
    out = job(subset)
    assert BUCKET_COL in out.columns, "job output must retain the bucket column"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(out_path)
    wall = time.time() - t0

    rows_out = (
        spark.read.parquet(out_path)
        .filter(F.col(BUCKET_COL).isin(todo))
        .groupBy(BUCKET_COL)
        .count()
        .withColumnRenamed("count", "rows_out")
    )
    entries = (
        fps.filter(F.col(BUCKET_COL).isin(todo))
        .join(rows_out, BUCKET_COL, "left")
        .na.fill({"rows_out": 0})
        .withColumn("wall_sec", F.lit(float(wall)))
    )
    entries.write.mode("append").parquet(manifest_path)
    fps.unpersist()
    return {"processed_buckets": todo, "skipped_buckets": skipped, "rows_out": int(
        sum(r["rows_out"] for r in entries.select("rows_out").collect())
    )}
