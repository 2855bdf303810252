"""Retention-policy enforcement over the rollup tier cascade.

The north-star engine is "rollup + downsample + RETENTION": raw points
age out first, each coarser tier keeps a longer horizon (the
Prometheus/Thanos/Timescale retention ladder). numalogic delegates this
to the TSDB it scrapes; a standalone lakehouse engine must do it itself
— at 10^12 rows, retention IS the mechanism that keeps the queryable
set bounded.

Design:
- `apply_retention(tiers, policy)` filters the unified tier frame to
  rows younger than their tier's horizon. The reference clock ("now")
  defaults to the newest bucket in the frame (the watermark — a
  map-side-combinable 1-row MAX broadcast back, never a driver
  collect), so the operation is deterministic from the data alone and
  replays identically in the DuckDB oracle; pass `now_s` for
  wall-clock-anchored production runs.
- A row is RETAINED iff `now_s - bucket_s < max_age_s` (age strictly
  inside the horizon) or its tier's horizon is None (keep forever).
- `retention_summary(...)` returns the per-tier audit row (kept,
  expired, retained bucket span) — the manifest-style evidence a
  compaction/expiry job writes alongside the data.

Scale shape: the policy filter is a pure projection over the tier scan
(partition-prunable when the tier table is partitioned by day — the
cutoff predicate lands on the partition column), plus one broadcast of
a 1-row aggregate. The summary is one map-side-combinable groupBy on
the tier label (cardinality = number of tiers). On an actual lakehouse
the retained frame is what a compaction job rewrites; the expired
complement is what it drops — both come from the same single scan here.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# raw minute points age out first; daily points are kept forever
DEFAULT_POLICY: dict[str, Optional[int]] = {
    "1m": 7 * 86400,
    "1h": 90 * 86400,
    "1d": None,
}


def _age_and_now(
    tiers: DataFrame, ts_col: str, now_s: Optional[int]
) -> tuple[DataFrame, Column]:
    df = tiers.withColumn("__bucket_s", F.unix_timestamp(F.col(ts_col)))
    if now_s is not None:
        return df.withColumn("__now_s", F.lit(int(now_s))), F.col("__now_s")
    # watermark = newest bucket anywhere in the frame: 1-row partial-agg
    # MAX, broadcast-joined back (no window-over-everything single task,
    # no driver collect)
    mx = df.agg(F.max("__bucket_s").alias("__now_s"))
    return df.crossJoin(F.broadcast(mx)), F.col("__now_s")


def _retained_pred(policy: Mapping[str, Optional[int]], tier_col: str) -> Column:
    """CASE tier WHEN ... : age < horizon, or TRUE for keep-forever.
    Tiers absent from the policy are kept (fail-open: an expiry job must
    never silently drop a tier it was not configured for)."""
    age = F.col("__now_s") - F.col("__bucket_s")
    pred = F.lit(True)
    for tier, max_age in policy.items():
        keep = F.lit(True) if max_age is None else age < F.lit(int(max_age))
        pred = F.when(F.col(tier_col) == tier, keep).otherwise(pred)
    return pred


def apply_retention(
    tiers: DataFrame,
    policy: Mapping[str, Optional[int]] = DEFAULT_POLICY,
    now_s: Optional[int] = None,
    tier_col: str = "tier",
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Rows of `tiers` still inside their tier's retention horizon,
    original schema preserved."""
    df, _ = _age_and_now(tiers, ts_col, now_s)
    return df.filter(_retained_pred(policy, tier_col)).drop("__bucket_s", "__now_s")


def retention_summary(
    tiers: DataFrame,
    policy: Mapping[str, Optional[int]] = DEFAULT_POLICY,
    now_s: Optional[int] = None,
    tier_col: str = "tier",
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Per-tier expiry audit: (tier, horizon_s, kept, expired,
    min_kept_s, max_kept_s). horizon_s is NULL for keep-forever tiers."""
    df, _ = _age_and_now(tiers, ts_col, now_s)
    keep = _retained_pred(policy, tier_col)
    horizon = reduce(
        lambda acc, kv: F.when(
            F.col(tier_col) == kv[0], F.lit(kv[1]).cast("bigint")
        ).otherwise(acc),
        policy.items(),
        F.lit(None).cast("bigint"),
    )
    return (
        df.groupBy(F.col(tier_col).alias("tier"))
        .agg(
            F.max(horizon).alias("horizon_s"),
            F.sum(keep.cast("bigint")).alias("kept"),
            F.sum((~keep).cast("bigint")).alias("expired"),
            F.min(F.when(keep, F.col("__bucket_s"))).alias("min_kept_s"),
            F.max(F.when(keep, F.col("__bucket_s"))).alias("max_kept_s"),
        )
    )


def staleness_report(
    df: DataFrame,
    bucket_s: int = 60,
    lookback_s: int = 3600,
    source_col: str = "source",
    ts_col: str = "ts_s",
) -> DataFrame:
    """Per-series liveness audit — the PromQL `absent()`/staleness
    counterpart: (source, last_seen_s, staleness_s, buckets_observed,
    buckets_missing) where staleness is measured against the DATA
    watermark (global max timestamp — a 1-row broadcast, deterministic
    from the frame alone, same discipline as apply_retention) and the
    bucket counts cover the trailing `lookback_s` window ending at the
    watermark.

    A series with staleness_s ≫ its scrape interval has stopped
    reporting; buckets_missing locates intermittent gaps (the thing
    gap-fill interpolates over — this operator REPORTS them instead).

    One aggregation per series carrying last-seen and a distinct-bucket
    count (distinct via a pre-grouped two-level aggregate, never a
    COUNT DISTINCT shuffle of raw rows), plus the broadcast watermark.
    """
    n_buckets = lookback_s // bucket_s
    b = df.select(
        F.col(source_col).alias("source"),
        F.col(ts_col).alias("_ts"),
        (F.col(ts_col) - F.col(ts_col) % F.lit(bucket_s)).alias("_bucket"),
    )
    wm = b.agg(F.max("_ts").alias("_wm"))
    withwm = b.crossJoin(F.broadcast(wm))
    # two-level: per (source, bucket) first, so the per-series distinct
    # count is a plain count over pre-deduped rows
    per_bucket = (
        withwm.groupBy("source", "_bucket", "_wm")
        .agg(F.max("_ts").alias("_bmax"))
        .withColumn(
            "_in_window",
            (F.col("_bucket") > F.col("_wm") - F.lit(lookback_s))
            & (F.col("_bucket") <= F.col("_wm")),
        )
    )
    return (
        per_bucket.groupBy("source")
        .agg(
            F.max("_bmax").alias("last_seen_s"),
            (F.max("_wm") - F.max("_bmax")).alias("staleness_s"),
            F.sum(F.col("_in_window").cast("bigint")).alias("buckets_observed"),
        )
        .withColumn(
            "buckets_missing",
            F.lit(int(n_buckets)) - F.col("buckets_observed"),
        )
    )
