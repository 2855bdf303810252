"""Linear-interpolation gap-fill over a rollup tier table.

The reference has NO gap-fill (missing Druid buckets are simply absent and
missing values are imputed 0 — /root/reference/numalogic/udfs/tools.py:52,
trainer/_base.py:399); BASELINE.json adds it as a target capability. We
generate the bucket spine declaratively with sequence()+explode (partition-
local, no shuffle beyond the min/max agg) and interpolate with
last/first(ignorenulls) window functions — all JVM-side, no Python.

Only interior gaps are filled (both neighbors exist by construction since
the spine spans [min,max] per source). Interpolated metric values are
doubles; `is_interpolated` marks synthetic rows for lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from numalogic_spark.operators.rollup import TIERS

METRIC_COLS = ["count", "n_tok_sum", "n_tok_mean", "n_tok_p95", "token_rate"]


def bucket_spine(tier_df: DataFrame, tier: str) -> DataFrame:
    """Per-source dense bucket grid spanning [min(bucket_ts), max(bucket_ts)].

    Uses the tier's CALENDAR step (INTERVAL 1 DAY, not 86400 SECOND) so the
    spine stays aligned with date_trunc buckets across DST transitions under
    non-UTC session timezones."""
    _, _, step = TIERS[tier]
    return (
        tier_df.groupBy("source")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "source",
            F.explode(F.sequence("lo", "hi", F.expr(step))).alias("bucket_ts"),
        )
    )


def gapfill_linear(tier_df: DataFrame, tier: str, metric_cols: list[str] | None = None) -> DataFrame:
    """Spine left-join + linear interpolation between nearest real buckets.

    Returns the tier schema with metric columns as double plus
    ``is_interpolated: boolean``.
    """
    metric_cols = metric_cols or METRIC_COLS
    spine = bucket_spine(tier_df, tier)
    # realness comes from an explicit join marker, NOT from null-ness of a
    # metric column — a real row with a NULL metric must not be treated as
    # a gap and overwritten by interpolation
    marked = tier_df.withColumn("_real", F.lit(True))
    joined = spine.join(marked, ["source", "bucket_ts"], "left").withColumn(
        "_real", F.coalesce(F.col("_real"), F.lit(False))
    )

    # Both directions use RUNNING frames (unboundedPreceding → current row):
    # Spark evaluates those incrementally in O(n) per partition, whereas an
    # ignoreNulls aggregate over a (current → unboundedFollowing) frame falls
    # back to an O(n²) re-scan — the "next neighbor" is therefore a running
    # last() over the DESCENDING order instead.
    w_prev = (
        Window.partitionBy("source")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("source")
        .orderBy(F.col("bucket_ts").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    real = F.col("_real")
    ts_s = F.unix_timestamp("bucket_ts")
    prev_ts = F.last(F.when(real, ts_s), ignorenulls=True).over(w_prev)
    next_ts = F.last(F.when(real, ts_s), ignorenulls=True).over(w_next)
    frac = (ts_s - prev_ts) / (next_ts - prev_ts)

    out = joined
    for c in metric_cols:
        dc = F.col(c).cast("double")
        prev_v = F.last(F.when(real, dc), ignorenulls=True).over(w_prev)
        next_v = F.last(F.when(real, dc), ignorenulls=True).over(w_next)
        out = out.withColumn(
            c, F.when(real, dc).otherwise(prev_v + frac * (next_v - prev_v))
        )
    return out.select(
        "source",
        "bucket_ts",
        F.lit(tier).alias("tier"),
        *metric_cols,
        (~real).alias("is_interpolated"),
    )
