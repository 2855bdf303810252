"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship rollup cascade on the deterministic synthetic
token table; ``queries``/``oracle_sql`` expose each implemented operator
over the shared testdata tables so the driver can DuckDB-verify them.

Conventions for oracle comparability:
- every computed column is aliased identically on both sides;
- timestamps are emitted as epoch-second BIGINTs (`bucket_s`) so the
  value-hash is engine-neutral;
- doubles are rounded to 6 dp on both sides to absorb summation-order ULPs.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from numalogic_spark.functions import transforms as TX
from numalogic_spark.operators.gapfill import gapfill_linear
from numalogic_spark.operators.rollup import RollupConfig, rollup_cascade

def _r6(col):
    """Deterministic 6-dp rounding: floor(x*1e6 + 0.5)/1e6 on BOTH engines.

    Spark's round() is HALF_UP while DuckDB's is half-to-even; on exact .5
    ties (common for means of 2-dp values) they disagree. floor() has one
    definition everywhere, so identical doubles round identically.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


EVENTS_CFG = RollupConfig(
    source_col="event_type", ts_col="ts", value_col="value",
    integral_values=False, decimal_sum=True,
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _rounded_tier(tier_df: DataFrame) -> DataFrame:
    return tier_df.select(
        "source",
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        F.col("count").alias("cnt"),
        _r6("n_tok_sum").alias("val_sum"),
        _r6("n_tok_mean").alias("val_mean"),
        _r6("n_tok_p95").alias("val_p95"),
        _r6("token_rate").alias("rate"),
    )


def _q_rollup(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        tiers = rollup_cascade(_events(spark, sf_dir), EVENTS_CFG)
        return _rounded_tier(tiers[tier])

    return q


def _rollup_sql(unit: str, secs: int) -> str:
    return f"""
SELECT event_type AS source,
       CAST(epoch(date_trunc('{unit}', ts)) AS BIGINT) AS bucket_s,
       count(*) AS cnt,
       floor((CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS val_sum,
       floor((CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000.0 AS val_mean,
       floor((quantile_cont(value, 0.95)) * 1000000 + 0.5) / 1000000.0 AS val_p95,
       floor((CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / {secs}.0) * 1000000 + 0.5) / 1000000.0 AS rate
FROM events
GROUP BY 1, 2
"""


def _q_rollup_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three tiers in one exchange + one window chain (the batch-optimal
    fused plan; row-identical to the cascade union)."""
    from numalogic_spark.operators.rollup import histogram, rollup_tiers_fused

    fused = rollup_tiers_fused(
        histogram(_events(spark, sf_dir), EVENTS_CFG, "minute"), EVENTS_CFG
    )
    return fused.select(
        "tier",
        "source",
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        F.col("count").alias("cnt"),
        _r6("n_tok_sum").alias("val_sum"),
        _r6("n_tok_mean").alias("val_mean"),
        _r6("n_tok_p95").alias("val_p95"),
        _r6("token_rate").alias("rate"),
    )


def _rollup_fused_sql() -> str:
    from numalogic_spark.operators.rollup import TIERS

    return "\nUNION ALL\n".join(
        f"SELECT q.*, '{t}' AS tier FROM ({_rollup_sql(unit, secs)}) q"
        for t, (unit, secs, _) in TIERS.items()
    )


def _q_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental continuous-aggregate refresh (operators/rollup.py
    refresh_tier): events deterministically split base/delta on
    event_id % 10, the base rolled into a stored minute histogram, then
    the delta merged in and ONLY the delta-touched hour buckets
    recomputed — the replacement rows a dynamic-partition-overwrite job
    writes. Exact-identical to a from-scratch 1h rollup over base+delta
    restricted to touched hours (the oracle), because the histogram merge
    is lossless. At 10^12 stored rows this is the path that makes a daily
    delta O(|delta| + touched buckets), not a full rescan."""
    from numalogic_spark.operators.rollup import histogram, refresh_tier

    ev = _events(spark, sf_dir)
    base = ev.filter(F.col("event_id") % 10 != 7)
    delta = ev.filter(F.col("event_id") % 10 == 7)
    stored = histogram(base, EVENTS_CFG, "minute")
    dh = histogram(delta, EVENTS_CFG, "minute")
    return _rounded_tier(refresh_tier(stored, dh, EVENTS_CFG, "1h"))


def _rollup_refresh_sql() -> str:
    return f"""
SELECT q.* FROM ({_rollup_sql("hour", 3600)}) q
WHERE EXISTS (
  SELECT 1 FROM events d
  WHERE d.event_id % 10 = 7
    AND d.event_type = q.source
    AND CAST(epoch(date_trunc('hour', d.ts)) AS BIGINT) = q.bucket_s
)
"""


def _q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiers = rollup_cascade(_events(spark, sf_dir), EVENTS_CFG)
    gf = gapfill_linear(tiers["1m"], "1m")
    return gf.select(
        "source",
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        _r6("count").alias("cnt"),
        _r6("n_tok_sum").alias("val_sum"),
        _r6("n_tok_mean").alias("val_mean"),
        "is_interpolated",
    )


_GAPFILL_SQL = """
WITH t AS (
  SELECT event_type AS source, date_trunc('minute', ts) AS b,
         CAST(count(*) AS DOUBLE) AS cnt,
         CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS vsum
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT source, unnest(generate_series(min(b), max(b), INTERVAL 1 MINUTE)) AS b
  FROM t GROUP BY source
), j AS (
  SELECT s.source, s.b, t.cnt, t.vsum FROM spine s LEFT JOIN t ON s.source = t.source AND s.b = t.b
), w AS (
  SELECT source, b, cnt, vsum,
    epoch(b) AS ts_s,
    last_value(CASE WHEN cnt IS NOT NULL THEN epoch(b) END IGNORE NULLS)
      OVER (PARTITION BY source ORDER BY b ROWS UNBOUNDED PRECEDING) AS pts,
    first_value(CASE WHEN cnt IS NOT NULL THEN epoch(b) END IGNORE NULLS)
      OVER (PARTITION BY source ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nts,
    last_value(cnt IGNORE NULLS) OVER (PARTITION BY source ORDER BY b ROWS UNBOUNDED PRECEDING) AS pcnt,
    first_value(cnt IGNORE NULLS) OVER (PARTITION BY source ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ncnt,
    last_value(vsum IGNORE NULLS) OVER (PARTITION BY source ORDER BY b ROWS UNBOUNDED PRECEDING) AS pv,
    first_value(vsum IGNORE NULLS) OVER (PARTITION BY source ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM j
)
SELECT source, CAST(ts_s AS BIGINT) AS bucket_s,
  floor((CASE WHEN cnt IS NOT NULL THEN cnt
        ELSE pcnt + (ts_s - pts) * 1.0 / (nts - pts) * (ncnt - pcnt) END) * 1000000 + 0.5) / 1000000.0 AS cnt,
  floor((CASE WHEN cnt IS NOT NULL THEN vsum
        ELSE pv + (ts_s - pts) * 1.0 / (nts - pts) * (nv - pv) END) * 1000000 + 0.5) / 1000000.0 AS val_sum,
  floor((CASE WHEN cnt IS NOT NULL THEN vsum / cnt
        ELSE (pv / pcnt) + (ts_s - pts) * 1.0 / (nts - pts) * (nv / ncnt - pv / pcnt) END) * 1000000 + 0.5) / 1000000.0 AS val_mean,
  (cnt IS NULL) AS is_interpolated
FROM w
"""


def _q_log_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return df.select(
        "event_id",
        _r6(TX.log_transform("value", 2.0)).alias("log_val"),
        _r6(TX.static_power_transform("value", 0.5, 1.0)).alias("pow_val"),
        _r6(TX.data_clipper("value", 10.0, 150.0)).alias("clip_val"),
    )


_LOG_SQL = """
SELECT event_id,
       floor((ln(value + 2.0)) * 1000000 + 0.5) / 1000000.0 AS log_val,
       floor((pow(value + 1.0, 0.5)) * 1000000 + 0.5) / 1000000.0 AS pow_val,
       floor((least(greatest(value, 10.0), 150.0)) * 1000000 + 0.5) / 1000000.0 AS clip_val
FROM events
"""


def _q_score_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return df.select(
        "event_id",
        _r6(TX.tanh_norm(F.col("value") / 20.0)).alias("tanh_score"),
        _r6(TX.sigmoid_norm(F.col("value") / 20.0)).alias("sigmoid_score"),
        _r6(TX.static_threshold_score("value", 120.0)).alias("static_score"),
        _r6(TX.sigmoid_threshold_score(F.col("value") / 50.0, 2.0)).alias("sigthresh_score"),
    )


_SCORE_SQL = """
SELECT event_id,
       floor((10.0 * ((exp(2.0 * ((value / 20.0) / 10.0)) - 1.0) / (exp(2.0 * ((value / 20.0) / 10.0)) + 1.0))) * 1000000 + 0.5) / 1000000.0 AS tanh_score,
       floor((10.0 / (1.0 + exp(5.0 - 0.5 * (value / 20.0)))) * 1000000 + 0.5) / 1000000.0 AS sigmoid_score,
       floor((CASE WHEN value >= 120.0 THEN 10.0 ELSE 0.5 END) * 1000000 + 0.5) / 1000000.0 AS static_score,
       floor((10.0 / (1.0 + exp(least(greatest(-(5.0 * pi()) * (value / 50.0 - 2.0), -88.72), 88.72)))) * 1000000 + 0.5) / 1000000.0
         AS sigthresh_score
FROM events
"""


def _q_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    return df.select(
        "event_id",
        _r6(
            TX.difference_transform("value", order_by=["ts", "event_id"], partition_by=["user_id"])
        ).alias("dvalue"),
    )


_DIFF_SQL = """
WITH d AS (
  SELECT event_id,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv
  FROM events
), e AS (
  SELECT event_id, coalesce(dv,
      first_value(dv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS dv
  FROM (SELECT e.event_id, e.user_id, e.ts, d.dv
        FROM events e JOIN d ON e.event_id = d.event_id)
)
SELECT event_id, floor((dv) * 1000000 + 0.5) / 1000000.0 AS dvalue FROM e
"""


def _q_ewm_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXP window aggregation (A7 closed form) over each series' last-12
    window — the reference's postprocess window-agg step
    (udfs/postprocess.py:398-418 with ExpMovingAverage)."""
    from numalogic_spark.functions.aggregators import window_agg_expr

    df = _events(spark, sf_dir)
    tail = TX.tail_n(df, 12, order_by=["ts", "event_id"], partition_by=["event_type"])
    wins = tail.groupBy(F.col("event_type").alias("source")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"],
        ).alias("w")
    )
    return wins.select(
        "source",
        _r6(window_agg_expr("w", "EXP", beta=0.6)).alias("ewm_agg"),
        _r6(window_agg_expr("w", "MEAN")).alias("mean_agg"),
        _r6(window_agg_expr("w", "MAX")).alias("max_agg"),
    )


_EWM_SQL = """
WITH t AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_type AS source,
  floor((sum(pow(0.6, rn - 1) * value) * 0.4 / (1 - pow(0.6, count(*)))) * 1000000 + 0.5) / 1000000.0 AS ewm_agg,
  floor((sum(value) / count(*)) * 1000000 + 0.5) / 1000000.0 AS mean_agg,
  floor((max(value)) * 1000000 + 0.5) / 1000000.0 AS max_agg
FROM t WHERE rn <= 12
GROUP BY event_type
"""


def _dec_stats(df: DataFrame, by: str, col: str) -> DataFrame:
    """Per-group mean/std via exact decimal sums (order-independent, so the
    Spark result is bit-identical to the DuckDB oracle's)."""
    d = F.col(col).cast("decimal(20,4)")
    n = F.count(d)
    s1 = F.sum(d).cast("double")
    s2 = F.sum(d * d).cast("double")
    # greatest(...,0): constant series cancel to a tiny negative variance
    return df.groupBy(by).agg(
        (s1 / n).alias("mu"),
        F.sqrt(F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0))).alias("sigma"),
        n.alias("n"),
    )


def _q_tanh_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TanhScaler fit per series + transform (F5): broadcast fitted stats,
    0.5*(tanh(0.2*(x-μ)/σ)+1). Ref: transforms/_scaler.py:27-74."""
    df = _events(spark, sf_dir)
    stats = _dec_stats(df, "event_type", "value")
    out = df.join(F.broadcast(stats), "event_type")
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return out.select(
        "event_id",
        _r6(F.lit(0.5) * (F.tanh(F.lit(0.2) * z) + F.lit(1.0))).alias("tanh_scaled"),
        _r6(F.col("value") / F.greatest(F.col("mu") + 3.0 * F.col("sigma"), F.lit(0.0))).alias(
            "stddev_thr_score"
        ),
    )


_TANH_SCALER_SQL = """
WITH s AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value) AS mu,
         sqrt(greatest(CAST(sum(CAST(value AS DECIMAL(20,4)) * CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value)
              - (CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value))
                * (CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value)), 0.0)) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id,
  floor((0.5 * ((exp(2.0 * (0.2 * (e.value - s.mu) / s.sigma)) - 1.0)
               / (exp(2.0 * (0.2 * (e.value - s.mu) / s.sigma)) + 1.0) + 1.0)) * 1000000 + 0.5) / 1000000.0
    AS tanh_scaled,
  floor((e.value / greatest(s.mu + 3.0 * s.sigma, 0.0)) * 1000000 + 0.5) / 1000000.0
    AS stddev_thr_score
FROM events e JOIN s ON e.event_type = s.event_type
"""


def _q_percentile_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PercentileScaler (F6) + MaxPercentileThreshold (F15) per series.
    Ref: transforms/_scaler.py:77-141, models/threshold/_median.py:13-66."""
    df = _events(spark, sf_dir)
    stats = df.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.percentile(F.col("value"), F.lit(0.99)).alias("hi"),
        F.greatest(F.percentile(F.col("value"), F.lit(0.96)), F.lit(1e-4)).alias("thr"),
        F.max("value").alias("mx"),
    )
    out = df.join(F.broadcast(stats), "event_type")
    hi = F.when(F.col("hi") - F.col("lo") <= F.lit(1e-2), F.col("mx")).otherwise(F.col("hi"))
    return out.select(
        "event_id",
        _r6((F.col("value") - F.col("lo")) / (hi - F.col("lo"))).alias("pct_scaled"),
        _r6(F.col("value") / F.col("thr")).alias("maxpct_score"),
    )


_PCT_SCALER_SQL = """
WITH s AS (
  SELECT event_type, min(value) AS lo, max(value) AS mx,
         quantile_cont(value, 0.99) AS hi,
         greatest(quantile_cont(value, 0.96), 0.0001) AS thr
  FROM events GROUP BY event_type
)
SELECT e.event_id,
  floor(((e.value - s.lo) / ((CASE WHEN s.hi - s.lo <= 0.01 THEN s.mx ELSE s.hi END) - s.lo)) * 1000000 + 0.5) / 1000000.0 AS pct_scaled,
  floor((e.value / s.thr) * 1000000 + 0.5) / 1000000.0 AS maxpct_score
FROM events e JOIN s ON e.event_type = s.event_type
"""


def _q_compress_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla-style codec gate: 1m tier → XOR/delta-of-delta blocks →
    decode → must equal the oracle's directly-computed tier. Proves the
    codec is bit-exact end-to-end through Spark."""
    from numalogic_spark.functions.compression import compress_tier, decompress_blocks

    tiers = rollup_cascade(_events(spark, sf_dir), EVENTS_CFG)
    blocks = compress_tier(tiers["1m"], "n_tok_mean")
    points = decompress_blocks(blocks)
    return points.select(
        "source",
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        _r6("value").alias("val_mean"),
    )


_COMPRESS_SQL = """
SELECT event_type AS source,
       CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_s,
       floor((CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000.0 AS val_mean
FROM events
GROUP BY 1, 2
"""


def _q_tail_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    out = TX.tail_n(df, 12, order_by=["ts", "event_id"], partition_by=["event_type"])
    return out.select("event_id", "event_type", _r6("value").alias("value"))


_TAIL_SQL = """
SELECT event_id, event_type, floor((value) * 1000000 + 0.5) / 1000000.0 AS value
FROM (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn <= 12
"""


def _q_score_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 end-to-end scoring chain per series: stddev-threshold score →
    EXP window-agg (L=12) → tanh norm → static adjust. Fit stats via
    order-independent decimal sums for oracle determinism; the chain itself
    is the engine's expressions (window_agg_expr / tanh_norm / greatest)."""
    from pyspark.sql import Window

    from numalogic_spark.functions.aggregators import window_agg_expr

    L, beta = 12, 0.5
    df = _events(spark, sf_dir)
    stats = _dec_stats(df, "event_type", "value")
    scored = df.join(F.broadcast(stats), "event_type").withColumn(
        "s", F.col("value") / F.greatest(F.col("mu") + 3.0 * F.col("sigma"), F.lit(0.0))
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .withColumn("wagg", window_agg_expr(F.collect_list("s").over(w.rowsBetween(-(L - 1), 0)), "EXP", beta))
        .filter(F.col("_rn") >= L)
    )
    return out.select(
        "event_id",
        _r6("wagg").alias("unified_raw"),
        _r6(TX.tanh_norm("wagg")).alias("unified_score"),
        _r6(F.greatest(TX.static_threshold_score("value", 150.0), TX.tanh_norm("wagg"))).alias(
            "adjusted_score"
        ),
    )


def _score_pipeline_sql() -> str:
    L, beta = 12, 0.5
    # oldest-first sum matches the Spark fold order exactly
    terms = " + ".join(f"pow({beta}, {L - 1 - j}) * lag(s, {L - 1 - j}) OVER w" for j in range(L))
    tanh = "((exp(2.0 * (wagg / 10.0)) - 1.0) / (exp(2.0 * (wagg / 10.0)) + 1.0))"
    return f"""
WITH st AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value) AS mu,
         sqrt(greatest(CAST(sum(CAST(value AS DECIMAL(20,4)) * CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value)
              - (CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value))
                * (CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value)), 0.0)) AS sigma
  FROM events GROUP BY event_type
), sc AS (
  SELECT e.event_id, e.event_type, e.ts, e.value,
         e.value / greatest(st.mu + 3.0 * st.sigma, 0.0) AS s
  FROM events e JOIN st ON e.event_type = st.event_type
), agg AS (
  SELECT event_id, value,
         row_number() OVER w AS rn,
         (({terms}) * {1.0 - beta}) / (1.0 - pow({beta}, {L})) AS wagg
  FROM sc
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_id,
  floor((wagg) * 1000000 + 0.5) / 1000000.0 AS unified_raw,
  floor((10.0 * {tanh}) * 1000000 + 0.5) / 1000000.0 AS unified_score,
  floor((greatest(CASE WHEN value >= 150.0 THEN 10.0 ELSE 0.5 END, 10.0 * {tanh})) * 1000000 + 0.5) / 1000000.0 AS adjusted_score
FROM agg WHERE rn >= {L}
"""


def _q_multi_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-metric daily rollup over lineitem: quantity + extendedprice
    per (l_returnflag, ship day) through one unpivoted cascade."""
    from numalogic_spark.operators.rollup import RollupConfig, rollup_cascade_multi

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    tiers = rollup_cascade_multi(
        df.select("l_returnflag", "l_shipdate", "l_quantity", "l_extendedprice"),
        ["l_quantity", "l_extendedprice"],
        RollupConfig(source_col="l_returnflag", ts_col="l_shipdate",
                     integral_values=False, decimal_sum=True),
    )
    t = tiers["1d"]
    return t.select(
        "source", "metric",
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        F.col("count").alias("cnt"),
        _r6("n_tok_sum").alias("val_sum"),
        _r6("n_tok_mean").alias("val_mean"),
        _r6("n_tok_p95").alias("val_p95"),
    )


_MULTI_ROLLUP_SQL = """
WITH long AS (
  SELECT l_returnflag AS source, l_shipdate AS ts, 'l_quantity' AS metric, l_quantity AS v FROM lineitem
  UNION ALL
  SELECT l_returnflag, l_shipdate, 'l_extendedprice', l_extendedprice FROM lineitem
)
SELECT source, metric,
       CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_s,
       count(*) AS cnt,
       floor((CAST(sum(CAST(v AS DECIMAL(20,6))) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS val_sum,
       floor((CAST(sum(CAST(v AS DECIMAL(20,6))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000.0 AS val_mean,
       floor((quantile_cont(v, 0.95)) * 1000000 + 0.5) / 1000000.0 AS val_p95
FROM long
GROUP BY 1, 2, 3
"""


def _q_rollup_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 1m continuous aggregate expressed through the engine's SQL
    surface (spark.sql over a temp view) — Catalyst produces the same plan
    as the DataFrame path; proves the SQL front-end is first-class.

    p95 goes through the SAME histogram linear interpolation the DataFrame
    path uses (operators/rollup.py:89-102) — Spark's built-in `percentile`
    differs from quantile_cont by ULPs that cross the 6-dp rounding
    boundary, so the SQL surface states the interpolation explicitly."""
    _events(spark, sf_dir).createOrReplaceTempView("events_v")
    # NOTE: fractional literals are written with a D suffix — Spark SQL
    # parses bare `0.95` as DECIMAL and decimal arithmetic would silently
    # retype the whole output column away from DOUBLE.
    return spark.sql("""
        WITH h AS (
          SELECT event_type AS source, date_trunc('minute', ts) AS b,
                 value AS v, count(*) AS cnt,
                 sum(CAST(value AS DECIMAL(20,6))) AS vsum
          FROM events_v GROUP BY 1, 2, 3
        ), e AS (
          SELECT source, b, v, cnt, vsum,
                 sum(cnt) OVER (PARTITION BY source, b ORDER BY v) AS cum,
                 sum(cnt) OVER (PARTITION BY source, b) AS total
          FROM h
        ), p AS (
          SELECT source, b, v, cnt, vsum, cum, total,
                 CAST(floor(0.95D * CAST(total - 1 AS DOUBLE)) AS BIGINT) AS lo,
                 least(CAST(floor(0.95D * CAST(total - 1 AS DOUBLE)) AS BIGINT) + 1, total - 1) AS hi,
                 0.95D * CAST(total - 1 AS DOUBLE)
                   - CAST(CAST(floor(0.95D * CAST(total - 1 AS DOUBLE)) AS BIGINT) AS DOUBLE) AS frac
          FROM e
        )
        SELECT source, unix_timestamp(b) AS bucket_s,
               max(total) AS cnt,
               CAST(floor(CAST(sum(vsum) AS DOUBLE) * 1000000D + 0.5D) AS DOUBLE) / 1000000D AS val_sum,
               CAST(floor((max(CASE WHEN cum - cnt <= lo AND cum > lo THEN v END)
                      + max(frac) * (max(CASE WHEN cum - cnt <= hi AND cum > hi THEN v END)
                                     - max(CASE WHEN cum - cnt <= lo AND cum > lo THEN v END)))
                     * 1000000D + 0.5D) AS DOUBLE) / 1000000D AS val_p95
        FROM p
        GROUP BY source, b
    """)


_ROLLUP_SQL_API_ORACLE = """
SELECT event_type AS source,
       CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_s,
       count(*) AS cnt,
       floor(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS val_sum,
       floor(quantile_cont(value, 0.95) * 1000000 + 0.5) / 1000000.0 AS val_p95
FROM events
GROUP BY 1, 2
"""


def _q_sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 strided windows (StreamingDataset semantics): per series the
    window count must be (n - L)//s + 1 and end timestamps land on rows
    L-1, L-1+s, ... — all SQL-checkable facts about the window kernel."""
    from numalogic_spark.operators.windows import sliding_windows

    L, S = 12, 4
    df = _events(spark, sf_dir).select(
        F.col("event_type").alias("source"), F.col("ts").alias("event_ts"),
        F.col("value").cast("float").alias("value"),
    )
    wins = sliding_windows(df, ["value"], seq_len=L, stride=S, source_col="source", ts_col="event_ts")
    return wins.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.unix_timestamp(F.min("end_ts")).alias("first_end_s"),
        F.unix_timestamp(F.max("end_ts")).alias("last_end_s"),
    )


_SLIDING_SQL = """
WITH r AS (
  SELECT event_type AS source, ts,
         row_number() OVER (PARTITION BY event_type ORDER BY ts) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT source,
       CAST(floor((n - 12) / 4) + 1 AS BIGINT) AS n_windows,
       CAST(floor(epoch(min(CASE WHEN rn = 12 THEN ts END))) AS BIGINT) AS first_end_s,
       CAST(floor(epoch(min(CASE WHEN rn = 12 + 4 * (floor((n - 12) / 4)) THEN ts END))) AS BIGINT) AS last_end_s
FROM r
WHERE n >= 12
GROUP BY source, n
"""


def _q_sliding_window_salted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 windows through the SALTED path (chunked parallel windowing of a
    single series with boundary-row replication + distributed ranking) —
    byte-identical semantics to `sliding_window_stats`, so it shares that
    query's oracle. chunk_rows=257 at sf0.01 forces many chunks per series
    (~8 per 2k-row series), exercising the replication/fix-up machinery
    under the driver's hash gate, not just pytest."""
    from numalogic_spark.operators.windows import sliding_windows_salted

    L, S = 12, 4
    df = _events(spark, sf_dir).select(
        F.col("event_type").alias("source"), F.col("ts").alias("event_ts"),
        F.col("value").cast("float").alias("value"),
    )
    wins = sliding_windows_salted(
        df, ["value"], seq_len=L, stride=S, chunk_rows=257,
        source_col="source", ts_col="event_ts",
    )
    return wins.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.unix_timestamp(F.min("end_ts")).alias("first_end_s"),
        F.unix_timestamp(F.max("end_ts")).alias("last_end_s"),
    )


def _q_ewm_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 EWM smoothing, windowed variant (trailing L=12, bias-corrected) —
    bounded state per series, oracle-exact via lag expansion. The
    full-history pandas-parity `ewm_smooth` stays pytest-gated (float32
    recursion has no SQL form)."""
    from numalogic_spark.operators.windows import ewm_smooth_windowed

    df = _events(spark, sf_dir).select(
        F.col("event_type").alias("source"),
        F.unix_timestamp("ts").alias("ts_s"),
        "event_id",
        "value",
    )
    out = ewm_smooth_windowed(
        df, "value", seq_len=12, beta=0.5, source_col="source",
        order_cols=["ts_s", "event_id"], out_col="ewm_value",
    )
    return out.select("source", "ts_s", "event_id", _r6("ewm_value").alias("ewm_value"))


def _ewm_smooth_sql(seq_len: int = 12, beta: float = 0.5) -> str:
    # oldest-first term order matches the engine's fold exactly; missing
    # lags coalesce to 0 (adding leading zeros is float-exact)
    terms = " + ".join(
        f"pow({beta}, {d}) * coalesce(lag(value, {d}) OVER w, 0.0)"
        for d in range(seq_len - 1, -1, -1)
    )
    return f"""
WITH r AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id, value,
         row_number() OVER w AS rn,
         ({terms}) AS wsum
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY floor(epoch(ts)), event_id)
)
SELECT source, ts_s, event_id,
       floor((wsum * {1.0 - beta} / (1.0 - pow({beta}, least(rn, {seq_len})))) * 1000000 + 0.5) / 1000000.0 AS ewm_value
FROM r
"""


def _q_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 Mahalanobis threshold per series over a 2-feature matrix — the
    d=2 closed-form expression lowering (no Python, oracle-exact); the
    general-d pinv kernel path stays pytest-gated vs numpy.

    Features are integer-quantized engineered columns (2dp-scaled value and
    its mod-1000 component) so every covariance moment is an exact integer
    sum on both engines."""
    from numalogic_spark.functions.scalers import mahalanobis_scores_2f

    df = _events(spark, sf_dir).select(
        F.col("event_type").alias("source"),
        F.unix_timestamp("ts").alias("ts_s"),
        "event_id",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).alias("f0"),
    ).withColumn("f1", F.col("f0") % F.lit(1000))
    out = mahalanobis_scores_2f(df, "f0", "f1", by="source", keep_cols=["ts_s", "event_id"])
    return out.select(
        "source", "ts_s", "event_id",
        _r6("md").alias("md"), _r6("md_score").alias("md_score"), "md_pred",
    )


def _mahalanobis_sql(max_outlier_prob: float = 0.1) -> str:
    import math

    k = repr(1.0 / math.sqrt(max_outlier_prob))
    return f"""
WITH f AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS f0
  FROM events
), f2 AS (
  SELECT source, ts_s, event_id, f0, f0 % 1000 AS f1 FROM f
), st AS (
  SELECT source,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(f0) AS DOUBLE) AS s1,
         CAST(sum(f1) AS DOUBLE) AS s2,
         CAST(sum(f0 * f0) AS DOUBLE) AS s11,
         CAST(sum(f0 * f1) AS DOUBLE) AS s12,
         CAST(sum(f1 * f1) AS DOUBLE) AS s22
  FROM f2 GROUP BY source HAVING count(*) >= 2
), md_t AS (
  SELECT f2.source, f2.ts_s, f2.event_id,
         CASE WHEN (s11 - s1 * s1 / n) / (n - 1.0) * ((s22 - s2 * s2 / n) / (n - 1.0))
                   - (s12 - s1 * s2 / n) / (n - 1.0) * ((s12 - s1 * s2 / n) / (n - 1.0)) <= 0.0
              THEN 0.0
              ELSE sqrt(greatest(
                ((CAST(f0 AS DOUBLE) - s1 / n) * (CAST(f0 AS DOUBLE) - s1 / n) * ((s22 - s2 * s2 / n) / (n - 1.0))
                 - 2.0 * (CAST(f0 AS DOUBLE) - s1 / n) * (CAST(f1 AS DOUBLE) - s2 / n) * ((s12 - s1 * s2 / n) / (n - 1.0))
                 + (CAST(f1 AS DOUBLE) - s2 / n) * (CAST(f1 AS DOUBLE) - s2 / n) * ((s11 - s1 * s1 / n) / (n - 1.0)))
                / ((s11 - s1 * s1 / n) / (n - 1.0) * ((s22 - s2 * s2 / n) / (n - 1.0))
                   - (s12 - s1 * s2 / n) / (n - 1.0) * ((s12 - s1 * s2 / n) / (n - 1.0))), 0.0))
         END AS md
  FROM f2 JOIN st ON f2.source = st.source
), q AS (
  SELECT source, ts_s, event_id, md, CAST(floor(md * 1000000.0 + 0.5) AS BIGINT) AS qv FROM md_t
), ts2 AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS qn,
         CAST(sum(qv) AS DOUBLE) AS q1, CAST(sum(qv * qv) AS DOUBLE) AS q2
  FROM q GROUP BY source
)
SELECT q.source, q.ts_s, q.event_id,
       floor(md * 1000000 + 0.5) / 1000000.0 AS md,
       floor((md / greatest((q1 / qn + {k} * sqrt(greatest(q2 / qn - (q1 / qn) * (q1 / qn), 0.0))) / 1000000.0, 1e-12)) * 1000000 + 0.5) / 1000000.0 AS md_score,
       CAST(md >= (q1 / qn + {k} * sqrt(greatest(q2 / qn - (q1 / qn) * (q1 / qn), 0.0))) / 1000000.0 AS BIGINT) AS md_pred
FROM q JOIN ts2 ON q.source = ts2.source
"""


def _q_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline backtest (PromBacktester analog): thresholds fit on the head
    67% of each series (exact-decimal moments), tail scored through the
    window pipeline — fully DuckDB-oracle-gated by composing the split SQL
    with the score-pipeline lag expansion."""
    from numalogic_spark.operators.backtest import backtest
    from numalogic_spark.operators.pipeline import ScoreConfig

    df = _events(spark, sf_dir).select("event_type", "ts", "event_id", F.col("value").alias("value"))
    out = backtest(
        df,
        ScoreConfig(metrics=["value"], seq_len=12, static_limit=150.0, decimal_fit=True),
        test_ratio=0.33,
        min_train_size=30,
        source_col="event_type",
        ts_col="ts",
        order_cols=["ts", "event_id"],
    )
    return out.select("event_type", F.unix_timestamp("end_ts").alias("end_s"),
                      _r6("unified_score").alias("unified_score"),
                      _r6("adjusted_score").alias("adjusted_score"))


def _backtest_sql(seq_len: int = 12, beta: float = 0.5, test_ratio: float = 0.33,
                  min_train: int = 30, static_limit: float = 150.0) -> str:
    terms = " + ".join(
        f"pow({beta}, {seq_len - 1 - j}) * lag(s, {seq_len - 1 - j}) OVER w"
        for j in range(seq_len)
    )
    tanh = "((exp(2.0 * (wagg / 10.0)) - 1.0) / (exp(2.0 * (wagg / 10.0)) + 1.0))"
    return f"""
WITH elig AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY 1 HAVING count(*) >= {min_train}
), r AS (
  SELECT e.event_id, e.event_type, e.ts, e.value, elig.n,
         row_number() OVER (PARTITION BY e.event_type ORDER BY e.ts DESC, e.event_id DESC) AS rnd
  FROM events e JOIN elig ON e.event_type = elig.event_type
), st AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value) AS mu,
         sqrt(greatest(CAST(sum(CAST(value AS DECIMAL(20,4)) * CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value)
              - (CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value))
                * (CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value)), 0.0)) AS sigma
  FROM r WHERE rnd > floor(n * {test_ratio}) GROUP BY event_type
), sc AS (
  SELECT t.event_id, t.event_type, t.ts, t.value,
         t.value / greatest(greatest(st.mu + 3.0 * st.sigma, 0.0), 1e-12) AS s
  FROM (SELECT * FROM r WHERE rnd <= floor(n * {test_ratio})) t
  JOIN st ON t.event_type = st.event_type
), agg AS (
  SELECT event_id, event_type, ts, value,
         row_number() OVER w AS rn,
         (({terms}) * {1.0 - beta}) / (1.0 - pow({beta}, {seq_len})) AS wagg
  FROM sc
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS end_s,
  floor((10.0 * {tanh}) * 1000000 + 0.5) / 1000000.0 AS unified_score,
  floor((greatest(CASE WHEN value >= {static_limit} THEN 10.0 ELSE 0.5 END, 10.0 * {tanh})) * 1000000 + 0.5) / 1000000.0 AS adjusted_score
FROM agg WHERE rn >= {seq_len}
"""


def _q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/A3 pivot: long events → wide per-minute metric matrix (the
    reference's pivot_table / multi-metric join shape)."""
    from numalogic_spark.operators.reshape import pivot_metrics

    df = _events(spark, sf_dir).select(
        F.unix_timestamp(F.date_trunc("minute", "ts")).alias("bucket_s"),
        "event_type",
        F.col("value").cast("decimal(20,6)").alias("v"),
    )
    types = ["click", "error", "purchase", "signup", "view"]
    wide = pivot_metrics(df, ["bucket_s"], "event_type", "v", agg="sum", values=types)
    return wide.select("bucket_s", *[_r6(F.col(t).cast("double")).alias(t) for t in types])


_PIVOT_SQL = """
SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_s,
  floor((CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(20,6)) END) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS click,
  floor((CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(20,6)) END) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS error,
  floor((CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(20,6)) END) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS purchase,
  floor((CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(20,6)) END) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS signup,
  floor((CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(20,6)) END) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS view
FROM events GROUP BY 1
"""


def _q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 tail split: validation = last 20% of rows per series."""
    from numalogic_spark.operators.reshape import train_val_split

    df = _events(spark, sf_dir)
    _train, val = train_val_split(
        df, 0.2, source_col="event_type", ts_col="ts", order_cols=["ts", "event_id"]
    )
    return val.select("event_id", "event_type")


_SPLIT_SQL = """
SELECT event_id, event_type
FROM (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
) WHERE rn <= floor(n * 0.2)
"""


# --------------------------------------------------------------------------
# training-data pipeline ops over documents/embeddings
# --------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir), "text", "doc_id")


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS cluster_size
FROM documents GROUP BY 1
"""


def _q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.dedup import jaccard_pairs

    out = jaccard_pairs(_docs(spark, sf_dir), block_cols=["lang", "source"], threshold=0.2)
    return out.select("id_a", "id_b", "inter", _r6("jaccard").alias("jaccard"))


_DEDUP_JACCARD_SQL = """
WITH w AS (
  SELECT doc_id, lang, source,
         len(list_filter(list_distinct(string_split_regex(lower(text), '\\s+')), x -> x <> '')) AS nw,
         unnest(list_filter(list_distinct(string_split_regex(lower(text), '\\s+')), x -> x <> '')) AS word
  FROM documents
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.nw AS na, b.nw AS nb, count(*) AS inter
  FROM w a JOIN w b
    ON a.word = b.word AND a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, inter,
       floor((inter * 1.0 / (na + nb - inter)) * 1000000 + 0.5) / 1000000.0 AS jaccard
FROM p WHERE inter * 1.0 / (na + nb - inter) >= 0.2
"""


def _q_cosine_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.similarity import score_all

    embs = _embs(spark, sf_dir)
    q = embs.filter("vec_id = 0").select("embedding").collect()[0][0]
    out = score_all(embs, [float(x) for x in q])
    return out.select("id", _r6("cos_sim").alias("cos_sim"))


_COSINE_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS id,
       floor((list_cosine_similarity(e.embedding::DOUBLE[], q.qv)) * 1000000 + 0.5) / 1000000.0 AS cos_sim
FROM embeddings e, q
"""


def _q_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier signal: cosine of each vector to its label
    centroid."""
    from numalogic_spark.operators.similarity import centroid_cosine

    out = centroid_cosine(_embs(spark, sf_dir))
    return out.select(
        "vec_id", "label", _r6(F.col("cos_to_centroid")).alias("cos_to_centroid")
    )


_CENTROID_COSINE_SQL = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
pos AS (
  -- decimal sum (exact, order-independent) before the double divide —
  -- mirrors the engine's deterministic centroid arithmetic
  SELECT label, t.i,
         CAST(sum(CAST(v[t.i] AS DECIMAL(27,12))) AS DOUBLE) / count(*) AS c
  FROM e, unnest(generate_series(1, 64)) AS t(i)
  GROUP BY 1, 2
), cent AS (
  SELECT label, list(c ORDER BY i) AS cent FROM pos GROUP BY 1
)
SELECT e.vec_id, e.label,
       floor(list_cosine_similarity(e.v, cent.cent) * 1000000 + 0.5) / 1000000.0
         AS cos_to_centroid
FROM e JOIN cent USING (label)
"""


def _q_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.dedup import embedding_near_pairs

    out = embedding_near_pairs(_embs(spark, sf_dir), threshold=0.3, block_col="label")
    return out.select("id_a", "id_b", _r6("cos_sim").alias("cos_sim"))


_EMB_PAIRS_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       floor((list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])) * 1000000 + 0.5) / 1000000.0 AS cos_sim
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
"""


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.textstats import text_stats

    out = text_stats(_docs(spark, sf_dir), "text", "doc_id")
    return out.select(
        "doc_id", "n_chars", "n_words", "n_distinct_words", "n_tokens", "n_punct",
        _r6("ttr").alias("ttr"),
        _r6("mean_word_len").alias("mean_word_len"),
        _r6("quality_score").alias("quality_score"),
    )


_TEXT_QUALITY_SQL = r"""
WITH s AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS n_words,
    len(list_filter(list_distinct(string_split_regex(lower(text), '\s+')), x -> x <> '')) AS n_distinct_words,
    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_tokens,
    length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
    length(text) - length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace_removed
  FROM documents
)
SELECT doc_id, n_chars, n_words, n_distinct_words, n_tokens, n_punct,
  floor((n_distinct_words * 1.0 / n_words) * 1000000 + 0.5) / 1000000.0 AS ttr,
  floor(((n_chars - n_nonspace_removed) * 1.0 / n_words) * 1000000 + 0.5) / 1000000.0 AS mean_word_len,
  floor((least(n_words / 100.0, 1.0) * 0.4
       + least(n_distinct_words * 1.0 / n_words, 1.0) * 0.4
       + (1.0 - least(n_punct * 1.0 / greatest(n_chars, 1), 1.0)) * 0.2) * 1000000 + 0.5) / 1000000.0 AS quality_score
FROM s
"""


def _q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percent-rank calibration of the quality score
    (sampling.quantile_transform): raw heuristic scores become
    cross-domain-comparable quantiles before mixture planning."""
    from numalogic_spark.operators.sampling import quantile_transform
    from numalogic_spark.operators.textstats import text_stats

    docs = _docs(spark, sf_dir)
    qs = text_stats(docs, "text", "doc_id").select(
        "doc_id", _r6("quality_score").alias("quality_score")
    )
    j = qs.join(docs.select("doc_id", "source"), "doc_id")
    return quantile_transform(j, "quality_score", ("source",))


_QUALITY_CALIBRATION_SQL = r"""
WITH s AS (
  SELECT doc_id,
    floor((least(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) / 100.0, 1.0) * 0.4
         + least(len(list_filter(list_distinct(string_split_regex(lower(text), '\s+')), x -> x <> '')) * 1.0
                 / len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')), 1.0) * 0.4
         + (1.0 - least((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0
                        / greatest(length(text), 1), 1.0)) * 0.2) * 1000000 + 0.5) / 1000000.0 AS quality_score,
    source
  FROM documents
)
SELECT doc_id, quality_score, source,
  floor(percent_rank() OVER (PARTITION BY source ORDER BY quality_score) * 1000000 + 0.5) / 1000000.0 AS q_unit
FROM s
"""


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir), "text", "doc_id")


def _langid_sql() -> str:
    from numalogic_spark.operators.textstats import _STOPWORDS

    hit_exprs = ",\n    ".join(
        "len(list_intersect(list_distinct(string_split_regex(lower(text), '\\s+')), "
        f"[{', '.join(repr(w) for w in sw)}])) AS hits_{lang}"
        for lang, sw in _STOPWORDS.items()
    )
    langs = list(_STOPWORDS)
    best = "greatest(" + ", ".join(f"hits_{l}" for l in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN hits_{l} = {best} THEN '{l}'" for l in langs
    ) + " ELSE 'und' END"
    return f"""
WITH h AS (
  SELECT doc_id,
    {hit_exprs}
  FROM documents
)
SELECT doc_id, {case} AS lang_pred, {', '.join(f'hits_{l}' for l in langs)}
FROM h
"""


def _q_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.textstats import lang_id_ngram

    from numalogic_spark.operators.textstats import _lang_profiles

    out = lang_id_ngram(_docs(spark, sf_dir), "text", "doc_id")
    langs = list(_lang_profiles())
    return out.select(
        "doc_id", "lang_pred", *[_r6(F.col(f"score_{la}")).alias(f"score_{la}") for la in langs]
    )


def _lang_id_ngram_sql() -> str:
    """DuckDB replay of the char-trigram profile scorer: same shingle
    codes, same literal profiles, same containment fractions and
    tie-break order."""
    from numalogic_spark.operators.dedup import SHINGLE_BASE
    from numalogic_spark.operators.textstats import _lang_profiles

    profiles = _lang_profiles()
    langs = list(profiles)
    b = SHINGLE_BASE
    score_cols = ",\n    ".join(
        f"len(list_filter(sh, s -> list_contains([{', '.join(map(str, prof))}], s)))"
        f" / CAST(greatest(len(sh), 1) AS DOUBLE) AS score_{la}"
        for la, prof in profiles.items()
    )
    best = "greatest(" + ", ".join(f"score_{la}" for la in langs) + ")"
    case = (
        f"CASE WHEN {best} <= 0.0 THEN 'und' "
        + " ".join(f"WHEN score_{la} = {best} THEN '{la}'" for la in langs)
        + " ELSE 'und' END"
    )
    r6 = "floor(score_{la} * 1000000 + 0.5) / 1000000.0 AS score_{la}"
    rounded = ", ".join(r6.format(la=la) for la in langs)
    return f"""
WITH docs AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(t) - 2, 1)),
           i -> (coalesce(arr[i], 0) * {b} + coalesce(arr[i+1], 0)) * {b} + coalesce(arr[i+2], 0)) AS sh
  FROM (SELECT doc_id, lower(text) AS t,
               list_transform(string_split(lower(text), ''), c -> CAST(ascii(c) AS BIGINT)) AS arr
        FROM documents)
), sc AS (
  SELECT doc_id,
    {score_cols}
  FROM docs
)
SELECT doc_id, {case} AS lang_pred, {rounded}
FROM sc
"""


def _q_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequencies over whitespace word tokens."""
    from numalogic_spark.operators.tokens import token_frequencies

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_remove(F.split(F.lower("text"), r"\s+"), "").alias("tokens"),
    )
    return token_frequencies(docs)


_TOKEN_FREQ_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS tokens
  FROM documents
), tf AS (
  SELECT t.token, count(*) AS term_freq
  FROM d, unnest(d.tokens) AS t(token)
  GROUP BY 1
), dfq AS (
  SELECT t.token, count(*) AS doc_freq
  FROM (SELECT list_distinct(tokens) AS tokens FROM d) u, unnest(u.tokens) AS t(token)
  GROUP BY 1
)
SELECT tf.token, tf.term_freq, dfq.doc_freq
FROM tf JOIN dfq USING (token)
"""


def _q_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.tokens import tf_idf_topk

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_remove(F.split(F.lower("text"), r"\s+"), "").alias("tokens"),
    )
    out = tf_idf_topk(docs, top_k=5)
    return out.select("doc_id", "token", "tf", _r6(F.col("score")).alias("score"), "rank")


_TF_IDF_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS tokens
  FROM documents
), per_doc AS (
  SELECT doc_id, t.token, count(*) AS tf
  FROM d, unnest(d.tokens) AS t(token)
  GROUP BY 1, 2
), dfq AS (
  SELECT t.token, count(*) AS doc_freq
  FROM (SELECT list_distinct(tokens) AS tokens FROM d) u, unnest(u.tokens) AS t(token)
  GROUP BY 1
), scored AS (
  SELECT doc_id, token, tf,
         tf * (ln(((SELECT count(*) FROM documents) + 1.0) / (doc_freq + 1)) + 1.0) AS score
  FROM per_doc JOIN dfq USING (token)
), ranked AS (
  SELECT doc_id, token, tf, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rank
  FROM scored
)
SELECT doc_id, token, tf, floor(score * 1000000 + 0.5) / 1000000.0 AS score, rank
FROM ranked WHERE rank <= 5
"""


def _q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk pack plan (512-token training sequences) over the
    documents' word tokens, deterministic doc_id order per source."""
    from numalogic_spark.operators.tokens import sequence_pack_plan

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.array_remove(F.split(F.lower("text"), r"\s+"), "")).alias("n_tok"),
    )
    return sequence_pack_plan(docs, 512)


_SEQ_PACK_SQL = r"""
WITH d AS (
  SELECT source, doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS n_tok
  FROM documents
), b AS (
  SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         -- CAST the windowed sum: DuckDB sum() yields HUGEINT which pandas
         -- renders as float64, while Spark emits int64 (driver hash gate).
         CAST(sum(CAST(n_tok AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS "offset"
  FROM d WHERE n_tok > 0
), e AS (
  SELECT source, doc_id, n_tok, "offset",
         unnest(generate_series(CAST(floor("offset" / 512) AS BIGINT),
                                CAST(floor(("offset" + n_tok - 1) / 512) AS BIGINT))) AS pack_id
  FROM b
)
SELECT source, pack_id, doc_id, "offset",
       greatest(pack_id * 512 - "offset", 0) AS tok_start,
       least((pack_id + 1) * 512 - "offset", n_tok) AS tok_end
FROM e
"""


def _q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 30% sample — reproducible keep/drop per row via the
    portable hash, replayed exactly by the oracle."""
    from numalogic_spark.operators.sampling import deterministic_sample

    return deterministic_sample(_docs(spark, sf_dir), 0.3).select("doc_id", "source")


def _sample_sql(rate: float = 0.3) -> str:
    from numalogic_spark.operators.dedup import MERSENNE31
    from numalogic_spark.operators.sampling import _CHAR_MULT, _SAMPLE_A, _SAMPLE_B

    p = MERSENNE31
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(generate_series(1, greatest(length(s), 1)), "
        f"i -> CAST(ascii(s[i]) AS BIGINT))), (acc, c) -> (acc * {_CHAR_MULT} + c) % {p})"
    )
    return f"""
WITH d AS (SELECT doc_id, source, CAST(doc_id AS VARCHAR) AS s FROM documents)
SELECT doc_id, source
FROM d
WHERE (({_SAMPLE_A} * ({fold}) + {_SAMPLE_B}) % {p}) / {float(p)} < {rate}
"""


def _q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing plan: src0..src9 at weight 3, src10..src19 at weight
    1, 10k-token budget over whitespace word counts."""
    from numalogic_spark.operators.sampling import mixture_plan

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.array_remove(F.split(F.lower("text"), r"\s+"), "")).alias("n_tok"),
    )
    weights = {f"src{i}": (3.0 if i < 10 else 1.0) for i in range(20)}
    plan = mixture_plan(docs, weights, 10_000)
    return plan.select(
        "source",
        "n_tok_total",
        _r6(F.col("weight")).alias("weight"),
        _r6(F.col("target_tokens")).alias("target_tokens"),
        _r6(F.col("rate")).alias("rate"),
        _r6(F.col("expected_tokens")).alias("expected_tokens"),
        _r6(F.col("shortfall")).alias("shortfall"),
    )


_MIXTURE_SQL = r"""
WITH wt(source, weight) AS (
  -- the engine's weight DICT seeded verbatim (mirrors mixture_plan's
  -- left-join-from-weights): a weighted source absent from the data must
  -- surface with n_tok_total 0 / rate 0 / full-target shortfall
  SELECT 'src' || CAST(i AS VARCHAR),
         (CASE WHEN i < 10 THEN 3.0 ELSE 1.0 END) / 40.0
  FROM (SELECT unnest(generate_series(0, 19)) AS i)
), d AS (
  SELECT source,
         len(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS n_tok
  FROM documents
), per_src AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tok_total FROM d GROUP BY 1
), w AS (
  SELECT wt.source, coalesce(per_src.n_tok_total, 0) AS n_tok_total, wt.weight
  FROM wt LEFT JOIN per_src USING (source)
), m AS (
  SELECT source, n_tok_total, weight,
         weight * 10000.0 AS target_tokens,
         CASE WHEN n_tok_total > 0
              THEN least(1.0, weight * 10000.0 / n_tok_total)
              ELSE 0.0 END AS rate
  FROM w
)
SELECT source, n_tok_total,
       floor(weight * 1000000 + 0.5) / 1000000.0 AS weight,
       floor(target_tokens * 1000000 + 0.5) / 1000000.0 AS target_tokens,
       floor(rate * 1000000 + 0.5) / 1000000.0 AS rate,
       floor(rate * n_tok_total * 1000000 + 0.5) / 1000000.0 AS expected_tokens,
       floor(greatest(target_tokens - n_tok_total, 0.0) * 1000000 + 0.5) / 1000000.0 AS shortfall
FROM m
"""


def _q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training shuffle: shard + within-shard order from the
    portable hash of doc_id."""
    from numalogic_spark.operators.sampling import training_order

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    return training_order(docs, 4, ["doc_id"])


def _training_order_sql(n_shards: int = 4) -> str:
    from numalogic_spark.operators.dedup import MERSENNE31
    from numalogic_spark.operators.sampling import _CHAR_MULT, _SAMPLE_A, _SAMPLE_B

    p = MERSENNE31
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(generate_series(1, greatest(length(s), 1)), "
        f"i -> CAST(ascii(s[i]) AS BIGINT))), (acc, c) -> (acc * {_CHAR_MULT} + c) % {p})"
    )
    return f"""
WITH d AS (SELECT doc_id, source, CAST(doc_id AS VARCHAR) AS s FROM documents),
h AS (SELECT doc_id, source, ({_SAMPLE_A} * ({fold}) + {_SAMPLE_B}) % {p} AS oh FROM d)
SELECT doc_id, source,
       CAST(oh % {n_shards} AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY oh % {n_shards} ORDER BY oh, doc_id) - 1 AS INTEGER) AS ord
FROM h
"""


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.textstats import repetition_stats

    out = repetition_stats(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        _r6(F.col("dup_trigram_frac")).alias("dup_trigram_frac"),
        _r6(F.col("dup_line_frac")).alias("dup_line_frac"),
        _r6(F.col("top_word_frac")).alias("top_word_frac"),
    )


def _repetition_sql() -> str:
    from numalogic_spark.operators.dedup import BAND_MULT, MERSENNE31

    p = MERSENNE31
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(generate_series(1, greatest(length(w), 1)), "
        f"i -> CAST(ascii(w[i]) AS BIGINT))), (acc, c) -> (acc * 131 + c) % {p})"
    )
    gram = f"((hs[i] * {BAND_MULT} + hs[i+1]) % {p} * {BAND_MULT} + hs[i+2]) % {p}"
    r6 = "floor(({x}) * 1000000 + 0.5) / 1000000.0"
    return rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lns
  FROM documents
), h AS (
  SELECT doc_id, ws, lns, list_transform(ws, w -> {fold}) AS hs FROM d
), g AS (
  SELECT doc_id, ws, lns,
         CASE WHEN len(hs) >= 3
              THEN list_transform(generate_series(1, len(hs) - 2), i -> {gram})
              ELSE [] END AS tri
  FROM h
)
SELECT doc_id,
       {r6.format(x="CASE WHEN len(tri) > 0 THEN 1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri) ELSE 0.0 END")} AS dup_trigram_frac,
       {r6.format(x="CASE WHEN len(lns) > 0 THEN 1.0 - CAST(len(list_distinct(lns)) AS DOUBLE) / len(lns) ELSE 0.0 END")} AS dup_line_frac,
       {r6.format(x="CASE WHEN len(ws) > 0 THEN CAST(list_max(list_transform(list_distinct(ws), w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / len(ws) ELSE 0.0 END")} AS top_word_frac
FROM g
"""


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test 5-gram decontamination: even doc_ids are the train
    corpus, odd doc_ids the test corpus."""
    from numalogic_spark.operators.dedup import ngram_contamination

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    out = ngram_contamination(test, train, n=5)
    return out.select(
        "doc_id", "n_grams", "n_matched", _r6(F.col("contamination")).alias("contamination")
    )


def _contamination_sql(n: int = 5) -> str:
    from numalogic_spark.operators.dedup import BAND_MULT, MERSENNE31

    p = MERSENNE31
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(generate_series(1, greatest(length(w), 1)), "
        f"i -> CAST(ascii(w[i]) AS BIGINT))), (acc, c) -> (acc * 131 + c) % {p})"
    )
    gram = f"hs[i]"
    for j in range(1, n):
        gram = f"(({gram}) * {BAND_MULT} + hs[i+{j}]) % {p}"
    return rf"""
WITH d AS (
  SELECT doc_id,
         list_transform(
           list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
           w -> {fold}) AS hs
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= {n}
              THEN list_distinct(list_transform(generate_series(1, len(hs) - {n - 1}),
                                                i -> {gram}))
              ELSE [] END AS grams
  FROM d
), train AS (
  SELECT DISTINCT t.g FROM g, unnest(g.grams) AS t(g) WHERE doc_id % 2 = 0
), test_g AS (
  SELECT doc_id, t.g FROM g, unnest(g.grams) AS t(g) WHERE doc_id % 2 = 1
), m AS (
  SELECT doc_id,
         count(*) AS n_grams,
         -- CAST: DuckDB sum() is HUGEINT -> float64 in pandas vs Spark int64.
         CAST(sum(CASE WHEN g IN (SELECT g FROM train) THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
  FROM test_g GROUP BY 1
)
SELECT g.doc_id,
       coalesce(m.n_grams, 0) AS n_grams,
       coalesce(m.n_matched, 0) AS n_matched,
       floor(CASE WHEN coalesce(m.n_grams, 0) > 0
                  THEN CAST(m.n_matched AS DOUBLE) / m.n_grams
                  ELSE 0.0 END * 1000000 + 0.5) / 1000000.0 AS contamination
FROM g LEFT JOIN m USING (doc_id)
WHERE g.doc_id % 2 = 1
"""


def _q_trigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.textstats import trigram_entropy

    out = trigram_entropy(_docs(spark, sf_dir))
    return out.select("doc_id", _r6(F.col("trigram_entropy")).alias("trigram_entropy"))


def _trigram_entropy_sql() -> str:
    from numalogic_spark.operators.dedup import SHINGLE_BASE

    b = SHINGLE_BASE
    return rf"""
WITH docs AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(t) - 2, 1)),
           i -> (coalesce(arr[i], 0) * {b} + coalesce(arr[i+1], 0)) * {b} + coalesce(arr[i+2], 0)) AS sh
  FROM (SELECT doc_id, lower(text) AS t,
               list_transform(string_split(lower(text), ''), c -> CAST(ascii(c) AS BIGINT)) AS arr
        FROM documents)
), h AS (
  SELECT doc_id, len(sh) AS n,
         list_sum(list_transform(
           list_sort(list_transform(list_distinct(sh), d -> len(list_filter(sh, x -> x = d)))),
           c -> CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))) AS s
  FROM docs
)
SELECT doc_id,
       floor((CASE WHEN n > 0 THEN ln(CAST(n AS DOUBLE)) - s / n ELSE 0.0 END) * 1000000 + 0.5) / 1000000.0
         AS trigram_entropy
FROM h
"""


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.8)
    return out.select("id_a", "id_b", _r6("jaccard").alias("jaccard"))


def _minhash_sql(
    num_hashes: int = 60,
    bands: int = 12,
    threshold: float = 0.8,
    seed: int = 1,
    n: int = 3,
    est_margin: float = 0.1,
) -> str:
    """DuckDB replay of the ENTIRE MinHash-LSH pipeline — shingle codes,
    universal-hash permutations, band folding, candidate self-join, the
    signature-estimate prefilter and the exact-Jaccard verification —
    using the same modular-arithmetic hash family as operators/dedup.py
    (same seeded constants)."""
    from numalogic_spark.operators.dedup import (
        BAND_MULT,
        MERSENNE31,
        SHINGLE_BASE,
        _minhash_params,
    )

    p = MERSENNE31
    rows = num_hashes // bands
    code = "CAST(ascii(substr(t, i, 1)) AS BIGINT)"
    for j in range(1, n):
        code = f"({code} * {SHINGLE_BASE} + ascii(substr(t, i+{j}, 1)))"
    sig_entries = ",\n    ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {p}))"
        for a, b in _minhash_params(num_hashes, seed)
    )
    band_structs = []
    for bi in range(bands):
        acc = str(bi)
        for ri in range(rows):
            acc = f"(({acc}) * {BAND_MULT} + sig[{bi * rows + ri + 1}]) % {p}"
        band_structs.append("{'band': %d, 'bh': %s}" % (bi, acc))
    structs = ",\n    ".join(band_structs)
    return f"""
WITH docs AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
           generate_series(1, greatest(length(t) - {n - 1}, 1)), i -> {code})) AS codes
  FROM (SELECT doc_id, lower(text) AS t FROM documents)
  WHERE len(regexp_replace(t, '\s', '', 'g')) > 0  -- engine's degenerate-doc guard
), hs AS (
  SELECT id, list_transform(codes, c -> c % {p}) AS h FROM docs
), sig AS (
  SELECT id, [{sig_entries}] AS sig FROM hs
), sl AS (
  SELECT id, sig, u.band AS band, u.bh AS bh
  FROM (SELECT id, sig, unnest([{structs}]) AS u FROM sig)
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM sl a JOIN sl b
    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
   AND len(list_filter(generate_series(1, {num_hashes}), i -> a.sig[i] = b.sig[i]))
       / {float(num_hashes)} >= {max(threshold - est_margin, 0.0)}
), pairs AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(da.codes, db.codes)) AS inter,
         len(da.codes) AS na, len(db.codes) AS nb
  FROM cand c JOIN docs da ON da.id = c.id_a JOIN docs db ON db.id = c.id_b
)
SELECT id_a, id_b,
       floor((inter * 1.0 / (na + nb - inter)) * 1000000 + 0.5) / 1000000.0 AS jaccard
FROM pairs WHERE inter * 1.0 / (na + nb - inter) >= {threshold}
"""


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.dedup import simhash_near_pairs

    out = simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def _simhash_sql(max_hamming: int = 3) -> str:
    """DuckDB replay of the full 124-bit SimHash pipeline: per-word char
    folds → universal hashes → packed contributions → per-bit majority →
    chunk banding → hamming verification, with the same seeded constants
    as operators/dedup.py."""
    from numalogic_spark.operators.dedup import (
        _CHAR_MULT_1,
        _CHAR_MULT_2,
        _PACK,
        MERSENNE31,
        _simhash_params,
    )

    p = MERSENNE31
    (a1, b1, c1), (a2, b2, c2), (a3, b3, c3), (a4, b4, c4) = _simhash_params()

    def fold(mult: int) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(generate_series(1, greatest(length(w), 1)), "
            "i -> CAST(ascii(w[i]) AS BIGINT))), "
            f"(acc, c) -> (acc * {mult} + c) % {p})"
        )

    h1, h2 = fold(_CHAR_MULT_1), fold(_CHAR_MULT_2)

    def g(a: int, b: int, c: int) -> str:
        # products reduced mod p before summing (2^63 overflow guard)
        return f"((({a} * ({h1})) % {p} + ({b} * ({h2})) % {p} + {c}) % {p})"

    lo = f"{g(a1, b1, c1)} + {g(a2, b2, c2)} * {_PACK}"
    hi = f"{g(a3, b3, c3)} + {g(a4, b4, c4)} * {_PACK}"

    def majority(col: str) -> str:
        terms = [
            f"(CASE WHEN 2 * len(list_filter({col}, v -> ((v >> {b}) & 1) = 1)) > len({col}) "
            f"THEN {1 << b} ELSE 0 END)"
            for b in range(62)
        ]
        return "CAST(" + "\n      + ".join(terms) + " AS BIGINT)"

    n_chunks = max_hamming + 1
    per_long = (n_chunks + 1) // 2
    chunk_structs = []

    def add_chunks(col: str, n: int) -> None:
        if n <= 0:  # max_hamming=0 → single chunk on sim_lo only
            return
        base = 62 // n
        off = 0
        for ci in range(n):
            width = base + (62 - base * n if ci == n - 1 else 0)
            mask = (1 << width) - 1
            chunk_structs.append(
                "{'chunk': %d, 'cv': (%s >> %d) & %d}" % (len(chunk_structs), col, off, mask)
            )
            off += width

    add_chunks("sim_lo", per_long)
    add_chunks("sim_hi", n_chunks - per_long)
    structs = ",\n    ".join(chunk_structs)
    return f"""
WITH words AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
  FROM documents
  WHERE len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) > 0
), packs AS (
  SELECT id,
         list_transform(ws, w -> {lo}) AS plo,
         list_transform(ws, w -> {hi}) AS phi
  FROM words
), sig AS (
  SELECT id, {majority("plo")} AS sim_lo, {majority("phi")} AS sim_hi FROM packs
), chunks AS (
  SELECT id, sim_lo, sim_hi, u.chunk AS chunk, u.cv AS cv
  FROM (SELECT id, sim_lo, sim_hi, unnest([{structs}]) AS u FROM sig)
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.sim_lo, b.sim_lo)) + bit_count(xor(a.sim_hi, b.sim_hi)) AS BIGINT) AS hamming
FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.cv = b.cv AND a.id < b.id
WHERE bit_count(xor(a.sim_lo, b.sim_lo)) + bit_count(xor(a.sim_hi, b.sim_hi)) <= {max_hamming}
"""


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.textstats import doc_fingerprint

    return doc_fingerprint(_docs(spark, sf_dir), "text", "doc_id")


_FINGERPRINT_SQL = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT), list_transform(words, w ->
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, greatest(length(w), 1)),
                              i -> CAST(ascii(w[i]) AS BIGINT))),
             (acc, c) -> (acc * 131 + c) % 2147483647))),
         (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fingerprint
FROM (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
      FROM documents)
"""


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from numalogic_spark.operators.similarity import lsh_bucketed_ann

    embs = _embs(spark, sf_dir)
    q = embs.filter("vec_id = 0").select("embedding").collect()[0][0]
    out = lsh_bucketed_ann(embs, [float(x) for x in q], k=10, multiprobe_hamming=2)
    return out.select("id", _r6("cos_sim").alias("cos_sim"))


def _ann_sql(k: int = 10, n_planes: int = 8, seed: int = 42, dim: int = 64, hamming: int = 2) -> str:
    """DuckDB replay of the SRP-bucketed ANN probe: the seeded plane matrix
    is embedded as literals (repr round-trips doubles exactly), buckets are
    sign-bit sums, and the multiprobe set 'all buckets within hamming≤2 of
    the query bucket' becomes a bit_count(xor) filter. dim is fixed by the
    embeddings testdata (TESTDATA.md)."""
    from numalogic_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)

    def lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[]"

    def bucket(vcol: str) -> str:
        terms = [
            f"(CASE WHEN list_dot_product({vcol}, {lit(p)}) >= 0.0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        ]
        return "(" + "\n     + ".join(terms) + ")"

    return f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), qb AS (
  SELECT qv, {bucket("qv")} AS qbucket FROM q
), b AS (
  SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
         {bucket("e.embedding::DOUBLE[]")} AS bucket
  FROM embeddings e
), cand AS (
  SELECT b.id, b.v, qb.qv
  FROM b, qb
  WHERE bit_count(xor(CAST(b.bucket AS BIGINT), CAST(qb.qbucket AS BIGINT))) <= {hamming}
)
SELECT id, floor(list_cosine_similarity(v, qv) * 1000000 + 0.5) / 1000000.0 AS cos_sim
FROM cand
ORDER BY list_cosine_similarity(v, qv) DESC, id
LIMIT {k}
"""


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: seeded k-means codebook + nprobe list probing (the scale
    path where lists are table partitions). Rows-only; recall vs brute
    force pytest-gated."""
    from numalogic_spark.operators.similarity import ivf_ann_topk, ivf_train_centroids

    embs = _embs(spark, sf_dir)
    q = embs.filter("vec_id = 0").select("embedding").collect()[0][0]
    # portable sample order → the oracle generator replays the exact
    # training (shared kmeans_fit) and embeds the codebook as literals
    cents = ivf_train_centroids(
        embs, n_centroids=8, sample_rows=2000, seed=42, portable_order_id="vec_id"
    )
    out = ivf_ann_topk(embs, [float(x) for x in q], cents, k=10, nprobe=4)
    return out.select("id", _r6("cos_sim").alias("cos_sim"))


def _ivf_sql() -> str:
    """DuckDB replay of the IVF probe: reproduce the SAME codebook by
    replaying the portable-hash sample order and the shared numpy
    kmeans_fit over the sf0.01 embeddings (the driver's oracle scale),
    then express assignment (first-max argmax over the centroid dots),
    nprobe filtering, and the cosine top-k in SQL with literal centroids."""
    import numpy as np

    nprobe, k = 4, 10
    cents, rel = _semdedup_replay_codebook()
    qv = np.asarray(
        [r[1] for r in rel if r[0] == 0][0], dtype=float
    )
    qn = qv / np.linalg.norm(qv)
    probes = np.argsort(-(cents @ qn), kind="stable")[:nprobe].tolist()
    cent_lits = ", ".join(
        "[" + ", ".join(repr(float(c)) for c in row) + "]::DOUBLE[]" for row in cents
    )
    dots = ", ".join(
        f"list_inner_product(v, c{i}) AS d{i}" for i in range(len(cents))
    )
    c_cols = ", ".join(f"cent[{i + 1}] AS c{i}" for i in range(len(cents)))
    best = "greatest(" + ", ".join(f"d{i}" for i in range(len(cents))) + ")"
    assign = (
        "CASE "
        + " ".join(f"WHEN d{i} = {best} THEN {i}" for i in range(len(cents)))
        + " END"
    )
    q_lit = "[" + ", ".join(repr(float(v)) for v in qv) + "]::DOUBLE[]"
    return f"""
WITH cents AS (SELECT [{cent_lits}] AS cent),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
cc AS (SELECT e.vec_id, e.v, {c_cols} FROM e, cents),
d AS (SELECT vec_id, v, {dots} FROM cc),
a AS (SELECT vec_id, v, {assign} AS _list FROM d)
SELECT vec_id AS id,
       floor(list_cosine_similarity(v, {q_lit}) * 1000000 + 0.5) / 1000000.0 AS cos_sim
FROM a WHERE _list IN ({", ".join(str(int(p)) for p in probes)})
ORDER BY list_cosine_similarity(v, {q_lit}) DESC, vec_id
LIMIT {k}
"""


def _q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic pruning (Abbas et al. 2023): k-means cluster the
    embeddings (same seeded codebook as the IVF query), prune within-cluster
    near-duplicates keeping the member least similar to its centroid.
    Oracle replays the codebook as literals (the IVF/MCD discipline)."""
    from numalogic_spark.operators.dedup import semdedup_prune
    from numalogic_spark.operators.similarity import ivf_train_centroids

    embs = _embs(spark, sf_dir)
    cents = ivf_train_centroids(
        embs, n_centroids=8, sample_rows=2000, seed=42, portable_order_id="vec_id"
    )
    # 0.35 prunes ~19% of the synthetic fixture (its hash-derived vectors
    # have much lower pairwise cosine than real text embeddings — within-
    # cluster median 0.06 / max 0.51 — so the paper's 0.9-ish eps would be
    # a no-op here); real corpora tune eps to the target prune rate
    out = semdedup_prune(embs, cents, threshold=0.35)
    return out.select(
        "id", "cluster", _r6("cos_to_centroid").alias("cos_to_centroid"), "kept"
    )


def _semdedup_replay_codebook():
    """THE shared codebook replay (used by _ivf_sql AND _semdedup_sql so
    the two oracles can never desynchronize from each other): reproduce
    the Spark-side ivf_train_centroids(n_centroids=8, sample_rows=2000,
    seed=42, portable_order_id="vec_id") outside Spark — portable-hash
    sample order, zero-norm drop, shared numpy kmeans_fit — over the
    sf0.01 fixture (the driver's oracle scale). Returns (centroids, the
    raw non-null (vec_id, embedding) rows) so callers needing specific
    vectors (the IVF query vector) reuse the same read."""
    import duckdb
    import numpy as np

    from numalogic_spark.operators.dedup import MERSENNE31
    from numalogic_spark.operators.sampling import _CHAR_MULT, _SAMPLE_A, _SAMPLE_B
    from numalogic_spark.operators.similarity import kmeans_fit

    seed, n_centroids, sample_rows = 42, 8, 2000
    rel = duckdb.sql(
        "SELECT vec_id, embedding FROM '/root/testdata/sf0.01/embeddings.parquet' "
        "WHERE embedding IS NOT NULL"
    ).fetchall()

    def unit(vid: int) -> float:
        acc = seed % MERSENNE31
        for ch in str(vid):
            acc = (acc * _CHAR_MULT + ord(ch)) % MERSENNE31
        return ((_SAMPLE_A * acc + _SAMPLE_B) % MERSENNE31) / MERSENNE31

    ordered = sorted(rel, key=lambda r: (unit(r[0]), r[0]))[:sample_rows]
    x = [np.asarray(r[1], dtype=float) for r in ordered]
    x = [v for v in x if np.linalg.norm(v) > 0]
    return kmeans_fit(np.asarray(x), n_centroids, iters=10, seed=seed), rel


def _semdedup_sql() -> str:
    """DuckDB replay of the SemDeDup decision: literal codebook →
    first-max assignment + cosine-to-centroid → per-cluster rank →
    rank-triangle near-dup join → kept = never dominated."""
    cents, _ = _semdedup_replay_codebook()
    n = len(cents)
    dots = ", ".join(
        "list_inner_product(v, ["
        + ", ".join(repr(float(c)) for c in row)
        + "]::DOUBLE[]) AS d" + str(i)
        for i, row in enumerate(cents)
    )
    best = "greatest(" + ", ".join(f"d{i}" for i in range(n)) + ")"
    assign = (
        "CASE "
        + " ".join(f"WHEN d{i} = {best} THEN {i}" for i in range(n))
        + " END"
    )
    # degenerate-row contract mirrors semdedup_prune: NULL embeddings,
    # embeddings with a null element, and zero-norm embeddings are
    # excluded (no direction in cosine space; their NULL/NaN semantics
    # diverge between engines). Pair test divides the inner product by
    # per-row norms, the exact arithmetic the engine runs.
    return f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE embedding IS NOT NULL
              AND len(list_filter(embedding, x -> x IS NULL)) = 0),
e AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e0
      WHERE list_inner_product(v, v) > 0),
d AS (SELECT vec_id, v, nrm, {dots} FROM e),
a AS (SELECT vec_id, v, nrm, {assign} AS cluster,
             {best} / nrm AS cos_c FROM d),
r AS (SELECT vec_id, v, nrm, cluster, cos_c,
             row_number() OVER (PARTITION BY cluster ORDER BY cos_c ASC, vec_id ASC) AS rn
      FROM a),
p AS (SELECT DISTINCT b.vec_id AS id
      FROM r a JOIN r b ON a.cluster = b.cluster AND a.rn < b.rn
      WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35)
SELECT r.vec_id AS id, r.cluster,
       floor(r.cos_c * 1000000 + 0.5) / 1000000.0 AS cos_to_centroid,
       (p.id IS NULL) AS kept
FROM r LEFT JOIN p ON r.vec_id = p.id
"""


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: MinHash-LSH pairs → connected components →
    (id, cluster_id = min id of the component). The transitive-closure
    step is what turns pair lists into an actual dedup decision."""
    from numalogic_spark.operators.dedup import minhash_lsh_pairs, near_dup_clusters

    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.8)
    return near_dup_clusters(pairs).select("id", "cluster_id")


def _dedup_clusters_sql() -> str:
    """Recursive-CTE replay: same MinHash pairs (shared SQL), then
    min-label reachability closure."""
    mh = _minhash_sql()
    return f"""
WITH RECURSIVE mh AS ({mh}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM mh
  UNION
  SELECT id_b, id_a FROM mh
),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id
"""


def _q_prometheus_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 Prometheus connector frame: events reshaped into the connector's
    response shape (metric rows carrying (ts, value-string) arrays), then
    normalized through read_prometheus_frame — explode → float cast →
    multi-metric columns → per-timestamp mean (prometheus.py:113-118,
    193-205)."""
    from numalogic_spark.sources.connectors import read_prometheus_frame

    types = ["click", "error", "purchase", "signup", "view"]
    resp = _events(spark, sf_dir).groupBy(F.col("event_type").alias("metric_name")).agg(
        F.collect_list(
            F.struct(
                F.unix_timestamp("ts").alias("ts"),
                F.col("value").cast("string").alias("value"),
            )
        ).alias("values")
    )
    wide = read_prometheus_frame(resp, types, aggregate=True, decimal_mean=True)
    return wide.select(
        F.unix_timestamp("timestamp").alias("ts_s"),
        *[_r6(F.col(t)).alias(t) for t in types],
    )


def _prom_frame_sql() -> str:
    # decimal-sum mean mirrors read_prometheus_frame(decimal_mean=True):
    # plain double avg() is FP-order-dependent across engines
    cols = ",\n  ".join(
        f"floor((CAST(sum(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(20,6)) END) AS DOUBLE)"
        f" / count(CASE WHEN event_type = '{t}' THEN value END)) * 1000000 + 0.5) / 1000000.0 AS {t}"
        for t in ["click", "error", "purchase", "signup", "view"]
    )
    return f"""
SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
  {cols}
FROM events GROUP BY 1
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full rollup cascade over the synthetic token table at
    smoke scale — union of all tiers (the engine's continuous aggregates)."""
    from numalogic_spark.datagen import gen_tokens_spark

    from numalogic_spark.operators.rollup import histogram, rollup_tiers_fused

    df = gen_tokens_spark(spark, 10_000, n_sources=20)
    out = rollup_tiers_fused(histogram(df, RollupConfig(), "minute"), RollupConfig())
    return out.select(
        "source", F.unix_timestamp("bucket_ts").alias("bucket_s"), "tier",
        "count", "n_tok_sum", "n_tok_mean", "n_tok_p95", "token_rate",
    )


_BPE_VOCAB_RESOURCE = "bpe_frozen_150.json"  # loaded via
# importlib.resources so a --py-files zip deployment works (a
# __file__-relative path would point inside the archive)


def _q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE encode of every document under the FROZEN committed
    vocab (numalogic_spark/resources/bpe_frozen_150.json — trained once,
    deterministic artifact, the way production tokenizers ship): per doc,
    token count and a polynomial fold over the full token-id sequence.
    Gates every token id and their order through the driver's value hash."""
    from numalogic_spark.functions.bpe import BpeVocab, encode_words_fingerprint

    vocab = BpeVocab.load_resource(_BPE_VOCAB_RESOURCE)
    return encode_words_fingerprint(_docs(spark, sf_dir), vocab).select(
        "doc_id", "n_tok", "tok_fp"
    )


def _bpe_encode_sql() -> str:
    """DuckDB replay of BPE ENCODING as a recursive CTE: each iteration
    applies one merge type (the best-ranked pair present, all occurrences
    left-to-right via a list_reduce with a list accumulator; DuckDB slices
    are INCLUSIVE, hence acc[:-2] for all-but-last) to every still-mergeable
    DISTINCT word; the fixpoint row per word is the shortest. Base alphabet
    is ascii() codepoints — equal to the engine's UTF-8 bytes on this ASCII
    corpus. Encoded per-word ids are then reassembled per document in word
    order and folded with the same (acc·1000003 + id) mod 2^31−1."""
    from numalogic_spark.functions.bpe import _FP_MOD, _FP_MULT, BpeVocab

    vocab = BpeVocab.load_resource(_BPE_VOCAB_RESOURCE)
    K = 1 << 32
    vals = ", ".join(
        f"({a}, {b}, {256 + i})" for i, (a, b) in enumerate(vocab.merges)
    )
    return rf"""
WITH RECURSIVE merges(a, b, nid) AS (VALUES {vals}),
docs AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ws
  FROM documents
),
words(word) AS (
  SELECT DISTINCT t.w FROM docs, unnest(docs.ws) AS t(w)
),
enc(word, ids) AS (
  SELECT word, list_transform(string_split(word, ''), c -> CAST(ascii(c) AS BIGINT))
  FROM words
  UNION ALL
  SELECT s.word,
         list_reduce(
           list_prepend(CAST([] AS BIGINT[]), list_transform(s.ids, x -> CAST([x] AS BIGINT[]))),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m2.a AND x[1] = m2.b
                            THEN list_concat(acc[:-2], [m2.nid])
                            ELSE list_append(acc, x[1]) END)
  FROM (
    SELECT word, ids,
           (SELECT min(m.nid) FROM merges m
             WHERE list_contains(
               list_transform(generate_series(1, len(ids) - 1), i -> ids[i] * {K} + ids[i+1]),
               m.a * {K} + m.b)) AS nid
    FROM enc
  ) s JOIN merges m2 ON m2.nid = s.nid
),
final AS (
  SELECT word, arg_min(ids, len(ids)) AS ids FROM enc GROUP BY word
),
perword AS (
  SELECT d.doc_id, t.i, d.ws[t.i] AS word
  FROM docs d, unnest(generate_series(1, len(d.ws))) AS t(i)
),
perdoc AS (
  SELECT pw.doc_id, flatten(list(f.ids ORDER BY pw.i)) AS toks
  FROM perword pw JOIN final f USING (word)
  GROUP BY pw.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(len(p.toks), 0) AS BIGINT) AS n_tok,
       CAST(coalesce(
         list_reduce(list_prepend(CAST(0 AS BIGINT), p.toks),
                     (acc, x) -> (acc * {_FP_MULT} + x) % {_FP_MOD}),
         0) AS BIGINT) AS tok_fp
FROM docs d LEFT JOIN perdoc p USING (doc_id)
"""


def _q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style text normalization (control-char strip, whitespace
    collapse, blank-line squeeze, trim) — normalized text hash-gated."""
    from numalogic_spark.operators.textstats import normalize_text_expr

    return _docs(spark, sf_dir).select(
        "doc_id", normalize_text_expr("text").alias("normalized")
    )


def _normalize_sql() -> str:
    from numalogic_spark.operators.textstats import NORMALIZE_STEPS

    cur = "text"
    for pat, repl in NORMALIZE_STEPS:
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return f"SELECT doc_id, trim({cur}) AS normalized FROM documents"


_LM_VOCAB = 4000


def _q_lm_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM perplexity per document (add-one smoothing,
    top-V vocab with deterministic ties, <unk> OOV state, sorted-fold
    log-prob sum so the double matches DuckDB bit-for-bit)."""
    from numalogic_spark.operators.lm import bigram_perplexity

    out = bigram_perplexity(_docs(spark, sf_dir), vocab_size=_LM_VOCAB)
    return out.select("doc_id", _r6("ppl").alias("ppl"), "n_bigrams")


def _lm_ppl_sql() -> str:
    """DuckDB replay of the full bigram-LM pipeline: tokenize, top-V
    vocabulary (count desc, word asc — same tie-break), OOV mapping via
    vocab anti-lookup, per-doc bigram multiplicities, corpus model
    c12/c1 derived from the per-doc counts, and the per-doc log-prob sum
    folded over the SORTED term list (list_sum∘list_sort ≡ Spark's
    aggregate∘array_sort — the trigram-entropy discipline)."""
    from numalogic_spark.operators.lm import UNK

    return rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ws
  FROM documents
), wc AS (
  SELECT t.w AS word, count(*) AS c
  FROM d, unnest(d.ws) AS t(w)
  GROUP BY 1
), vocab AS (
  SELECT word FROM wc ORDER BY c DESC, word ASC LIMIT {_LM_VOCAB}
), vsz AS (
  SELECT CAST(count(*) + 1 AS DOUBLE) AS v_sm FROM vocab
), raw AS (
  SELECT doc_id, ws[g.i] AS w1r, ws[g.i + 1] AS w2r
  FROM d, unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS g(i)
), mapped AS (
  SELECT doc_id,
         coalesce(v1.word, '{UNK}') AS w1,
         coalesce(v2.word, '{UNK}') AS w2
  FROM raw
  LEFT JOIN vocab v1 ON v1.word = raw.w1r
  LEFT JOIN vocab v2 ON v2.word = raw.w2r
), k AS (
  SELECT doc_id, w1, w2, count(*) AS k FROM mapped GROUP BY 1, 2, 3
), c12 AS (
  SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12 FROM k GROUP BY 1, 2
), c1 AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1
), terms AS (
  SELECT k.doc_id, k.k,
         CAST(k.k AS DOUBLE)
           * (ln(CAST(c12.c12 AS DOUBLE) + 1.0)
              - ln(CAST(c1.c1 AS DOUBLE) + (SELECT v_sm FROM vsz))) AS term
  FROM k JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
), agg AS (
  SELECT doc_id,
         list_sum(list_sort(list(term))) AS s,
         CAST(sum(k) AS BIGINT) AS m
  FROM terms GROUP BY 1
)
SELECT dd.doc_id,
       floor(coalesce(exp(-agg.s / agg.m), 0.0) * 1000000 + 0.5) / 1000000.0 AS ppl,
       coalesce(agg.m, 0) AS n_bigrams
FROM (SELECT doc_id FROM documents) dd LEFT JOIN agg USING (doc_id)
"""


def _q_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail corpus partition over the bigram-LM
    perplexity (equal-count buckets, lowest-ppl = head)."""
    from numalogic_spark.operators.lm import perplexity_buckets

    return perplexity_buckets(_q_lm_ppl(spark, sf_dir))


def _lm_buckets_sql() -> str:
    return f"""
WITH scored AS ({_lm_ppl_sql()})
SELECT doc_id, ppl, n_bigrams,
       (['head', 'middle', 'tail'])[ntile(3) OVER (ORDER BY ppl ASC, doc_id ASC)] AS bucket
FROM scored
"""


_KL_VOCAB = 4000
_KL_ALPHA = 0.5


def _q_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift vs the corpus (smoothed KL and
    Jensen–Shannon over the top-V vocabulary + <unk>) — the domain-mixture
    monitor."""
    from numalogic_spark.operators.tokens import token_distribution_divergence

    out = token_distribution_divergence(
        _docs(spark, sf_dir), group_col="source",
        vocab_size=_KL_VOCAB, alpha=_KL_ALPHA,
    )
    return out.select(
        F.col("grp").alias("source"), "n_tokens",
        _r6("kl").alias("kl"), _r6("js").alias("js"),
    )


def _token_divergence_sql() -> str:
    from numalogic_spark.operators.lm import UNK

    a = repr(float(_KL_ALPHA))
    vd = f"({a} * CAST((SELECT vplus FROM vs) AS DOUBLE))"
    return rf"""
WITH d AS (
  SELECT source AS grp,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ws
  FROM documents
), tok AS (
  SELECT grp, t.w AS word FROM d, unnest(d.ws) AS t(w)
), wc AS (
  SELECT grp, word, count(*) AS c FROM tok GROUP BY 1, 2
), corpus AS (
  SELECT word, sum(c) AS cc FROM wc GROUP BY 1
), vocab AS (
  SELECT word FROM corpus ORDER BY cc DESC, word ASC LIMIT {_KL_VOCAB}
), vs AS (
  SELECT count(*) + 1 AS vplus FROM vocab
), folded AS (
  SELECT grp,
         CASE WHEN v.word IS NOT NULL THEN wc.word ELSE '{UNK}' END AS w,
         CAST(sum(c) AS BIGINT) AS c
  FROM wc LEFT JOIN vocab v USING (word) GROUP BY 1, 2
), groups AS (
  SELECT grp, CAST(sum(c) AS BIGINT) AS n_tokens FROM folded GROUP BY 1
), cf AS (
  SELECT w, CAST(sum(c) AS BIGINT) AS cq FROM folded GROUP BY 1
), states AS (
  SELECT word FROM vocab UNION ALL SELECT '{UNK}'
), ncorp AS (
  SELECT CAST(sum(c) AS DOUBLE) AS n FROM folded
), grid AS (
  SELECT g.grp, g.n_tokens,
         (CAST(coalesce(f.c, 0) AS DOUBLE) + {a})
           / (CAST(g.n_tokens AS DOUBLE) + {vd}) AS p,
         (CAST(coalesce(cf.cq, 0) AS DOUBLE) + {a})
           / ((SELECT n FROM ncorp) + {vd}) AS q
  FROM groups g
  CROSS JOIN states s
  LEFT JOIN folded f ON f.grp = g.grp AND f.w = s.word
  LEFT JOIN cf ON cf.w = s.word
), terms AS (
  SELECT grp, n_tokens,
         p * ln(p / q) AS t_kl,
         p * ln(p / ((p + q) / 2.0)) AS t_pm,
         q * ln(q / ((p + q) / 2.0)) AS t_qm
  FROM grid
)
SELECT grp AS source, n_tokens,
       floor(list_sum(list_sort(list(t_kl))) * 1000000 + 0.5) / 1000000.0 AS kl,
       floor(((list_sum(list_sort(list(t_pm))) + list_sum(list_sort(list(t_qm)))) / 2.0)
             * 1000000 + 0.5) / 1000000.0 AS js
FROM terms GROUP BY 1, 2
"""


_ACF_LAGS = (1, 2, 3, 6, 12)
_EVT_WINDOW_SQL = "PARTITION BY event_type ORDER BY floor(epoch(ts)), event_id"


def _evt_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events as a per-series frame: source=event_type, integral-second
    ts + event_id ordering (the ewm_smooth ordering discipline)."""
    return _events(spark, sf_dir).select(
        F.col("event_type").alias("source"),
        F.unix_timestamp("ts").alias("ts_s"),
        "event_id",
        "value",
    )


def _q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation (statsmodels-style full-mean estimator)
    at lags 1/2/3/6/12 — decimal raw moments, one sort + one agg."""
    from numalogic_spark.operators.tsfeatures import acf

    out = acf(_evt_series(spark, sf_dir), lags=_ACF_LAGS)
    return out.select("source", "lag", "n_used", _r6("acf_value").alias("acf_value"))


def _acf_sql() -> str:
    """DuckDB replay: identical decimal moments (Σx, Σx², Σx·lag_k as
    DECIMAL(19,6) sums → exact), identical double expression shapes for
    mean/variance/ACF, UNION ALL unpivot per lag."""
    lag_cols = ",\n         ".join(
        f"lag(CAST(value AS DECIMAL(19,6)), {k}) OVER w AS l{k}" for k in _ACF_LAGS
    )
    mom_cols = ",\n         ".join(
        f"count(l{k}) AS nk{k},\n"
        f"         CAST(sum(xd * l{k}) AS DOUBLE) AS sxl{k},\n"
        f"         CAST(sum(CASE WHEN l{k} IS NOT NULL THEN xd END) AS DOUBLE) AS sxk{k},\n"
        f"         CAST(sum(l{k}) AS DOUBLE) AS slk{k}"
        for k in _ACF_LAGS
    )
    mu = "(sx / CAST(n AS DOUBLE))"
    den = "(sxx - (sx * sx) / CAST(n AS DOUBLE))"
    arms = "\nUNION ALL\n".join(
        f"SELECT source, {k} AS lag, nk{k} AS n_used,\n"
        f"       floor((CASE WHEN {den} > 0.0 AND nk{k} > 0 THEN\n"
        f"         (sxl{k} - {mu} * (sxk{k} + slk{k}) + CAST(nk{k} AS DOUBLE) * {mu} * {mu}) / {den}\n"
        f"         ELSE 0.0 END) * 1000000 + 0.5) / 1000000.0 AS acf_value\n"
        f"FROM m"
        for k in _ACF_LAGS
    )
    return f"""
WITH b AS (
  SELECT event_type AS source,
         CAST(value AS DECIMAL(19,6)) AS xd,
         {lag_cols}
  FROM events
  WINDOW w AS ({_EVT_WINDOW_SQL})
), m AS (
  SELECT source,
         count(*) AS n,
         CAST(sum(xd) AS DOUBLE) AS sx,
         CAST(sum(xd * xd) AS DOUBLE) AS sxx,
         {mom_cols}
  FROM b GROUP BY 1
)
{arms}
"""


def _q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series CUSUM change-point (standardized cumulative sum,
    earliest argmax of |s|) — running decimal sum, one sort reused."""
    from numalogic_spark.operators.tsfeatures import cusum_changepoint

    return cusum_changepoint(_evt_series(spark, sf_dir))


def _cusum_sql() -> str:
    return f"""
WITH b AS (
  SELECT event_type AS source,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id,
         CAST(sum(CAST(value AS DECIMAL(19,6)))
              OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run,
         row_number() OVER w AS pos,
         CAST(value AS DECIMAL(19,6)) AS xd
  FROM events
  WINDOW w AS ({_EVT_WINDOW_SQL})
), m AS (
  SELECT source, count(*) AS n,
         CAST(sum(xd) AS DOUBLE) AS sx,
         CAST(sum(xd * xd) AS DOUBLE) AS sxx
  FROM b GROUP BY 1
), st AS (
  SELECT source, n, sx / CAST(n AS DOUBLE) AS mu,
         CASE WHEN (sxx - (sx * sx) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) > 0.0
              THEN sqrt((sxx - (sx * sx) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
              ELSE 0.0 END AS sd
  FROM m
), s AS (
  SELECT b.source, st.n, b.ts_s, b.event_id, b.pos,
         CASE WHEN st.sd > 0.0
              THEN abs((b.run - CAST(b.pos AS DOUBLE) * st.mu) / st.sd)
              ELSE 0.0 END AS s_abs
  FROM b JOIN st USING (source)
)
SELECT source, n, ts_s AS cp_ts_s, event_id AS cp_event_id, pos AS cp_pos,
       floor(s_abs * 1000000 + 0.5) / 1000000.0 AS s_abs_max
FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY s_abs DESC, pos ASC) AS rk FROM s)
WHERE rk = 1
"""


def _q_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window Hampel filter (rolling exact median + MAD outlier
    flag) — sorted-array medians via JVM HOFs, one sort per series."""
    from numalogic_spark.operators.tsfeatures import hampel_filter

    return hampel_filter(_evt_series(spark, sf_dir), window=11, n_sigmas=3.0)


def _hampel_sql(window: int = 11, n_sigmas: float = 3.0) -> str:
    # `//` (int div) in DuckDB ≡ Spark's double-div + int-cast truncation;
    # a bare CAST would ROUND and pick the wrong middle element
    return f"""
WITH b AS (
  SELECT event_type AS source,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id, value,
         list_sort(list(value)
           OVER (w ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)) AS arr
  FROM events
  WINDOW w AS ({_EVT_WINDOW_SQL})
), s AS (
  SELECT source, ts_s, event_id, value, arr,
         (arr[(len(arr) + 1) // 2] + arr[(len(arr) + 2) // 2]) / 2.0 AS med
  FROM b
), s2 AS (
  SELECT source, ts_s, event_id, value, med,
         (d[(len(d) + 1) // 2] + d[(len(d) + 2) // 2]) / 2.0 AS mad
  FROM (SELECT *, list_sort(list_transform(arr, a -> abs(a - med))) AS d FROM s)
)
SELECT source, ts_s, event_id, value,
       floor(med * 1000000 + 0.5) / 1000000.0 AS med,
       floor(mad * 1000000 + 0.5) / 1000000.0 AS mad,
       abs(value - med) > {n_sigmas} * 1.4826 * mad AS is_outlier
FROM s2
"""


def _hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h-bucketed per-source value sums (decimal-exact, 6-dp output) —
    the regular-series input for STL / Holt."""
    return (
        _evt_series(spark, sf_dir)
        .groupBy(
            "source",
            ((F.col("ts_s") / F.lit(3600)).cast("long") * F.lit(3600)).alias("bucket_s"),
        )
        .agg(F.sum(F.col("value").cast("decimal(15,6)")).cast("double").alias("_v"))
        .select("source", "bucket_s", _r6(F.col("_v")).alias("val"))
    )


_HOURLY_SQL = """
  SELECT event_type AS source,
         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_s,
         floor(CAST(sum(CAST(value AS DECIMAL(15,6))) AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS val
  FROM events GROUP BY 1, 2
"""


def _q_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition (2×24 MA trend, centered phase-
    mean seasonal, remainder) on the 1h-bucketed event series."""
    from numalogic_spark.operators.tsfeatures import stl_lite

    return stl_lite(_hourly_series(spark, sf_dir), period=24, bucket_seconds=3600)


def _q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double-exponential) smoothing on the hourly series —
    sequential level/trend recursion in applyInPandas, 6-dp outputs."""
    from numalogic_spark.operators.forecast import holt_linear

    out = holt_linear(_hourly_series(spark, sf_dir), alpha=0.5, beta=0.25)
    return out.select(
        "source", "bucket_s", "val",
        _r6("level").alias("level"),
        _r6("trend").alias("trend"),
        _r6("fitted").alias("fitted"),
    )


def _holt_sql(alpha: float = 0.5, beta: float = 0.25) -> str:
    """Recursive-CTE replay of the Holt recursion: one iteration per time
    step across all series at once, the SAME pre-folded IEEE constants
    (repr() round-trip) and expression shapes as the python loop, so
    651 chained double ops land bit-identical."""
    a, oa = repr(float(alpha)), repr(1.0 - float(alpha))
    b, ob = repr(float(beta)), repr(1.0 - float(beta))
    l_new = f"{a} * i.val + {oa} * (r.l + r.b)"
    return f"""
WITH RECURSIVE hourly AS ({_HOURLY_SQL}),
ix AS (
  SELECT source, bucket_s, val,
         row_number() OVER w AS pos,
         count(*) OVER (PARTITION BY source) AS n,
         lead(val) OVER w AS nxt
  FROM hourly
  WINDOW w AS (PARTITION BY source ORDER BY bucket_s)
),
rec AS (
  SELECT source, pos, bucket_s, val,
         val AS l, nxt - val AS b, CAST(NULL AS DOUBLE) AS fitted
  FROM ix WHERE pos = 1 AND n >= 2
  UNION ALL
  SELECT i.source, i.pos, i.bucket_s, i.val,
         {l_new} AS l,
         {b} * (({l_new}) - r.l) + {ob} * r.b AS b,
         r.l + r.b AS fitted
  FROM rec r JOIN ix i ON i.source = r.source AND i.pos = r.pos + 1
)
SELECT source, bucket_s, val,
       floor(l * 1000000 + 0.5) / 1000000.0 AS level,
       floor(b * 1000000 + 0.5) / 1000000.0 AS trend,
       floor(fitted * 1000000 + 0.5) / 1000000.0 AS fitted
FROM rec
"""


def _stl_sql(period: int = 24) -> str:
    half = period // 2
    return f"""
WITH hourly AS (
  SELECT event_type AS source,
         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_s,
         floor(CAST(sum(CAST(value AS DECIMAL(15,6))) AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS val
  FROM events GROUP BY 1, 2
), t AS (
  SELECT source, bucket_s, val,
         CASE WHEN lag(vd, {half}) OVER w IS NOT NULL
                   AND lead(vd, {half}) OVER w IS NOT NULL
                   AND count(*) OVER (w ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING) = {period + 1}
              THEN CAST(sum(vd) OVER (w ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)
                        - 0.5 * lag(vd, {half}) OVER w
                        - 0.5 * lead(vd, {half}) OVER w AS DOUBLE) / {float(period)}
         END AS trend
  FROM (SELECT *, CAST(val AS DECIMAL(15,6)) AS vd FROM hourly)
  WINDOW w AS (PARTITION BY source ORDER BY bucket_s)
), det AS (
  SELECT source, bucket_s, val, trend,
         (bucket_s // 3600) % {period} AS phase,
         CAST(floor((val - trend) * 1000000 + 0.5) / 1000000.0 AS DECIMAL(15,6)) AS dd
  FROM t WHERE trend IS NOT NULL
), seas0 AS (
  SELECT source, phase,
         CAST(floor((CAST(sum(dd) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000 + 0.5)
              / 1000000.0 AS DECIMAL(15,6)) AS sr6
  FROM det GROUP BY 1, 2
), seas AS (
  SELECT s.source, s.phase,
         CAST(s.sr6 AS DOUBLE) - c.c AS seasonal
  FROM seas0 s
  JOIN (SELECT source, CAST(sum(sr6) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS c
        FROM seas0 GROUP BY 1) c USING (source)
)
SELECT d.source, d.bucket_s, d.val,
       floor(d.trend * 1000000 + 0.5) / 1000000.0 AS trend,
       floor(s.seasonal * 1000000 + 0.5) / 1000000.0 AS seasonal,
       floor((d.val - d.trend - s.seasonal) * 1000000 + 0.5) / 1000000.0 AS remainder
FROM det d JOIN seas s USING (source, phase)
"""


_PCA_K, _PCA_SAMPLE, _PCA_SEED = 4, 2000, 42


def _q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of every embedding onto components fitted on a
    deterministic portable-hash sample (driver-bounded fit, literal
    components, one JVM fold per PC — the IVF-codebook discipline)."""
    from numalogic_spark.operators.similarity import pca_project, pca_train

    embs = _embs(spark, sf_dir)
    comps, mu, _ = pca_train(
        embs, k=_PCA_K, sample_rows=_PCA_SAMPLE, seed=_PCA_SEED
    )
    out = pca_project(embs, comps, mu)
    return out.select(
        "vec_id", "label",
        *[_r6(f"pc{j}").alias(f"pc{j}") for j in range(1, _PCA_K + 1)],
    )


def _pca_sql() -> str:
    """Replays the exact fit (portable sample order + shared
    pca_fit_numpy) over the sf0.01 fixture, then projects in SQL with
    literal components — list_sum is an in-order fold, matching the
    engine's zip_with/aggregate exactly."""
    import duckdb
    import numpy as np

    from numalogic_spark.operators.dedup import MERSENNE31
    from numalogic_spark.operators.sampling import _CHAR_MULT, _SAMPLE_A, _SAMPLE_B
    from numalogic_spark.operators.similarity import pca_fit_numpy

    rel = duckdb.sql(
        "SELECT vec_id, embedding FROM '/root/testdata/sf0.01/embeddings.parquet' "
        "WHERE embedding IS NOT NULL"
    ).fetchall()

    def unit(vid: int) -> float:
        acc = _PCA_SEED % MERSENNE31
        for ch in str(vid):
            acc = (acc * _CHAR_MULT + ord(ch)) % MERSENNE31
        return ((_SAMPLE_A * acc + _SAMPLE_B) % MERSENNE31) / MERSENNE31

    ordered = sorted(rel, key=lambda r: (unit(r[0]), r[0]))[:_PCA_SAMPLE]
    x = np.asarray([list(r[1]) for r in ordered], dtype=float)
    comps, mu, _ = pca_fit_numpy(x, _PCA_K)
    d = comps.shape[1]
    cols = []
    for j, w in enumerate(comps, start=1):
        bias = 0.0
        for a, b in zip(mu, w):
            bias += a * b
        wlit = "[" + ", ".join(repr(float(v)) for v in w) + "]::DOUBLE[]"
        cols.append(
            f"floor((list_sum(list_transform(generate_series(1, {d}), "
            f"i -> v[i] * ({wlit})[i])) - {bias!r}) * 1000000 + 0.5) / 1000000.0 AS pc{j}"
        )
    col_block = ",\n       ".join(cols)
    return f"""
SELECT vec_id, label,
       {col_block}
FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
"""


def _q_series_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-series describe (count/min/quantiles/max/mean/std) via
    the value-histogram trick — distinct-value state, not row state."""
    from numalogic_spark.operators.tsfeatures import series_summary

    out = series_summary(_evt_series(spark, sf_dir))
    qcols = [c for c in out.columns if c.startswith("q")]
    return out.select(
        "source", "n", "vmin", *qcols, "vmax",
        _r6("mean").alias("mean"), _r6("std").alias("std"),
    )


def _series_summary_sql(
    quantiles=(0.25, 0.5, 0.75, 0.95, 0.99), scale: int = 100
) -> str:
    qexprs = ",\n       ".join(
        f"CAST(min(CASE WHEN cum >= CAST(ceil({float(q)!r} * CAST(n AS DOUBLE)) AS BIGINT)"
        f" THEN k END) AS DOUBLE) / {float(scale)!r} AS q{int(round(q * 100)):02d}"
        for q in quantiles
    )
    return f"""
WITH h AS (
  SELECT event_type AS source,
         CAST(floor(value * {float(scale)!r} + 0.5) AS BIGINT) AS k,
         count(*) AS c
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT source, k, c,
         sum(c) OVER (PARTITION BY source ORDER BY k
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY source) AS n
  FROM h
), m AS (
  SELECT source,
       CAST(first(n) AS BIGINT) AS n,
       CAST(min(k) AS DOUBLE) / {float(scale)!r} AS vmin,
       {qexprs},
       CAST(max(k) AS DOUBLE) / {float(scale)!r} AS vmax,
       CAST(sum(CAST(k AS DECIMAL(18,0)) * CAST(c AS DECIMAL(19,0))) AS DOUBLE) AS sk,
       CAST(sum(CAST(k * k AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DOUBLE) AS skk
  FROM cum GROUP BY 1
)
SELECT source, n, vmin, {', '.join(f"q{int(round(q * 100)):02d}" for q in quantiles)}, vmax,
       floor(((sk / CAST(n AS DOUBLE)) / {float(scale)!r}) * 1000000 + 0.5) / 1000000.0 AS mean,
       floor((CASE WHEN (skk - (sk * sk) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) > 0.0
              THEN sqrt((skk - (sk * sk) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) / {float(scale)!r}
              ELSE 0.0 END) * 1000000 + 0.5) / 1000000.0 AS std
FROM m
"""


def _q_pot_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPOT-style extreme-value threshold per series: exact histogram
    quantile u + closed-form (MoM) GPD fit over the exceedances."""
    from numalogic_spark.operators.tsfeatures import pot_threshold

    out = pot_threshold(
        _evt_series(spark, sf_dir), u_quantile=0.95, target_prob=1e-4
    )
    return out.select(
        "source", "n", "u", "n_exceed",
        _r6("xi").alias("xi"), _r6("sigma").alias("sigma"), _r6("z_q").alias("z_q"),
    )


def _pot_sql(u_quantile: float = 0.95, target_prob: float = 1e-4, scale: int = 100) -> str:
    uq, p, sc = repr(float(u_quantile)), repr(float(target_prob)), repr(float(scale))
    fit = """
  SELECT us.source, us.n, us.u,
         CAST(coalesce(mom.n_exceed, 0) AS BIGINT) AS n_exceed,
         se / CAST(mom.n_exceed AS DOUBLE) AS m,
         (see - (se * se) / CAST(mom.n_exceed AS DOUBLE)) / CAST(mom.n_exceed AS DOUBLE) AS v
  FROM us LEFT JOIN mom USING (source)
"""
    return f"""
WITH h AS (
  SELECT event_type AS source,
         CAST(floor(value * {sc} + 0.5) AS BIGINT) AS k, count(*) AS c
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT source, k, c,
         sum(c) OVER (PARTITION BY source ORDER BY k
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY source) AS n
  FROM h
), us AS (
  SELECT source, CAST(first(n) AS BIGINT) AS n,
         CAST(min(CASE WHEN cum >= CAST(ceil({uq} * CAST(n AS DOUBLE)) AS BIGINT)
                  THEN k END) AS DOUBLE) / {sc} AS u
  FROM cum GROUP BY 1
), exc AS (
  SELECT e.event_type AS source, CAST(e.value - us.u AS DECIMAL(19,6)) AS ed
  FROM events e JOIN us ON us.source = e.event_type
  WHERE e.value > us.u
), mom AS (
  SELECT source, count(*) AS n_exceed,
         CAST(sum(ed) AS DOUBLE) AS se,
         CAST(sum(ed * ed) AS DOUBLE) AS see
  FROM exc GROUP BY 1
), f AS ({fit}
), g AS (
  SELECT source, n, u, n_exceed,
         0.5 * (1.0 - (m * m) / v) AS xi,
         0.5 * m * ((m * m) / v + 1.0) AS sigma,
         ({p} * CAST(n AS DOUBLE)) / CAST(n_exceed AS DOUBLE) AS r,
         (n_exceed > 1 AND v > 0.0) AS ok, m, v
  FROM f
)
SELECT source, n, u, n_exceed,
       floor((CASE WHEN ok THEN xi END) * 1000000 + 0.5) / 1000000.0 AS xi,
       floor((CASE WHEN ok THEN sigma END) * 1000000 + 0.5) / 1000000.0 AS sigma,
       floor((CASE WHEN ok THEN
           CASE WHEN abs(xi) < 1e-09 THEN u - sigma * ln(r)
                ELSE u + (sigma / xi) * (pow(r, -xi) - 1.0) END
         END) * 1000000 + 0.5) / 1000000.0 AS z_q
FROM g
"""


def _q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend on position (slope/intercept/r²) from decimal
    raw moments — one sort + one agg."""
    from numalogic_spark.operators.tsfeatures import trend_slope

    out = trend_slope(_evt_series(spark, sf_dir))
    return out.select(
        "source", "n",
        _r6("slope").alias("slope"),
        _r6("intercept").alias("intercept"),
        _r6("r2").alias("r2"),
    )


def _trend_slope_sql() -> str:
    return f"""
WITH b AS (
  -- (19,6) not (15,6): DuckDB multiplies (15,6)x(15,6) in scaled INT64
  -- and overflows near 3e3; widening forces INT128. The VALUES are the
  -- same exact decimals Spark sums at (15,6), so the doubles agree.
  SELECT event_type AS source,
         CAST(row_number() OVER ({_EVT_WINDOW_SQL}) AS DECIMAL(19,6)) AS xd,
         CAST(value AS DECIMAL(19,6)) AS yd
  FROM events
), m AS (
  SELECT source, count(*) AS n,
         CAST(sum(xd) AS DOUBLE) AS sx,
         CAST(sum(yd) AS DOUBLE) AS sy,
         CAST(sum(xd * xd) AS DOUBLE) AS sxx,
         CAST(sum(yd * yd) AS DOUBLE) AS syy,
         CAST(sum(xd * yd) AS DOUBLE) AS sxy
  FROM b GROUP BY 1
), s AS (
  SELECT source, n,
         CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0.0
              THEN (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)
              ELSE 0.0 END AS slope,
         CAST(n AS DOUBLE) * sxy - sx * sy AS num,
         CAST(n AS DOUBLE) * sxx - sx * sx AS vx,
         CAST(n AS DOUBLE) * syy - sy * sy AS vy,
         sx, sy
  FROM m
)
SELECT source, n,
       floor(slope * 1000000 + 0.5) / 1000000.0 AS slope,
       floor(((sy - slope * sx) / CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS intercept,
       floor((CASE WHEN vx > 0.0 AND vy > 0.0 THEN (num * num) / (vx * vy) ELSE 0.0 END)
             * 1000000 + 0.5) / 1000000.0 AS r2
FROM s
"""


def _q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-robust anomaly flags: STL-lite remainder median/MAD test
    per series (the non-iterative S-H-ESD core)."""
    from numalogic_spark.operators.tsfeatures import seasonal_anomalies, stl_lite

    dec = stl_lite(_hourly_series(spark, sf_dir), period=24, bucket_seconds=3600)
    return seasonal_anomalies(dec, n_sigmas=3.0)


def _seasonal_anomalies_sql(n_sigmas: float = 3.0) -> str:
    return f"""
WITH dec AS ({_stl_sql()}),
st AS (
  SELECT source,
         (arr[(len(arr) + 1) // 2] + arr[(len(arr) + 2) // 2]) / 2.0 AS rem_med, arr
  FROM (SELECT source, list_sort(list(remainder)) AS arr FROM dec GROUP BY 1)
), st2 AS (
  SELECT source, rem_med,
         (d[(len(d) + 1) // 2] + d[(len(d) + 2) // 2]) / 2.0 AS rem_mad
  FROM (SELECT source, rem_med,
               list_sort(list_transform(arr, a -> abs(a - rem_med))) AS d
        FROM st)
)
SELECT dec.source, dec.bucket_s, dec.val, dec.trend, dec.seasonal, dec.remainder,
       floor(rem_med * 1000000 + 0.5) / 1000000.0 AS rem_med,
       floor(rem_mad * 1000000 + 0.5) / 1000000.0 AS rem_mad,
       abs(dec.remainder - rem_med) > {n_sigmas} * 1.4826 * rem_mad AS is_anomaly
FROM dec JOIN st2 USING (source)
"""


_PH_DELTA, _PH_LAMBDA = 0.0, 200.0


def _q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley drift test on the hourly series — sequential
    running-mean recursion in applyInPandas, 6-dp ph output."""
    from numalogic_spark.operators.tsfeatures import page_hinkley

    out = page_hinkley(
        _hourly_series(spark, sf_dir), delta=_PH_DELTA, lam=_PH_LAMBDA
    )
    return out.select("source", "bucket_s", "val", _r6("ph").alias("ph"), "alarm")


def _page_hinkley_sql() -> str:
    d, lam = repr(float(_PH_DELTA)), repr(float(_PH_LAMBDA))
    m_new = f"r.m + (i.val - (r.s + i.val) / CAST(i.pos AS DOUBLE) - {d})"
    return f"""
WITH RECURSIVE hourly AS ({_HOURLY_SQL}),
ix AS (
  SELECT source, bucket_s, val,
         row_number() OVER (PARTITION BY source ORDER BY bucket_s) AS pos
  FROM hourly
),
rec AS (
  SELECT source, pos, bucket_s, val,
         val AS s,
         (val - val - {d}) AS m,
         (val - val - {d}) AS mmin
  FROM ix WHERE pos = 1
  UNION ALL
  SELECT i.source, i.pos, i.bucket_s, i.val,
         r.s + i.val AS s,
         {m_new} AS m,
         least(r.mmin, {m_new}) AS mmin
  FROM rec r JOIN ix i ON i.source = r.source AND i.pos = r.pos + 1
)
SELECT source, bucket_s, val,
       floor((m - mmin) * 1000000 + 0.5) / 1000000.0 AS ph,
       (m - mmin) > {lam} AS alarm
FROM rec
"""


_KF_Q, _KF_R = 1.0, 4.0


def _q_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level Kalman filter on the hourly series — adaptive-gain
    smoothing (applyInPandas recursion, recursive-CTE oracle)."""
    from numalogic_spark.operators.forecast import kalman_level

    out = kalman_level(_hourly_series(spark, sf_dir), q=_KF_Q, r=_KF_R)
    return out.select(
        "source", "bucket_s", "val",
        _r6("level").alias("level"),
        _r6("gain").alias("gain"),
        _r6("innovation").alias("innovation"),
    )


def _kalman_sql(q: float = _KF_Q, r: float = _KF_R) -> str:
    qs, rs = repr(float(q)), repr(float(r))
    k_expr = f"(r.p + {qs}) / ((r.p + {qs}) + {rs})"
    innov = "(i.val - r.xh)"
    return f"""
WITH RECURSIVE hourly AS ({_HOURLY_SQL}),
ix AS (
  SELECT source, bucket_s, val,
         row_number() OVER (PARTITION BY source ORDER BY bucket_s) AS pos
  FROM hourly
),
rec AS (
  SELECT source, pos, bucket_s, val,
         -- CAST: a bare {rs} literal is DECIMAL(2,1) in DuckDB and the
         -- whole P recursion would run in scale-1 decimal arithmetic
         val AS xh, CAST({rs} AS DOUBLE) AS p,
         CAST(NULL AS DOUBLE) AS gain, CAST(NULL AS DOUBLE) AS innov
  FROM ix WHERE pos = 1
  UNION ALL
  SELECT i.source, i.pos, i.bucket_s, i.val,
         r.xh + {k_expr} * {innov} AS xh,
         (1.0 - {k_expr}) * (r.p + {qs}) AS p,
         {k_expr} AS gain,
         {innov} AS innov
  FROM rec r JOIN ix i ON i.source = r.source AND i.pos = r.pos + 1
)
SELECT source, bucket_s, val,
       floor(xh * 1000000 + 0.5) / 1000000.0 AS level,
       floor(gain * 1000000 + 0.5) / 1000000.0 AS gain,
       floor(innov * 1000000 + 0.5) / 1000000.0 AS innovation
FROM rec
"""


_PERIOD_LAGS = tuple(range(2, 37))


def _q_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-detected seasonality: the lag in 2..36 with the highest
    hourly-series autocorrelation (ties → smallest lag) — the
    configure-`period`-for-STL/SeasonalNaive helper."""
    from numalogic_spark.operators.tsfeatures import acf

    hourly = _hourly_series(spark, sf_dir)
    scored = acf(
        hourly, value_col="val", source_col="source",
        order_cols=("bucket_s",), lags=_PERIOD_LAGS,
    )
    pick = Window.partitionBy("source").orderBy(
        F.desc("acf_value"), F.asc("lag")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select(
            "source",
            F.col("lag").alias("period"),
            "n_used",
            _r6("acf_value").alias("acf_value"),
        )
    )


def _dominant_period_sql() -> str:
    lag_cols = ",\n         ".join(
        f"lag(CAST(val AS DECIMAL(19,6)), {k}) OVER w AS l{k}" for k in _PERIOD_LAGS
    )
    mom_cols = ",\n         ".join(
        f"count(l{k}) AS nk{k},\n"
        f"         CAST(sum(xd * l{k}) AS DOUBLE) AS sxl{k},\n"
        f"         CAST(sum(CASE WHEN l{k} IS NOT NULL THEN xd END) AS DOUBLE) AS sxk{k},\n"
        f"         CAST(sum(l{k}) AS DOUBLE) AS slk{k}"
        for k in _PERIOD_LAGS
    )
    mu = "(sx / CAST(n AS DOUBLE))"
    den = "(sxx - (sx * sx) / CAST(n AS DOUBLE))"
    arms = "\nUNION ALL\n".join(
        f"SELECT source, {k} AS lag, nk{k} AS n_used,\n"
        f"       CASE WHEN {den} > 0.0 AND nk{k} > 0 THEN\n"
        f"         (sxl{k} - {mu} * (sxk{k} + slk{k}) + CAST(nk{k} AS DOUBLE) * {mu} * {mu}) / {den}\n"
        f"         ELSE 0.0 END AS acf_value\n"
        f"FROM m"
        for k in _PERIOD_LAGS
    )
    return f"""
WITH hourly AS ({_HOURLY_SQL}),
b AS (
  SELECT source,
         CAST(val AS DECIMAL(19,6)) AS xd,
         {lag_cols}
  FROM hourly
  WINDOW w AS (PARTITION BY source ORDER BY bucket_s)
), m AS (
  SELECT source,
         count(*) AS n,
         CAST(sum(xd) AS DOUBLE) AS sx,
         CAST(sum(xd * xd) AS DOUBLE) AS sxx,
         {mom_cols}
  FROM b GROUP BY 1
), scored AS (
{arms}
)
SELECT source, lag AS period, n_used,
       floor(acf_value * 1000000 + 0.5) / 1000000.0 AS acf_value
FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY acf_value DESC, lag ASC) AS rk
      FROM scored)
WHERE rk = 1
"""


_PSI_BINS = 10


def _q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between the first and second time halves of each hourly
    series — quantile bins from the first half, Laplace-smoothed
    shares, sorted-fold sum."""
    from numalogic_spark.operators.tsfeatures import psi_drift

    out = psi_drift(_hourly_series(spark, sf_dir), n_bins=_PSI_BINS)
    return out.select("source", "n_first", "n_second", _r6("psi").alias("psi"))


def _psi_sql(n_bins: int = _PSI_BINS, scale: int = 100) -> str:
    sc = repr(float(scale))
    edge_sel = ",\n         ".join(
        f"CAST(min(CASE WHEN cum >= CAST(ceil({j / n_bins!r} * CAST(n1 AS DOUBLE)) AS BIGINT)"
        f" THEN k END) AS DOUBLE) / {sc} AS e{j}"
        for j in range(1, n_bins)
    )
    bin_expr = " + ".join(
        f"(CASE WHEN v > e{j} THEN 1 ELSE 0 END)" for j in range(1, n_bins)
    )
    lap = repr(float(n_bins) / 2.0)
    return f"""
WITH hourly AS ({_HOURLY_SQL}),
ix AS (
  SELECT source, val AS v,
         row_number() OVER (PARTITION BY source ORDER BY bucket_s) AS pos,
         count(*) OVER (PARTITION BY source) AS n
  FROM hourly
), base AS (
  SELECT source, v, CASE WHEN pos <= n // 2 THEN 1 ELSE 2 END AS half FROM ix
), h1 AS (
  SELECT source, CAST(floor(v * {sc} + 0.5) AS BIGINT) AS k, count(*) AS c
  FROM base WHERE half = 1 GROUP BY 1, 2
), cum AS (
  SELECT source, k,
         sum(c) OVER (PARTITION BY source ORDER BY k
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY source) AS n1
  FROM h1
), edges AS (
  SELECT source,
         {edge_sel}
  FROM cum GROUP BY 1
), binned AS (
  SELECT b.source, b.half, ({bin_expr}) AS bin
  FROM base b JOIN edges USING (source)
), counts AS (
  SELECT source, half, bin, count(*) AS c FROM binned GROUP BY 1, 2, 3
), halves AS (
  SELECT source, half, count(*) AS hn FROM base GROUP BY 1, 2
), grid AS (
  SELECT h.source, h.half, g.b, h.hn,
         CAST(coalesce(c.c, 0) AS BIGINT) AS c
  FROM halves h
  CROSS JOIN (SELECT unnest(generate_series(0, {n_bins - 1})) AS b) g
  LEFT JOIN counts c ON c.source = h.source AND c.half = h.half AND c.bin = g.b
), pq AS (
  SELECT source, half, b, hn,
         (CAST(c AS DOUBLE) + 0.5) / (CAST(hn AS DOUBLE) + {lap}) AS sh
  FROM grid
), terms AS (
  SELECT p.source,
         CAST(p.hn AS BIGINT) AS n_first, CAST(q.hn AS BIGINT) AS n_second,
         (q.sh - p.sh) * ln(q.sh / p.sh) AS t
  FROM (SELECT * FROM pq WHERE half = 1) p
  JOIN (SELECT * FROM pq WHERE half = 2) q USING (source, b)
)
SELECT source, n_first, n_second,
       floor(list_sum(list_sort(list(t))) * 1000000 + 0.5) / 1000000.0 AS psi
FROM terms GROUP BY 1, 2, 3
"""


_CCF_LAGS = (-3, -2, -1, 0, 1, 2, 3)


def _q_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag cross-correlation for every source pair on the hourly
    grid — shift-join (no per-series sort), one join for all lags."""
    from numalogic_spark.operators.tsfeatures import ccf_pairs

    out = ccf_pairs(_hourly_series(spark, sf_dir), lags=_CCF_LAGS)
    return out.select("src_a", "src_b", "lag", "n", _r6("ccf").alias("ccf"))


def _ccf_sql() -> str:
    lag_list = ", ".join(str(k) for k in _CCF_LAGS)
    return f"""
WITH hourly AS ({_HOURLY_SQL}),
a AS (
  SELECT source AS src_a, bucket_s, CAST(val AS DECIMAL(19,6)) AS xd FROM hourly
), b AS (
  SELECT source AS src_b, t.k AS lag,
         bucket_s + CAST(t.k AS BIGINT) * 3600 AS bucket_s,
         CAST(val AS DECIMAL(19,6)) AS yd
  FROM hourly, unnest([{lag_list}]) AS t(k)
), m AS (
  SELECT src_a, src_b, lag, count(*) AS n,
         CAST(sum(xd) AS DOUBLE) AS sx,
         CAST(sum(yd) AS DOUBLE) AS sy,
         CAST(sum(xd * xd) AS DOUBLE) AS sxx,
         CAST(sum(yd * yd) AS DOUBLE) AS syy,
         CAST(sum(xd * yd) AS DOUBLE) AS sxy
  FROM a JOIN b USING (bucket_s)
  WHERE src_a < src_b
  GROUP BY 1, 2, 3
)
SELECT src_a, src_b, lag, n,
       floor((CASE WHEN CAST(n AS DOUBLE) > 1.0
                        AND (CAST(n AS DOUBLE) * sxx - sx * sx) > 0.0
                        AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0.0
              THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                   / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))
              END) * 1000000 + 0.5) / 1000000.0 AS ccf
FROM m
"""


def _q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24h Pearson correlation for every source pair on the
    hourly grid — the co-movement diagnostic (decimal window moments,
    parallelism = pairs)."""
    from numalogic_spark.operators.tsfeatures import (
        aligned_pair_series, rolling_corr)

    h = _hourly_series(spark, sf_dir)
    # all-pairs default is the oracle's shape (5 sources); production
    # callers bound the grid with pairs= / top_k_by_variance=
    pairs = aligned_pair_series(h)
    out = rolling_corr(
        pairs, "x", "y", key_cols=("src_a", "src_b"), order_col="bucket_s", window=24
    )
    return out.select(
        "src_a", "src_b", "bucket_s", "x", "y", _r6("corr").alias("corr")
    )


def _rolling_corr_sql(window: int = 24) -> str:
    return f"""
WITH hourly AS ({_HOURLY_SQL}),
p AS (
  SELECT a.source AS src_a, b.source AS src_b, a.bucket_s,
         a.val AS x, b.val AS y,
         CAST(a.val AS DECIMAL(19,6)) AS xd, CAST(b.val AS DECIMAL(19,6)) AS yd
  FROM hourly a JOIN hourly b USING (bucket_s)
  WHERE a.source < b.source
), m AS (
  SELECT src_a, src_b, bucket_s, x, y,
         CAST(count(*) OVER w AS DOUBLE) AS n,
         CAST(sum(xd) OVER w AS DOUBLE) AS sx,
         CAST(sum(yd) OVER w AS DOUBLE) AS sy,
         CAST(sum(xd * xd) OVER w AS DOUBLE) AS sxx,
         CAST(sum(yd * yd) OVER w AS DOUBLE) AS syy,
         CAST(sum(xd * yd) OVER w AS DOUBLE) AS sxy
  FROM p
  WINDOW w AS (PARTITION BY src_a, src_b ORDER BY bucket_s
               ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
)
SELECT src_a, src_b, bucket_s, x, y,
       floor((CASE WHEN n > 1.0 AND (n * sxx - sx * sx) > 0.0 AND (n * syy - sy * sy) > 0.0
              THEN (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
              END) * 1000000 + 0.5) / 1000000.0 AS corr
FROM m
"""


def _q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style PII redaction (email/IPv4/phone, typed placeholders, per-
    category counts); the scrubbed text itself is hash-gated."""
    from numalogic_spark.operators.textstats import scrub_pii

    return scrub_pii(_docs(spark, sf_dir))


def _scrub_pii_sql() -> str:
    """DuckDB replay: identical conservative patterns (RE2 ≡ Java on
    char-classes + bounded quantifiers), same sequencing — each category
    counted on the text as scrubbed by the PREVIOUS categories."""
    from numalogic_spark.operators.textstats import PII_PATTERNS

    cur = "text"
    count_cols = []
    for name, pat, repl in PII_PATTERNS:
        count_cols.append(f"len(regexp_extract_all({cur}, '{pat}')) AS n_{name}")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return f"""
SELECT doc_id,
       {', '.join(count_cols)},
       {cur} AS scrubbed
FROM documents
"""


_BOILER_SQL = r"""
WITH ex AS (
  SELECT d.doc_id AS id, t.i - 1 AS pos, d.ls[t.i] AS line, trim(d.ls[t.i]) AS tline
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents) d,
       unnest(generate_series(1, len(d.ls))) AS t(i)
), boiler AS (
  SELECT tline FROM (
    SELECT tline, count(*) AS n_docs
    FROM (SELECT DISTINCT id, tline FROM ex WHERE length(tline) >= 5)
    GROUP BY 1
  ) WHERE n_docs >= 3
), marked AS (
  SELECT ex.id, ex.pos, ex.line,
         EXISTS (SELECT 1 FROM boiler b WHERE b.tline = ex.tline) AS is_b
  FROM ex
)
SELECT id AS doc_id,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN NOT is_b THEN line END, chr(10) ORDER BY pos), '') AS cleaned
FROM marked
GROUP BY id
"""


def _q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-line (boilerplate) removal: lines in ≥3 distinct
    docs are dropped from every doc (trimmed match, short lines exempt);
    the reconstructed text is hash-gated line for line."""
    from numalogic_spark.operators.textstats import remove_boilerplate_lines

    return remove_boilerplate_lines(_docs(spark, sf_dir), min_docs=3).select(
        F.col("id").alias("doc_id"), "n_lines", "n_kept", "cleaned"
    )


def _q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum data order: per SOURCE (the scale-safe
    partitioned form), docs tier into quartiles of the 6dp-rounded quality
    score (clean docs in tier 1) with a reproducible portable-hash shuffle
    inside each tier."""
    from numalogic_spark.operators.sampling import curriculum_order
    from numalogic_spark.operators.textstats import text_stats

    docs = _docs(spark, sf_dir)
    scores = text_stats(docs, "text", "doc_id").select(
        "doc_id", _r6(F.col("quality_score")).alias("q6")
    )
    scored = docs.select("doc_id", "source").join(scores, "doc_id")
    out = curriculum_order(scored, "q6", n_tiers=4, partition_cols=["source"])
    return out.select("doc_id", "source", "q6", "tier", "ord")


_CURRICULUM_SQL = r"""
WITH s AS (
  SELECT doc_id, source,
    length(text) AS n_chars,
    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS n_words,
    len(list_filter(list_distinct(string_split_regex(lower(text), '\s+')), x -> x <> '')) AS n_distinct_words,
    length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
  FROM documents
), q AS (
  SELECT doc_id, source,
    floor((least(n_words / 100.0, 1.0) * 0.4
         + least(n_distinct_words * 1.0 / n_words, 1.0) * 0.4
         + (1.0 - least(n_punct * 1.0 / greatest(n_chars, 1), 1.0)) * 0.2) * 1000000 + 0.5) / 1000000.0 AS q6
  FROM s
), h AS (
  SELECT doc_id, source, q6,
         (1103515245 * (list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(generate_series(1, greatest(length(CAST(doc_id AS VARCHAR)), 1)),
              i -> CAST(ascii(CAST(doc_id AS VARCHAR)[i]) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647)) + 12345) % 2147483647 AS oh,
         ntile(4) OVER (PARTITION BY source ORDER BY q6 DESC, doc_id) AS tier
  FROM q
)
SELECT doc_id, source, q6, CAST(tier AS INTEGER) AS tier,
       CAST(row_number() OVER (PARTITION BY source, tier ORDER BY oh, doc_id) - 1 AS INTEGER) AS ord
FROM h
"""


def _q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split greedy packing of documents' word-token counts into
    512-token packs (docs whole; sequential per-source fill — the packing
    variant for training setups where sequences must not straddle doc
    boundaries)."""
    from numalogic_spark.operators.tokens import pack_greedy_no_split

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.array_remove(F.split(F.lower("text"), r"\s+"), "")).alias("n_tok"),
    )
    return pack_greedy_no_split(docs, 512)


_PACK_GREEDY_SQL = r"""
WITH RECURSIVE d AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) AS BIGINT) AS n_tok,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i
  FROM (SELECT source, doc_id, text FROM documents)
  WHERE len(list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')) > 0
), rec(source, i, pack_id, doc_id, pack_offset, n_tok, off_next) AS (
  SELECT source, i, CAST(0 AS BIGINT), doc_id, CAST(0 AS BIGINT), n_tok, n_tok
  FROM d WHERE i = 1
  UNION ALL
  -- current fill off_next is always > 0 (every doc has n_tok > 0), so the
  -- engine's `off > 0 AND off + n > cap` reduces to the overflow test
  SELECT d.source, d.i,
         CASE WHEN r.off_next + d.n_tok > 512 THEN r.pack_id + 1 ELSE r.pack_id END,
         d.doc_id,
         CASE WHEN r.off_next + d.n_tok > 512 THEN CAST(0 AS BIGINT) ELSE r.off_next END,
         d.n_tok,
         CASE WHEN r.off_next + d.n_tok > 512 THEN d.n_tok ELSE r.off_next + d.n_tok END
  FROM rec r JOIN d ON d.source = r.source AND d.i = r.i + 1
)
SELECT source, pack_id, doc_id, pack_offset, n_tok FROM rec
"""


_NB_VOCAB = 5000


def _q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable domain classifier (multinomial Naive Bayes, closed-form):
    fit on the EVEN-doc_id half with label = lang, score the odd half.
    All log-probabilities are 6dp-quantized at train time and summed as
    decimals, so the joint scores are engine-exact (operators/classify.py)."""
    from numalogic_spark.operators.classify import nb_score, nb_train

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    priors, lik = nb_train(train, label_col="lang", max_vocab=_NB_VOCAB)
    return nb_score(test, priors, lik).select("doc_id", "pred", "score")


def _nb_classify_sql() -> str:
    """DuckDB replay of train AND score: same vocabulary cap + tie-break,
    same add-1 smoothing, same 6dp quantization before decimal sums."""
    v = _NB_VOCAB
    return rf"""
WITH tr AS (
  SELECT lang AS label,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ws
  FROM documents WHERE doc_id % 2 = 0
), tok AS (
  SELECT label, t.w AS word FROM tr, unnest(tr.ws) AS t(w)
), vocab AS (
  SELECT word FROM (SELECT word, count(*) AS cnt FROM tok GROUP BY 1)
  ORDER BY cnt DESC, word LIMIT {v}
), iv AS (
  SELECT tok.label, tok.word FROM tok JOIN vocab USING (word)
), wl AS (
  SELECT word, label, count(*) AS c FROM iv GROUP BY 1, 2
), tot AS (
  SELECT label, count(*) AS t FROM iv GROUP BY 1
), vs AS (SELECT count(*) AS vv FROM vocab),
nd AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0),
labcnt AS (
  SELECT lang AS label, count(*) AS nl FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
), pri AS (
  SELECT lc.label,
         floor(ln(lc.nl / CAST((SELECT n FROM nd) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS log_prior,
         floor(ln(1.0 / (coalesce(tot.t, 0) + 1.0 * ((SELECT vv FROM vs) + 1))) * 1000000 + 0.5) / 1000000.0 AS log_unk
  FROM labcnt lc LEFT JOIN tot ON tot.label = lc.label
), lik AS (
  SELECT vocab.word, tot.label,
         floor(ln((coalesce(wl.c, 0) + 1.0) / (tot.t + 1.0 * ((SELECT vv FROM vs) + 1))) * 1000000 + 0.5) / 1000000.0 AS log_p
  FROM vocab CROSS JOIN tot
  LEFT JOIN wl ON wl.word = vocab.word AND wl.label = tot.label
), te AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ws
  FROM documents WHERE doc_id % 2 = 1
), ttok AS (
  SELECT doc_id, t.w AS word FROM te, unnest(te.ws) AS t(w)
), pl AS (
  SELECT ttok.doc_id, p.label,
         CAST(coalesce(lik.log_p, p.log_unk) AS DECIMAL(28,6)) AS lp
  FROM ttok CROSS JOIN pri p
  LEFT JOIN lik ON lik.word = ttok.word AND lik.label = p.label
), sums AS (
  SELECT doc_id, label, sum(lp) AS wsum FROM pl GROUP BY 1, 2
), sc AS (
  SELECT te.doc_id, p.label,
         CAST(p.log_prior AS DECIMAL(28,6)) + coalesce(s.wsum, CAST(0 AS DECIMAL(28,6))) AS score
  FROM te CROSS JOIN pri p
  LEFT JOIN sums s ON s.doc_id = te.doc_id AND s.label = p.label
), ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
  FROM sc
)
SELECT doc_id, label AS pred, CAST(score AS DOUBLE) AS score
FROM ranked WHERE rn = 1
"""


def _q_sklearn_scalers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four sklearn PreprocessFactory scalers (Standard/MinMax/MaxAbs/
    Robust, reference config/factory.py:45,59-63) fit per series and
    applied through the engine's affine-scaler machinery: four model-sized
    fitted frames, broadcast-joined back, one projection each. Standard
    uses decimal-sum moments (order-independent exactness); MinMax/MaxAbs
    stats are exact extrema; Robust uses exact linear-interp percentiles."""
    from numalogic_spark.functions.scalers import (
        fit_maxabs_scaler,
        fit_minmax_scaler,
        fit_robust_scaler,
        fit_standard_scaler,
        transform_affine_scaler,
    )

    df = _events(spark, sf_dir).select("event_id", "event_type", "value")
    by = ["event_type"]
    out = df
    for fit, kw, sfx in (
        (fit_standard_scaler, {"decimal_stats": True}, "__std"),
        (fit_minmax_scaler, {}, "__mm"),
        (fit_maxabs_scaler, {}, "__ma"),
        (fit_robust_scaler, {}, "__rb"),
    ):
        stats = fit(df, ["value"], by=by, **kw)
        out = transform_affine_scaler(out, stats, ["value"], by=by, suffix=sfx)
    return out.select(
        "event_id",
        _r6("value__std").alias("std_scaled"),
        _r6("value__mm").alias("minmax_scaled"),
        _r6("value__ma").alias("maxabs_scaled"),
        _r6("value__rb").alias("robust_scaled"),
    )


_SKLEARN_SCALERS_SQL = """
WITH s AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value) AS mu,
         sqrt(greatest(CAST(sum(CAST(value AS DECIMAL(20,4)) * CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value)
              - (CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value))
                * (CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) / count(value)), 0.0)) AS sigma,
         min(value) AS mn, max(value) AS mx,
         max(abs(value)) AS mab,
         quantile_cont(value, 0.5) AS med,
         quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
  FROM events GROUP BY event_type
)
SELECT e.event_id,
  floor(((e.value - s.mu) / (CASE WHEN s.sigma = 0.0 THEN 1.0 ELSE s.sigma END) + 0.0) * 1000000 + 0.5) / 1000000.0 AS std_scaled,
  floor(((e.value - s.mn) / ((CASE WHEN s.mx - s.mn = 0.0 THEN 1.0 ELSE s.mx - s.mn END) / 1.0) + 0.0) * 1000000 + 0.5) / 1000000.0 AS minmax_scaled,
  floor(((e.value - 0.0) / (CASE WHEN s.mab = 0.0 THEN 1.0 ELSE s.mab END) + 0.0) * 1000000 + 0.5) / 1000000.0 AS maxabs_scaled,
  floor(((e.value - s.med) / (CASE WHEN s.iqr = 0.0 THEN 1.0 ELSE s.iqr END) + 0.0) * 1000000 + 0.5) / 1000000.0 AS robust_scaled
FROM events e JOIN s ON e.event_type = s.event_type
"""


def _q_robust_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RobustMahalanobisThreshold (ThresholdFactory, reference
    _mahalanobis.py:188-230) per series over the same integer-quantized
    2-feature matrix as mahalanobis_events: deterministic-MCD fit in one
    applyInPandas task per series, relational d²-term scoring. The oracle
    replays the identical numpy fit (shared robust_mahalanobis_fit_np)
    and embeds the fitted location/precision/threshold as SQL literals —
    the IVF-codebook discipline."""
    from numalogic_spark.functions.robust import (
        fit_robust_mahalanobis,
        score_robust_mahalanobis,
    )

    df = _events(spark, sf_dir).select(
        F.col("event_type").alias("source"),
        "event_id",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).alias("f0"),
    ).withColumn("f1", F.col("f0") % F.lit(1000))
    stats = fit_robust_mahalanobis(
        df, ["f0", "f1"], by=["source"], order_by=["event_id"], seed=42
    )
    out = score_robust_mahalanobis(df, stats, ["f0", "f1"], by=["source"])
    return out.select(
        "source", "event_id",
        _r6("md").alias("md"), _r6("md_score").alias("md_score"), "md_pred",
    )


def _robust_mahalanobis_sql() -> str:
    """Replay the deterministic MCD fit per event_type on the driver's
    oracle-scale data (sf0.01, like _ivf_sql) with the SAME numpy function
    the Spark kernel runs, then score in SQL with the fitted stats as
    literals — the i-major term order matches score_robust_mahalanobis
    exactly, so the doubles are bit-identical."""
    import duckdb as _dd
    import numpy as _np

    from numalogic_spark.functions.robust import robust_mahalanobis_fit_np

    rows = _dd.sql(
        "SELECT event_type, event_id, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS f0 "
        "FROM '/root/testdata/sf0.01/events.parquet' ORDER BY event_type, event_id"
    ).fetchall()
    groups: dict[str, list[tuple[int, int]]] = {}
    for et, _eid, f0 in rows:
        groups.setdefault(et, []).append((f0, f0 % 1000))
    cases = {"loc0": [], "loc1": [], "p": [[] for _ in range(4)], "thr": []}
    keys = sorted(groups)
    for et in keys:
        x = _np.array(groups[et], dtype=_np.float64)
        loc, prec, thr = robust_mahalanobis_fit_np(x, seed=42)
        cases["loc0"].append((et, repr(float(loc[0]))))
        cases["loc1"].append((et, repr(float(loc[1]))))
        for i in range(4):
            cases["p"][i].append((et, repr(float(prec.reshape(-1)[i]))))
        cases["thr"].append((et, repr(float(thr))))

    def case(pairs: list) -> str:
        whens = " ".join(f"WHEN source = '{et}' THEN {v}" for et, v in pairs)
        return f"(CASE {whens} END)"

    loc0, loc1 = case(cases["loc0"]), case(cases["loc1"])
    p00, p01, p10, p11 = (case(cases["p"][i]) for i in range(4))
    thr = case(cases["thr"])
    dc0 = f"(CAST(f0 AS DOUBLE) - {loc0})"
    dc1 = f"(CAST(f1 AS DOUBLE) - {loc1})"
    md2 = (
        f"{p00} * {dc0} * {dc0} + {p01} * {dc0} * {dc1} "
        f"+ {p10} * {dc1} * {dc0} + {p11} * {dc1} * {dc1}"
    )
    return f"""
WITH f AS (
  SELECT event_type AS source, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS f0
  FROM events
), f2 AS (
  SELECT source, event_id, f0, f0 % 1000 AS f1 FROM f
), md AS (
  SELECT source, event_id, sqrt(greatest({md2}, 0.0)) AS md, {thr} AS thr
  FROM f2
)
SELECT source, event_id,
       floor(md * 1000000 + 0.5) / 1000000.0 AS md,
       floor((md / greatest(thr, 1e-12)) * 1000000 + 0.5) / 1000000.0 AS md_score,
       CAST(CASE WHEN md >= thr THEN 1 ELSE 0 END AS BIGINT) AS md_pred
FROM md
"""


def _seasonal_naive_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h decimal-mean buckets per series with 6dp-floored values (the
    pre-rounding keeps downstream decimal casts tie-free cross-engine),
    then the time-shifted seasonal-naive forecast (t - 24h equi-join)."""
    from numalogic_spark.operators.forecast import seasonal_naive

    df = _events(spark, sf_dir)
    b = df.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
    ).agg(
        _r6(
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("val_mean")
    )
    return seasonal_naive(b, 86400, value_col="val_mean")


def _q_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast (daily period over hourly buckets): the
    Spark-native form of SeasonalNaiveForecaster (reference
    models/forecast/variants/naive.py:69-135) — forecast(t) = value(t-24h)
    via an equi-join on the shifted bucket (no per-series sort; gaps yield
    NULL forecasts instead of lagging across them)."""
    out = _seasonal_naive_base(spark, sf_dir)
    return out.select(
        "source",
        F.unix_timestamp("bucket_ts").alias("bucket_s"),
        F.col("val_mean").alias("actual"),
        _r6("forecast").alias("forecast"),
        _r6("abs_err").alias("abs_err"),
    )


_SEASONAL_NAIVE_BASE_SQL = """
  SELECT event_type AS source, date_trunc('hour', ts) AS bucket,
         floor((CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000.0 AS val_mean
  FROM events GROUP BY 1, 2
"""

_SEASONAL_NAIVE_SQL = f"""
WITH b AS ({_SEASONAL_NAIVE_BASE_SQL})
SELECT a.source, CAST(epoch(a.bucket) AS BIGINT) AS bucket_s,
       a.val_mean AS actual,
       floor(p.val_mean * 1000000 + 0.5) / 1000000.0 AS forecast,
       floor(abs(a.val_mean - p.val_mean) * 1000000 + 0.5) / 1000000.0 AS abs_err
FROM b a LEFT JOIN b p
  ON p.source = a.source AND p.bucket + INTERVAL 1 DAY = a.bucket
"""


def _q_forecast_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series forecast quality (MAE/RMSE/R²) of the seasonal-naive
    forecast, as ONE decimal-sum aggregation (operators/forecast.py
    forecast_metrics)."""
    from numalogic_spark.operators.forecast import forecast_metrics

    scored = _seasonal_naive_base(spark, sf_dir)
    m = forecast_metrics(scored, value_col="val_mean")
    return m.select(
        "source", "n", _r6("mae").alias("mae"), _r6("rmse").alias("rmse"),
        _r6("r2").alias("r2"),
    )


_FORECAST_METRICS_SQL = f"""
WITH b AS ({_SEASONAL_NAIVE_BASE_SQL}),
j AS (
  SELECT a.source, CAST(a.val_mean AS DECIMAL(15,6)) AS y,
         CAST(p.val_mean AS DECIMAL(15,6)) AS f
  FROM b a JOIN b p
    ON p.source = a.source AND p.bucket + INTERVAL 1 DAY = a.bucket
), agg AS (
  SELECT source, count(*) AS n,
         CAST(sum(abs(y - f)) AS DOUBLE) AS sae,
         CAST(sum((y - f) * (y - f)) AS DOUBLE) AS sse,
         CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(y * y) AS DOUBLE) AS syy
  FROM j GROUP BY source
)
SELECT source, n,
  floor((sae / CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS mae,
  floor(sqrt(sse / CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS rmse,
  floor((CASE WHEN syy - (sy * sy) / CAST(n AS DOUBLE) <= 0.0 THEN 0.0
              ELSE 1.0 - sse / (syy - (sy * sy) / CAST(n AS DOUBLE)) END) * 1000000 + 0.5) / 1000000.0 AS r2
FROM agg
"""


def _q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style counter semantics: a wrapped cumulative counter is
    synthesized per series (cumsum of value mod 10000 — deterministic in
    both engines), then increase / rate / resets are computed with
    counter-RESET correction (operators/promql.py)."""
    from numalogic_spark.operators.promql import counter_rate

    base = _evt_series(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("ts_s", "event_id")
    ctr = base.withColumn(
        "counter",
        (F.sum(F.col("value").cast("decimal(15,6)")).over(w) % F.lit(10000)).cast(
            "decimal(15,6)"
        ),
    )
    out = counter_rate(ctr, bucket_s=3600, value_col="counter")
    return out.select(
        "source",
        "bucket_s",
        "n_samples",
        _r6("increase").alias("increase"),
        "rate_per_s",
        "resets",
    )


_COUNTER_RATE_SQL = f"""
WITH b AS (
  SELECT event_type AS source,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id,
         CAST(value AS DECIMAL(15,6)) AS vd
  FROM events
), c AS (
  SELECT source, ts_s, event_id,
         CAST(sum(vd) OVER w % 10000 AS DECIMAL(15,6)) AS counter
  FROM b WINDOW w AS (PARTITION BY source ORDER BY ts_s, event_id)
), d AS (
  SELECT source, ts_s, counter, lag(counter) OVER w AS prev
  FROM c WINDOW w AS (PARTITION BY source ORDER BY ts_s, event_id)
), e AS (
  SELECT source, ts_s,
         CASE WHEN prev IS NULL THEN NULL
              WHEN counter - prev >= 0 THEN CAST(counter - prev AS DECIMAL(16,6))
              ELSE CAST(counter AS DECIMAL(16,6)) END AS adjusted,
         CASE WHEN prev IS NOT NULL AND counter - prev < 0 THEN 1 ELSE 0 END AS is_reset
  FROM d
)
SELECT source,
       ts_s - ts_s % 3600 AS bucket_s,
       count(*) AS n_samples,
       floor(CAST(coalesce(sum(adjusted), 0) AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS increase,
       floor(CAST(coalesce(sum(adjusted), 0) AS DOUBLE) / 3600.0 * 1000000 + 0.5) / 1000000.0 AS rate_per_s,
       CAST(sum(is_reset) AS BIGINT) AS resets
FROM e GROUP BY 1, 2
"""


def _q_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visual downsample (Jugel et al. VLDB'14): first/last/min/max
    points per (series, hour pixel) in one struct-extreme aggregation."""
    from numalogic_spark.operators.promql import m4_downsample

    return m4_downsample(_evt_series(spark, sf_dir), bucket_s=3600)


_M4_SQL = """
WITH b AS (
  SELECT event_type AS source,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id, value
  FROM events
)
SELECT source,
       ts_s - ts_s % 3600 AS bucket_s,
       count(*) AS n,
       (min({'t': ts_s, 'i': event_id, 'v': value})).t AS t_first,
       (min({'t': ts_s, 'i': event_id, 'v': value})).v AS v_first,
       (max({'t': ts_s, 'i': event_id, 'v': value})).t AS t_last,
       (max({'t': ts_s, 'i': event_id, 'v': value})).v AS v_last,
       (min({'v': value, 't': ts_s, 'i': event_id})).t AS t_min,
       (min({'v': value, 't': ts_s, 'i': event_id})).v AS v_min,
       (max({'v': value, 't': ts_s, 'i': event_id})).t AS t_max,
       (max({'v': value, 't': ts_s, 'i': event_id})).v AS v_max
FROM b GROUP BY 1, 2
"""

_RETENTION_POLICY = {"1m": 3 * 86400, "1h": 10 * 86400, "1d": None}


def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-ladder audit over the fused tier cascade: per tier the
    kept/expired split against its horizon, clocked off the data
    watermark (operators/retention.py)."""
    from numalogic_spark.operators.retention import retention_summary
    from numalogic_spark.operators.rollup import histogram, rollup_tiers_fused

    fused = rollup_tiers_fused(
        histogram(_events(spark, sf_dir), EVENTS_CFG, "minute"), EVENTS_CFG
    )
    return retention_summary(fused, _RETENTION_POLICY)


def _retention_sql() -> str:
    keep = (
        "CASE tier WHEN '1m' THEN now_s - bucket_s < 259200 "
        "WHEN '1h' THEN now_s - bucket_s < 864000 ELSE TRUE END"
    )
    return f"""
WITH t AS ({_rollup_fused_sql()}),
mx AS (SELECT max(bucket_s) AS now_s FROM t)
SELECT tier,
       CAST(CASE tier WHEN '1m' THEN 259200 WHEN '1h' THEN 864000 END AS BIGINT) AS horizon_s,
       CAST(sum(CASE WHEN {keep} THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(sum(CASE WHEN {keep} THEN 0 ELSE 1 END) AS BIGINT) AS expired,
       min(CASE WHEN {keep} THEN bucket_s END) AS min_kept_s,
       max(CASE WHEN {keep} THEN bucket_s END) AS max_kept_s
FROM t, mx GROUP BY tier
"""


def _q_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization: per-series PAA(16) z-normalized to a 4-letter
    Gaussian-breakpoint alphabet (operators/tsfeatures.py)."""
    from numalogic_spark.operators.tsfeatures import sax_symbols

    return sax_symbols(_evt_series(spark, sf_dir), segment=16, alphabet=4)


_SAX_SQL = """
WITH b AS (
  SELECT event_type AS source, CAST(value AS DECIMAL(15,6)) AS vd,
         CAST((row_number() OVER (PARTITION BY event_type
               ORDER BY floor(epoch(ts)), event_id) - 1) // 16 AS BIGINT) AS segment
  FROM events
), paa AS (
  SELECT source, segment, count(*) AS n_in_segment,
         CAST(sum(vd) AS DOUBLE) / count(*) AS praw
  FROM b GROUP BY 1, 2
), mom AS (
  SELECT source, count(*) AS n, CAST(sum(vd) AS DOUBLE) AS sx,
         CAST(sum(CAST(vd * vd AS DECIMAL(31,12))) AS DOUBLE) AS sxx
  FROM b GROUP BY 1
), z AS (
  SELECT p.source, p.segment, p.n_in_segment, p.praw,
         floor((CASE WHEN sxx / n - (sx / n) * (sx / n) > 0
                THEN (praw - sx / n) / sqrt(sxx / n - (sx / n) * (sx / n))
                ELSE 0.0 END) * 1000000 + 0.5) / 1000000.0 AS zz
  FROM paa p JOIN mom m ON p.source = m.source
)
SELECT source, segment, n_in_segment,
       floor(praw * 1000000 + 0.5) / 1000000.0 AS paa,
       zz AS z,
       substr('abcd', 1 + (CASE WHEN zz >= -0.674490 THEN 1 ELSE 0 END
                         + CASE WHEN zz >= 0.0 THEN 1 ELSE 0 END
                         + CASE WHEN zz >= 0.674490 THEN 1 ELSE 0 END), 1) AS symbol
FROM z
"""


def _q_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicate word-8-gram coverage per document (Lee et al.
    exact-substring dedup signal; operators/dedup.py)."""
    from numalogic_spark.operators.dedup import duplicate_ngram_spans

    return duplicate_ngram_spans(_docs(spark, sf_dir), n=8, min_docs=2)


_DUP_NGRAM_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
  FROM documents
), g AS (
  SELECT doc_id, md5(array_to_string(ws[i:i+7], ' ')) AS gram
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS i
        FROM w WHERE len(ws) >= 8)
), gd AS (
  SELECT gram, doc_id, count(*) AS c FROM g GROUP BY 1, 2
), flagged AS (
  SELECT gram FROM gd GROUP BY gram HAVING count(*) >= 2
), dup AS (
  SELECT doc_id, sum(c) AS n_dup
  FROM gd JOIN flagged USING (gram) GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(greatest(len(ws) - 7, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup_grams,
       CASE WHEN len(ws) >= 8 THEN
         floor(CAST(coalesce(dup.n_dup, 0) AS DOUBLE)
               / CAST(len(ws) - 7 AS DOUBLE) * 1000000 + 0.5) / 1000000.0
       ELSE 0.0 END AS dup_frac
FROM w LEFT JOIN dup ON w.doc_id = dup.doc_id
"""


def _q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB shape-preserving downsample to 20 points per series
    (operators/promql.py); the oracle replays the sequential bucket
    selection as a recursive CTE over per-bucket point lists."""
    from numalogic_spark.operators.promql import lttb_downsample

    return lttb_downsample(_evt_series(spark, sf_dir), threshold=20)


def _lttb_sql(t: int = 20) -> str:
    """Recursive-CTE replay of LTTB: bucket point-lists + next-bucket
    means precomputed; each recursion step picks the first-max-area
    point via list_transform/list_aggregate/list_position (scalar list
    functions — legal in a recursive member where aggregates are not).
    Doubles go through the identical expression shape as the numpy
    kernel; bucket means use exact integer sums (integral-second
    timestamps, 2-dp values scaled to cents — never half-integral, so
    DuckDB's round-half-away CAST and numpy's half-even rint agree)."""
    tm2 = t - 2
    area = (
        "list_transform(bb.pl, p -> abs((s.sx - bb.cx) * (p.y - s.sy)"
        " - (s.sx - p.x) * (bb.cy - s.sy)))"
    )
    return f"""
WITH RECURSIVE
b AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, value
  FROM events
),
pts AS (
  SELECT source, ts_s, value,
         row_number() OVER (PARTITION BY source ORDER BY ts_s, event_id) - 1 AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM b
),
big AS (SELECT DISTINCT source FROM pts WHERE n > {t}),
mid AS (
  SELECT p.source, p.ts_s, p.value, p.rn,
         CAST(((p.rn - 1) * {tm2}) // (p.n - 2) AS BIGINT) AS bk
  FROM pts p JOIN big USING (source)
  WHERE p.rn >= 1 AND p.rn <= p.n - 2
),
bl AS (
  SELECT source, bk,
         list({{'x': CAST(ts_s AS DOUBLE), 'y': value, 't': ts_s}} ORDER BY rn) AS pl,
         CAST(sum(ts_s) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mx,
         CAST(sum(CAST(value * 100 AS BIGINT)) AS DOUBLE) / 100.0
           / CAST(count(*) AS DOUBLE) AS my
  FROM mid GROUP BY 1, 2
),
lastp AS (
  SELECT p.source, CAST(p.ts_s AS DOUBLE) AS lx, p.value AS ly
  FROM pts p JOIN big USING (source) WHERE p.rn = p.n - 1
),
blx AS (
  SELECT a.source, a.bk, a.pl,
         coalesce(nx.mx, l.lx) AS cx,
         coalesce(nx.my, l.ly) AS cy
  FROM bl a
  LEFT JOIN bl nx ON nx.source = a.source AND nx.bk = a.bk + 1
  JOIN lastp l ON l.source = a.source
),
sel AS (
  SELECT p.source, CAST(-1 AS BIGINT) AS bk, CAST(p.ts_s AS DOUBLE) AS sx,
         p.value AS sy, p.ts_s AS st
  FROM pts p JOIN big USING (source) WHERE p.rn = 0
  UNION ALL
  SELECT source, bk, (pick).x AS sx, (pick).y AS sy, (pick).t AS st FROM (
    SELECT s.source AS source, s.bk + 1 AS bk,
           bb.pl[list_position({area}, list_aggregate({area}, 'max'))] AS pick
    FROM sel s JOIN blx bb ON bb.source = s.source AND bb.bk = s.bk + 1
  )
)
SELECT source, bk + 1 AS sel_idx, st AS ts_s, sy AS value FROM sel
UNION ALL
SELECT p.source, CAST({t - 1} AS BIGINT) AS sel_idx, p.ts_s, p.value
FROM pts p JOIN big USING (source) WHERE p.rn = p.n - 1
UNION ALL
SELECT p.source, p.rn AS sel_idx, p.ts_s, p.value
FROM pts p WHERE p.n <= {t}
"""


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of events per user (30 min gap): lag
    boundary flag + running-sum session ids off ONE sort, then a
    map-side-combinable per-session aggregate (operators/promql.py)."""
    from numalogic_spark.operators.promql import sessionize

    ev = _events(spark, sf_dir).select(
        "user_id", F.unix_timestamp("ts").alias("ts_s"), "event_id", "value"
    )
    return sessionize(ev, gap_s=1800, key_cols=("user_id",))


_SESSIONIZE_SQL = """
WITH b AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id,
         CAST(value AS DECIMAL(15,6)) AS vd
  FROM events
), f AS (
  SELECT user_id, ts_s, event_id, vd,
         CASE WHEN lag(ts_s) OVER w IS NULL
                OR ts_s - lag(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS bnd
  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
), s AS (
  SELECT user_id, ts_s, vd,
         sum(bnd) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM f
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(ts_s) AS start_s, max(ts_s) AS end_s,
       count(*) AS n_events,
       max(ts_s) - min(ts_s) AS duration_s,
       CAST(sum(vd) AS DOUBLE) AS value_sum
FROM s GROUP BY 1, 2
"""


def _q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join of click-sessions against error-sessions
    per user (grid-bucketed equi-join + dedup + exact verify — never the
    per-key cartesian; operators/joins.py). Oracle: DuckDB runs the
    plain range join over the same sessionized CTEs."""
    from numalogic_spark.operators.joins import interval_overlap_join
    from numalogic_spark.operators.promql import sessionize

    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("ts_s"),
        "event_id",
        "value",
    )

    def sessions(etype: str) -> DataFrame:
        # 12 h gap: per-user events sit hours apart at small SF, so a
        # 30-min gap would yield only single-event, never-overlapping
        # sessions (a vacuous join); 12 h chains them into multi-day
        # sessions that genuinely interleave across types
        return sessionize(
            ev.filter(F.col("event_type") == etype), gap_s=43200,
            key_cols=("user_id",), value_col=None,
        ).select("user_id", "session_idx", "start_s", "end_s")

    return interval_overlap_join(
        sessions("click"),
        sessions("error").withColumnRenamed("session_idx", "session_idx_r"),
        key_cols=("user_id",),
        l_id="session_idx",
        r_id="session_idx_r",
        grid_s=86400,
    )


def _interval_join_sql() -> str:
    def sess(etype: str) -> str:
        return f"""
  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         min(ts_s) AS start_s, max(ts_s) AS end_s
  FROM (
    SELECT user_id, ts_s,
           sum(bnd) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
    FROM (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id,
             CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 43200
                  THEN 1 ELSE 0 END AS bnd
      FROM events WHERE event_type = '{etype}'
      WINDOW w AS (PARTITION BY user_id ORDER BY floor(epoch(ts)), event_id)
    )
  ) GROUP BY 1, 2"""

    return f"""
WITH l AS ({sess("click")}),
r AS ({sess("error")})
SELECT l.user_id, l.session_idx,
       l.start_s AS l_start_s, l.end_s AS l_end_s,
       r.session_idx AS session_idx_r,
       r.start_s AS r_start_s, r.end_s AS r_end_s
FROM l JOIN r ON l.user_id = r.user_id
 AND l.start_s <= r.end_s AND r.start_s <= l.end_s
"""


def _q_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HLL distinct-user sketch per (series, hour) next to
    the exact count (operators/sketches.py): portable-hash registers, so
    the ESTIMATE itself is oracle-replayable — Spark's built-in
    approx_count_distinct never is."""
    from numalogic_spark.operators.sketches import hll_distinct

    ev = _events(spark, sf_dir).select(
        F.col("event_type").alias("source"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600).alias("bucket_s"),
        "user_id",
    )
    est = hll_distinct(ev, "user_id", ["source", "bucket_s"], m=256)
    exact = ev.groupBy("source", "bucket_s").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return exact.join(est, ["source", "bucket_s"])


def _fold_raw_sql(col: str, salt: int) -> str:
    """DuckDB replay of the salted Carter-Wegman char fold (sketches'
    portable hash BEFORE mixing) — emitted ONCE per hash site; the
    quadratic-map avalanche rounds are applied in staged CTE levels via
    `_mix_step_sql` so the O(len) fold never inlines 4x."""
    from numalogic_spark.operators.dedup import MERSENNE31
    from numalogic_spark.operators.sampling import _CHAR_MULT, _SAMPLE_A, _SAMPLE_B

    p = MERSENNE31
    return (
        f"(({_SAMPLE_A} * list_reduce(list_prepend(CAST({salt} AS BIGINT), "
        f"list_transform(generate_series(1, greatest(length({col}), 1)), "
        f"i -> CAST(ascii({col}[i]) AS BIGINT))), "
        f"(acc, c) -> (acc * {_CHAR_MULT} + c) % {p}) + {_SAMPLE_B}) % {p})"
    )


def _mix_step_sql(x: str, c: int) -> str:
    """One quadratic-map round (x² + c mod p) over a BOUND column
    reference — column refs are free, so squaring costs nothing extra."""
    from numalogic_spark.operators.dedup import MERSENNE31

    return f"((({x}) * ({x}) + {c}) % {MERSENNE31})"


def _hll_sql_builder(m: int = 256, include_exact: bool = True) -> str:
    """ONE builder for both HLL oracles (per-hour sketch ± the exact
    count join) — the register/estimate SQL must stay byte-identical
    between the direct query and the tier-cascade query, whose hash gate
    proves merge-losslessness against exactly this text."""

    from numalogic_spark.operators.sketches import MIX_C1, MIX_C2

    exact_cols = (
        ",\n       CAST(x.exact_distinct AS BIGINT) AS exact_distinct"
        if include_exact
        else ""
    )
    exact_join = (
        """
JOIN (SELECT source, bucket_s, count(DISTINCT s) AS exact_distinct
      FROM b GROUP BY 1, 2) x
  ON x.source = e.source AND x.bucket_s = e.bucket_s"""
        if include_exact
        else ""
    )
    return f"""
WITH b AS (
  SELECT event_type AS source,
         CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS bucket_s,
         CAST(user_id AS VARCHAR) AS s
  FROM events
), hraw AS (
  SELECT source, bucket_s, {_fold_raw_sql("s", 0)} AS f0, {_fold_raw_sql("s", 1)} AS f1
  FROM b
), hmid AS (
  SELECT source, bucket_s, {_mix_step_sql("f0", MIX_C1)} AS g0,
         {_mix_step_sql("f1", MIX_C1)} AS g1
  FROM hraw
), hashed AS (
  SELECT source, bucket_s, {_mix_step_sql("g0", MIX_C2)} % {m} AS register,
         {_mix_step_sql("g1", MIX_C2)} AS h2
  FROM hmid
), regs AS (
  SELECT source, bucket_s, register,
         max(CASE WHEN h2 = 0 THEN 32 ELSE 32 - length(bin(CAST(h2 AS BIGINT))) END) AS max_rho
  FROM hashed GROUP BY 1, 2, 3
), grid AS (
  SELECT g.source, g.bucket_s, r.register
  FROM (SELECT DISTINCT source, bucket_s FROM regs) g
  CROSS JOIN (SELECT unnest(range(0, {m})) AS register) r
), dense AS (
  SELECT g.source, g.bucket_s, coalesce(regs.max_rho, 0) AS max_rho
  FROM grid g LEFT JOIN regs
    ON regs.source = g.source AND regs.bucket_s = g.bucket_s
   AND regs.register = g.register
), agg AS (
  SELECT source, bucket_s,
         sum(CAST(1.0 AS DOUBLE) / CAST(CAST(1 AS BIGINT) << max_rho AS DOUBLE)) AS sterm,
         sum(CASE WHEN max_rho = 0 THEN 1 ELSE 0 END) AS v
  FROM dense GROUP BY 1, 2
), est AS (
  SELECT source, bucket_s,
         (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST({m} AS DOUBLE)))
           * CAST({m} AS DOUBLE) * CAST({m} AS DOUBLE) / sterm AS raw_e,
         v
  FROM agg
)
SELECT e.source, e.bucket_s{exact_cols},
       floor((CASE WHEN raw_e <= 2.5 * {m} AND v > 0
              THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / CAST(v AS DOUBLE))
              ELSE raw_e END) * 1000000 + 0.5) / 1000000.0 AS hll_estimate
FROM est e{exact_join}
"""


def _q_hll_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL tier cascade: minute-level register tables merged by MAX up to
    the hour, then estimated — the lossless sketch re-aggregation that
    lets distinct counts ride the same retention ladder as the rollups.
    The oracle computes the DIRECT hourly estimate; equality IS the
    merge-losslessness proof, cross-engine."""
    from numalogic_spark.operators.sketches import hll_estimate, hll_registers

    ev = _events(spark, sf_dir).select(
        F.col("event_type").alias("source"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 60).alias("bucket_1m"),
        "user_id",
    )
    regs_1m = hll_registers(ev, "user_id", ["source", "bucket_1m"], m=256)
    regs_1h = (
        regs_1m.withColumn("bucket_s", F.col("bucket_1m") - F.col("bucket_1m") % 3600)
        .groupBy("source", "bucket_s", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    return hll_estimate(regs_1h, ["source", "bucket_s"], m=256)


def _hll_cascade_sql(m: int = 256) -> str:
    return _hll_sql_builder(m, include_exact=False)


def _q_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over per-source word counts, probed at
    the exact top-10 heavy hitters (operators/sketches.py): the sketch
    estimate rides next to the exact count so the gate checks both the
    cell arithmetic and the min-fold."""
    from numalogic_spark.operators.sketches import cms_lookup, cms_sketch

    docs = _docs(spark, sf_dir).select(
        "source",
        F.array_remove(F.split(F.lower(F.col("text")), r"\s+"), "").alias("words"),
    )
    # ONE tokenize pass: the checkpointed (source, token, c) table feeds
    # the sketch, the top-10 rank window AND the probe join — ranking
    # over it is exactly heavy_hitters_per_group's second stage (a
    # separate call would re-tokenize the whole corpus)
    counts = (
        docs.select("source", F.explode("words").alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint(eager=False)
    sk = cms_sketch(counts, "token", ["source"], depth=4, width=256, weight_col="c")
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("token"))
    hh = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("source", "token", F.col("c").alias("cnt"), "rnk")
    )
    est = cms_lookup(sk, hh.select("source", "token"), "token", ["source"])
    return hh.join(est, ["source", "token"]).select(
        "source", "token", "cnt", "rnk", "cms_estimate"
    )


def _cms_sql(depth: int = 4, width: int = 256) -> str:
    from numalogic_spark.operators.sketches import MIX_C1, MIX_C2

    def cell_select(src_rel: str, d: int) -> str:
        # staged: fold bound once, then two quadratic rounds on refs
        return (
            f"SELECT source, token, c, {d} AS d,"
            f" {_mix_step_sql('g', MIX_C2)} % {width} AS col FROM ("
            f"SELECT source, token, c, {_mix_step_sql('f', MIX_C1)} AS g FROM ("
            f"SELECT source, token, c, {_fold_raw_sql('token', d)} AS f"
            f" FROM {src_rel}))"
        )

    cell_rows = "\nUNION ALL\n".join(cell_select("counts", d) for d in range(depth))
    probe_rows = "\nUNION ALL\n".join(
        cell_select(
            "(SELECT c2.source, c2.token, c2.c FROM counts c2"
            " JOIN hh ON hh.source = c2.source AND hh.token = c2.token)",
            d,
        )
        for d in range(depth)
    )
    return rf"""
WITH t AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
  FROM documents
), counts AS (
  SELECT source, token, count(*) AS c FROM t GROUP BY 1, 2
), cells AS (
{cell_rows}
), sketch AS (
  SELECT source, d, col, CAST(sum(c) AS BIGINT) AS cnt
  FROM cells GROUP BY 1, 2, 3
), hh AS (
  SELECT source, token, cnt, rnk FROM (
    SELECT source, token, c AS cnt,
           row_number() OVER (PARTITION BY source ORDER BY c DESC, token) AS rnk
    FROM counts
  ) WHERE rnk <= 10
), probes AS (
{probe_rows}
)
SELECT h.source, h.token, h.cnt, h.rnk,
       CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cms_estimate
FROM probes p
JOIN hh h ON h.source = p.source AND h.token = p.token
LEFT JOIN sketch s ON s.source = p.source AND s.d = p.d AND s.col = p.col
GROUP BY 1, 2, 3, 4
"""


def _q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PMI collocations over adjacent word pairs (operators/lm.py
    pmi_collocations) — marginals over the unfiltered joint, min-count 5."""
    from numalogic_spark.operators.lm import pmi_collocations

    return pmi_collocations(_docs(spark, sf_dir), min_count=5, top_k=50)


_PMI_SQL = r"""
WITH w AS (
  SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
  FROM documents
), bg AS (
  SELECT ws[i] AS a, ws[i + 1] AS b
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM w WHERE len(ws) >= 2)
), bc AS (
  SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2
), ca AS (SELECT a, sum(c_ab) AS c_a FROM bc GROUP BY 1),
cb AS (SELECT b, sum(c_ab) AS c_b FROM bc GROUP BY 1),
nt AS (SELECT sum(c_ab) AS n FROM bc)
SELECT a, b, c_ab, pmi, rnk FROM (
  SELECT s.*, row_number() OVER (ORDER BY pmi DESC, a, b) AS rnk FROM (
    SELECT bc.a, bc.b, bc.c_ab,
           floor(ln(CAST(nt.n AS DOUBLE) * CAST(bc.c_ab AS DOUBLE)
                    / (CAST(ca.c_a AS DOUBLE) * CAST(cb.c_b AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000.0 AS pmi
    FROM bc
    JOIN ca ON ca.a = bc.a
    JOIN cb ON cb.b = bc.b
    CROSS JOIN nt
    WHERE bc.c_ab >= 5
  ) s
) WHERE rnk <= 50
"""


def _q_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series staleness/absence audit vs the data watermark
    (operators/retention.staleness_report): last-seen age + observed vs
    missing minute buckets over the trailing day."""
    from numalogic_spark.operators.retention import staleness_report

    return staleness_report(
        _evt_series(spark, sf_dir), bucket_s=60, lookback_s=86400
    )


_STALENESS_SQL = """
WITH b AS (
  SELECT event_type AS source,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 60 AS bucket
  FROM events
), wm AS (SELECT max(ts_s) AS w FROM b),
pb AS (SELECT source, bucket, max(ts_s) AS bmax FROM b GROUP BY 1, 2)
SELECT source,
       max(bmax) AS last_seen_s,
       (SELECT w FROM wm) - max(bmax) AS staleness_s,
       CAST(sum(CASE WHEN bucket > (SELECT w FROM wm) - 86400
                      AND bucket <= (SELECT w FROM wm)
                     THEN 1 ELSE 0 END) AS BIGINT) AS buckets_observed,
       1440 - CAST(sum(CASE WHEN bucket > (SELECT w FROM wm) - 86400
                             AND bucket <= (SELECT w FROM wm)
                            THEN 1 ELSE 0 END) AS BIGINT) AS buckets_missing
FROM pb GROUP BY 1
"""


_DSIR_VOCAB = 2000


def _q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: unigram log p_target − log p_raw per doc
    with target = English docs (operators/sampling.dsir_importance);
    6dp-quantized log-ratios + decimal sums keep scores engine-exact."""
    from numalogic_spark.operators.sampling import dsir_importance

    return dsir_importance(
        _docs(spark, sf_dir), F.col("lang") == "en", max_vocab=_DSIR_VOCAB
    )


def _dsir_sql(v: int = _DSIR_VOCAB) -> str:
    return rf"""
WITH w AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, is_t, t.w AS word FROM w, unnest(w.ws) AS t(w)
), wc AS (
  SELECT word, count(*) AS raw_c,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tgt_c
  FROM tok GROUP BY 1
), vocab AS (
  SELECT word, raw_c, tgt_c FROM wc ORDER BY raw_c DESC, word LIMIT {v}
), vs AS (SELECT count(*) AS vv FROM vocab),
tot AS (SELECT sum(raw_c) AS t_raw, sum(tgt_c) AS t_tgt FROM vocab),
lr AS (
  SELECT word,
    CAST(floor(ln((tgt_c + 1.0) / (t_tgt + 1.0 * (vv + 1))) * 1000000 + 0.5) / 1000000.0
       - floor(ln((raw_c + 1.0) / (t_raw + 1.0 * (vv + 1))) * 1000000 + 0.5) / 1000000.0
       AS DECIMAL(28,6)) AS lr
  FROM vocab, tot, vs
), unk AS (
  SELECT CAST(floor(ln(1.0 / (t_tgt + 1.0 * (vv + 1))) * 1000000 + 0.5) / 1000000.0
            - floor(ln(1.0 / (t_raw + 1.0 * (vv + 1))) * 1000000 + 0.5) / 1000000.0
            AS DECIMAL(28,6)) AS lr_unk
  FROM tot, vs
), sc AS (
  SELECT tok.doc_id, count(*) AS n_tokens,
         sum(coalesce(lr.lr, (SELECT lr_unk FROM unk))) AS lw
  FROM tok LEFT JOIN lr USING (word) GROUP BY 1
)
SELECT w.doc_id, CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(sc.lw, CAST(0 AS DECIMAL(28,6))) AS DOUBLE) AS log_weight
FROM w LEFT JOIN sc USING (doc_id)
"""


def _q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every event matched to the mean of the last
    COMPLETED hour of its series (stat stamped at bucket end — the
    fitted-threshold-lookup pattern; operators/joins.py). Oracle is
    DuckDB's native ASOF LEFT JOIN."""
    from numalogic_spark.operators.joins import asof_join_backward

    ev = _evt_series(spark, sf_dir)
    hourly = (
        ev.groupBy(
            "source",
            ((F.col("ts_s") - F.col("ts_s") % 3600) + 3600).alias("rt"),
        )
        .agg(
            _r6(
                F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("stat_mean")
        )
    )
    return asof_join_backward(ev, hourly, right_ts="rt")


_ASOF_SQL = """
WITH b AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, value
  FROM events
), r AS (
  SELECT source, (ts_s - ts_s % 3600) + 3600 AS rt,
         floor((CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
                / CAST(count(*) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS stat_mean
  FROM b GROUP BY 1, 2
)
SELECT b.source, b.ts_s, b.event_id, b.value,
       r.rt AS asof_ts, r.stat_mean AS asof_stat_mean
FROM b ASOF LEFT JOIN r ON b.source = r.source AND b.ts_s >= r.rt
"""


_HIST_LES = (1.0, 2.0, 3.0, 5.0, 8.0, 12.0, 20.0, 50.0)


def _q_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL histogram_quantile(0.9) over hourly cumulative fixed
    buckets — the O(buckets)-state mergeable quantile path
    (operators/promql.py fixed_histogram + histogram_quantile)."""
    from numalogic_spark.operators.promql import fixed_histogram, histogram_quantile

    hist = fixed_histogram(_evt_series(spark, sf_dir), _HIST_LES, bucket_s=3600)
    return histogram_quantile(hist, q=0.9)


def _hist_quantile_sql(q: float = 0.9) -> str:
    fins = list(_HIST_LES)
    le_case = "CASE " + " ".join(
        f"WHEN value <= {b} THEN {b}" for b in fins
    ) + " ELSE CAST('infinity' AS DOUBLE) END"
    le_list = ", ".join(str(b) for b in fins) + ", CAST('infinity' AS DOUBLE)"
    return f"""
WITH b AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value
  FROM events
), raw AS (
  SELECT source, ts_s - ts_s % 3600 AS bucket_s, {le_case} AS le, count(*) AS cnt
  FROM b GROUP BY 1, 2, 3
), grid AS (
  SELECT g.source, g.bucket_s, l.le
  FROM (SELECT DISTINCT source, bucket_s FROM raw) g
  CROSS JOIN (SELECT unnest([{le_list}]) AS le) l
), dense AS (
  SELECT g.source, g.bucket_s, g.le, coalesce(r.cnt, 0) AS cnt
  FROM grid g LEFT JOIN raw r
    ON r.source = g.source AND r.bucket_s = g.bucket_s AND r.le = g.le
), cum AS (
  SELECT source, bucket_s, le,
         CAST(sum(cnt) OVER (PARTITION BY source, bucket_s ORDER BY le
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cumd
  FROM dense
), h AS (
  SELECT source, bucket_s, le, cumd,
         lag(cumd, 1, 0.0) OVER w AS prev_cum,
         lag(le, 1, 0.0) OVER w AS prev_le,
         max(cumd) OVER (PARTITION BY source, bucket_s) AS total,
         max(CASE WHEN le <> CAST('infinity' AS DOUBLE) THEN le END)
           OVER (PARTITION BY source, bucket_s) AS maxfin
  FROM cum WINDOW w AS (PARTITION BY source, bucket_s ORDER BY le)
), sel AS (
  SELECT source, bucket_s,
         min({{'le': le, 'prev_le': prev_le, 'cum': cumd, 'prev_cum': prev_cum,
              'rank': {q} * total, 'maxfin': maxfin, 'total': total}}) AS s
  FROM h WHERE cumd >= {q} * total GROUP BY 1, 2
)
SELECT source, bucket_s, CAST((s).total AS BIGINT) AS total,
  floor((CASE WHEN (s).le = CAST('infinity' AS DOUBLE) THEN (s).maxfin
    ELSE (s).prev_le + ((s).le - (s).prev_le)
         * ((s).rank - (s).prev_cum) / ((s).cum - (s).prev_cum) END)
    * 1000000 + 0.5) / 1000000.0 AS phi
FROM sel
"""


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 heavy-hitter words per source (operators/tokens.py
    heavy_hitters_per_group over whitespace words)."""
    from numalogic_spark.operators.tokens import heavy_hitters_per_group

    docs = _docs(spark, sf_dir).select(
        "source",
        F.array_remove(F.split(F.lower(F.col("text")), r"\s+"), "").alias("words"),
    )
    return heavy_hitters_per_group(docs, group_col="source", tokens_col="words", k=10)


_HEAVY_HITTERS_SQL = r"""
WITH t AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
  FROM documents
), c AS (
  SELECT source, token, count(*) AS cnt FROM t GROUP BY 1, 2
)
SELECT source, token, cnt, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token) AS rnk
  FROM c
) WHERE rnk <= 10
"""


# --- vanilla-AE forward-pass inference (the reference's actual scoring
# model family: udfs/inference.py:62-86 over models/autoencoder/variants/
# vanilla.py). Frozen demo artifact; weights-as-SQL-literals oracle (the
# IVF/MCD discipline). Windows: stride-4 length-8 trailing windows per
# source ordered by (ts_s, event_id), per-window z-scored (the reference
# scales before inference) with 6-dp-snapped z so both engines feed the
# forward pass identical fixed-point inputs.
_AE_L, _AE_STRIDE = 8, 4


def _ae_weights():
    from numalogic_spark.functions.ae import make_demo_weights

    return make_demo_weights(seq_len=_AE_L)


def _sparse_ae_weights():
    from numalogic_spark.functions.ae import make_sparse_demo_weights

    return make_sparse_demo_weights(seq_len=_AE_L)


def _ae_z_exprs() -> tuple[str, str, list[str]]:
    """Shared m / sd / z0..z{L-1} expression strings — Spark consumes
    them via F.expr, the oracle embeds the identical text, so the
    standardization arithmetic cannot drift between engines. Lives in
    operators/score.py (jobs/score_job.py runs the same pipeline)."""
    from numalogic_spark.operators.score import z_window_exprs

    return z_window_exprs(_AE_L)


def _ae_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared input builder for the AE families: stride-{_AE_STRIDE}
    length-{_AE_L} trailing windows per source, per-window z-scored with
    the engine-shared 6-dp expressions (operators/score.py)."""
    from numalogic_spark.operators.score import strided_z_windows

    ev = _events(spark, sf_dir).select(
        F.col("event_type").alias("source"),
        F.unix_timestamp("ts").alias("ts_s"),
        "event_id",
        F.col("value").cast("double").alias("value"),
    )
    return strided_z_windows(ev, _AE_L, _AE_STRIDE)


def _q_ae_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 model-inference gap-closer: reconstruction-error scoring of
    per-series windows through the Arrow forward-pass kernel
    (numalogic_spark/functions/ae.py), per-window z-scored inputs, huber
    errors aggregated to (err_mean, err_max) per window."""
    from numalogic_spark.functions.ae import ae_window_scores

    scored = ae_window_scores(_ae_wins(spark, sf_dir), _ae_weights())
    return scored.select(
        "source",
        F.col("ts_s").alias("end_s"),
        "event_id",
        "err_mean",
        "err_max",
    )


def _q_sparse_ae_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SparseVanillaAE inference (vanilla.py:305-380): the VanillaAE
    dense stack with the encoder's final activation swapped Tanh→ReLU —
    the sparsity KL penalty is train-time only, so eval-mode scoring is
    the same Arrow kernel with a relu layer in the grid."""
    from numalogic_spark.functions.ae import ae_window_scores

    scored = ae_window_scores(_ae_wins(spark, sf_dir), _sparse_ae_weights())
    return scored.select(
        "source",
        F.col("ts_s").alias("end_s"),
        "event_id",
        "err_mean",
        "err_max",
    )


def _conv_ae_weights():
    from numalogic_spark.functions.conv_ae import make_demo_conv_weights

    return make_demo_conv_weights(seq_len=_AE_L)


def _q_conv_ae_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SECOND autoencoder family (Conv1dAE, models/
    autoencoder/variants/conv.py): conv/BN/ReLU/pool encoder + convT/BN/
    ReLU/upsample decoder over the same z-scored windows, scored by the
    Arrow kernel in numalogic_spark/functions/conv_ae.py."""
    from numalogic_spark.functions.conv_ae import conv_ae_window_scores

    scored = conv_ae_window_scores(_ae_wins(spark, sf_dir), _conv_ae_weights())
    return scored.select(
        "source",
        F.col("ts_s").alias("end_s"),
        "event_id",
        "err_mean",
        "err_max",
    )


def _lstm_ae_weights():
    from numalogic_spark.functions.lstm_ae import make_demo_lstm_weights

    return make_demo_lstm_weights(seq_len=_AE_L)


def _q_lstm_ae_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's THIRD autoencoder family (LSTMAE, models/
    autoencoder/variants/lstm.py:89-152): LSTM encoder final hidden
    state -> repeat -> LSTM decoder -> per-step Linear over the same
    z-scored windows, scored by the Arrow recurrence kernel in
    numalogic_spark/functions/lstm_ae.py (SparseLSTMAE shares this
    forward pass)."""
    from numalogic_spark.functions.lstm_ae import lstm_ae_window_scores

    scored = lstm_ae_window_scores(_ae_wins(spark, sf_dir), _lstm_ae_weights())
    return scored.select(
        "source",
        F.col("ts_s").alias("end_s"),
        "event_id",
        "err_mean",
        "err_max",
    )


def _transformer_ae_weights():
    from numalogic_spark.functions.transformer_ae import (
        make_demo_transformer_weights,
    )

    return make_demo_transformer_weights(seq_len=_AE_L)


def _q_transformer_ae_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FOURTH autoencoder family (TransformerAE, models/
    autoencoder/variants/transformer.py:289-361): stacked residual
    attention/feed-forward blocks with LayerNorm + final softmax over
    the same z-scored windows, scored by the Arrow kernel in
    numalogic_spark/functions/transformer_ae.py. At the engine's
    univariate windows every attention softmax runs over a single key
    and collapses EXACTLY to the value projections (see the module
    docstring), which is what makes the stack oracle-replayable.
    SparseTransformerAE shares this forward pass."""
    from numalogic_spark.functions.transformer_ae import (
        transformer_ae_window_scores,
    )

    scored = transformer_ae_window_scores(
        _ae_wins(spark, sf_dir), _transformer_ae_weights()
    )
    return scored.select(
        "source",
        F.col("ts_s").alias("end_s"),
        "event_id",
        "err_mean",
        "err_max",
    )


def _transformer_ae_sql() -> str:
    """DuckDB replay of the TransformerAE kernel: identical window/z
    construction as _ae_sql, then the unrolled attention/norm/FF level
    grid from transformer_ae.sql_forward_exprs (one CTE per dependency
    level)."""
    from numalogic_spark.functions.ae import round6_sql, sql_error_exprs
    from numalogic_spark.functions.transformer_ae import sql_forward_exprs

    wts = _transformer_ae_weights()
    m_e, sd_e, z_es = _ae_z_exprs()
    lags = ",\n         ".join(
        f"lag(value, {_AE_L - 1 - i}) OVER w AS x{i}" for i in range(_AE_L)
    )
    zcols = ",\n         ".join(
        f"{ze} AS z{i}" for i, ze in enumerate(z_es)
    )
    levels, recon = sql_forward_exprs(wts, [f"z{i}" for i in range(_AE_L)])
    ctes = ""
    prev = "zs"
    for t, exprs in enumerate(levels):
        ctes += f", c{t} AS (SELECT *, {', '.join(exprs)} FROM {prev})\n"
        prev = f"c{t}"
    errs = sql_error_exprs(wts, [f"z{i}" for i in range(_AE_L)], recon)
    es = [f"e{k}" for k in range(_AE_L)]
    s = es[0]
    for c in es[1:]:
        s = f"({s} + {c})"
    mean6 = round6_sql(f"{s} / {float(_AE_L)!r}")
    return f"""
WITH r AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER w AS rn,
         {lags}
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY floor(epoch(ts)), event_id)
), f AS (
  SELECT * FROM r WHERE rn >= {_AE_L} AND (rn - {_AE_L}) % {_AE_STRIDE} = 0
), ms AS (
  SELECT *, {m_e} AS m FROM f
), ss AS (
  SELECT *, {sd_e} AS sd FROM ms
), zs AS (
  SELECT source, ts_s, event_id,
         {zcols}
  FROM ss
){ctes}, ee AS (
  SELECT source, ts_s, event_id, {', '.join(errs)} FROM {prev}
)
SELECT source, ts_s AS end_s, event_id,
       {mean6} AS err_mean,
       greatest({', '.join(es)}) AS err_max
FROM ee
"""


def _vae_weights():
    from numalogic_spark.functions.vae import make_demo_vae_weights

    return make_demo_vae_weights(seq_len=_AE_L)


def _q_vae_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FIFTH model family (Conv1dVAE, models/vae/
    variants/conv.py:139-231) in its deterministic mean-latent eval
    form (z = mu; the reference samples even at predict time, so the
    stochastic path is unreplayable by design — see
    numalogic_spark/functions/vae.py): causal dilated conv encoder +
    dense mu head + convT decoder over the same z-scored windows,
    scored with SQUARED error (BaseVAE's mse default, base.py:33-40)
    by the Arrow kernel in numalogic_spark/functions/vae.py."""
    from numalogic_spark.functions.vae import vae_window_scores

    scored = vae_window_scores(_ae_wins(spark, sf_dir), _vae_weights())
    return scored.select(
        "source",
        F.col("ts_s").alias("end_s"),
        "event_id",
        "err_mean",
        "err_max",
    )


def _vae_sql() -> str:
    """DuckDB replay of the mean-latent Conv1dVAE kernel: identical
    window/z construction as _ae_sql, then the unrolled causal-conv/
    dense/affine/relu/convT column grid from vae.sql_forward_exprs and
    the squared-error grid from vae.sql_error_exprs (mse, not huber)."""
    from numalogic_spark.functions.ae import round6_sql
    from numalogic_spark.functions.vae import sql_error_exprs, sql_forward_exprs

    wts = _vae_weights()
    m_e, sd_e, z_es = _ae_z_exprs()
    lags = ",\n         ".join(
        f"lag(value, {_AE_L - 1 - i}) OVER w AS x{i}" for i in range(_AE_L)
    )
    zcols = ",\n         ".join(
        f"{ze} AS z{i}" for i, ze in enumerate(z_es)
    )
    layers, recon = sql_forward_exprs(wts, [f"z{i}" for i in range(_AE_L)])
    ctes = ""
    prev = "zs"
    for t, exprs in enumerate(layers):
        ctes += f", c{t} AS (SELECT *, {', '.join(exprs)} FROM {prev})\n"
        prev = f"c{t}"
    errs = sql_error_exprs(wts, [f"z{i}" for i in range(_AE_L)], recon)
    es = [f"e{k}" for k in range(_AE_L)]
    s = es[0]
    for c in es[1:]:
        s = f"({s} + {c})"
    mean6 = round6_sql(f"{s} / {float(_AE_L)!r}")
    return f"""
WITH r AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER w AS rn,
         {lags}
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY floor(epoch(ts)), event_id)
), f AS (
  SELECT * FROM r WHERE rn >= {_AE_L} AND (rn - {_AE_L}) % {_AE_STRIDE} = 0
), ms AS (
  SELECT *, {m_e} AS m FROM f
), ss AS (
  SELECT *, {sd_e} AS sd FROM ms
), zs AS (
  SELECT source, ts_s, event_id,
         {zcols}
  FROM ss
){ctes}, ee AS (
  SELECT source, ts_s, event_id, {', '.join(errs)} FROM {prev}
)
SELECT source, ts_s AS end_s, event_id,
       {mean6} AS err_mean,
       greatest({', '.join(es)}) AS err_max
FROM ee
"""


def _ae_sql(wts=None) -> str:
    """DuckDB replay: identical window/z construction, then the unrolled
    weights-as-literals forward pass and huber errors from
    ae.sql_forward_exprs / sql_error_exprs (the strings pytest proves
    equal to the kernel under Spark SQL's parser too). Pass the sparse
    artifact for the SparseVanillaAE query — same grid, one relu act."""
    from numalogic_spark.functions.ae import (
        round6_sql, sql_error_exprs, sql_forward_exprs)

    if wts is None:
        wts = _ae_weights()
    m_e, sd_e, z_es = _ae_z_exprs()
    lags = ",\n         ".join(
        f"lag(value, {_AE_L - 1 - i}) OVER w AS x{i}" for i in range(_AE_L)
    )
    zcols = ",\n         ".join(
        f"{ze} AS z{i}" for i, ze in enumerate(z_es)
    )
    layers = sql_forward_exprs(wts, [f"z{i}" for i in range(_AE_L)])
    ctes = ""
    prev = "zs"
    for t, exprs in enumerate(layers):
        ctes += f", c{t} AS (SELECT *, {', '.join(exprs)} FROM {prev})\n"
        prev = f"c{t}"
    recon = [f"h{len(layers) - 1}_{j}" for j in range(_AE_L)]
    errs = sql_error_exprs(wts, [f"z{i}" for i in range(_AE_L)], recon)
    es = [f"e{k}" for k in range(_AE_L)]
    s = es[0]
    for c in es[1:]:
        s = f"({s} + {c})"
    mean6 = round6_sql(f"{s} / {float(_AE_L)!r}")
    return f"""
WITH r AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER w AS rn,
         {lags}
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY floor(epoch(ts)), event_id)
), f AS (
  SELECT * FROM r WHERE rn >= {_AE_L} AND (rn - {_AE_L}) % {_AE_STRIDE} = 0
), ms AS (
  SELECT *, {m_e} AS m FROM f
), ss AS (
  SELECT *, {sd_e} AS sd FROM ms
), zs AS (
  SELECT source, ts_s, event_id,
         {zcols}
  FROM ss
){ctes}, ee AS (
  SELECT source, ts_s, event_id, {', '.join(errs)} FROM {prev}
)
SELECT source, ts_s AS end_s, event_id,
       {mean6} AS err_mean,
       greatest({', '.join(es)}) AS err_max
FROM ee
"""


def _conv_ae_sql() -> str:
    """DuckDB replay of the Conv1dAE kernel: identical window/z
    construction as _ae_sql, then the unrolled conv/affine/relu/pool/
    upsample column grid from conv_ae.sql_forward_exprs."""
    from numalogic_spark.functions.ae import round6_sql, sql_error_exprs
    from numalogic_spark.functions.conv_ae import sql_forward_exprs

    wts = _conv_ae_weights()
    m_e, sd_e, z_es = _ae_z_exprs()
    lags = ",\n         ".join(
        f"lag(value, {_AE_L - 1 - i}) OVER w AS x{i}" for i in range(_AE_L)
    )
    zcols = ",\n         ".join(
        f"{ze} AS z{i}" for i, ze in enumerate(z_es)
    )
    layers, recon = sql_forward_exprs(wts, [f"z{i}" for i in range(_AE_L)])
    ctes = ""
    prev = "zs"
    for t, exprs in enumerate(layers):
        ctes += f", c{t} AS (SELECT *, {', '.join(exprs)} FROM {prev})\n"
        prev = f"c{t}"
    errs = sql_error_exprs(wts, [f"z{i}" for i in range(_AE_L)], recon)
    es = [f"e{k}" for k in range(_AE_L)]
    s = es[0]
    for c in es[1:]:
        s = f"({s} + {c})"
    mean6 = round6_sql(f"{s} / {float(_AE_L)!r}")
    return f"""
WITH r AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER w AS rn,
         {lags}
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY floor(epoch(ts)), event_id)
), f AS (
  SELECT * FROM r WHERE rn >= {_AE_L} AND (rn - {_AE_L}) % {_AE_STRIDE} = 0
), ms AS (
  SELECT *, {m_e} AS m FROM f
), ss AS (
  SELECT *, {sd_e} AS sd FROM ms
), zs AS (
  SELECT source, ts_s, event_id,
         {zcols}
  FROM ss
){ctes}, ee AS (
  SELECT source, ts_s, event_id, {', '.join(errs)} FROM {prev}
)
SELECT source, ts_s AS end_s, event_id,
       {mean6} AS err_mean,
       greatest({', '.join(es)}) AS err_max
FROM ee
"""


def _lstm_ae_sql() -> str:
    """DuckDB replay of the LSTMAE kernel: identical window/z
    construction as _ae_sql, then the unrolled gate/cell/hidden level
    grid from lstm_ae.sql_forward_exprs (one CTE per dependency level)."""
    from numalogic_spark.functions.ae import round6_sql, sql_error_exprs
    from numalogic_spark.functions.lstm_ae import sql_forward_exprs

    wts = _lstm_ae_weights()
    m_e, sd_e, z_es = _ae_z_exprs()
    lags = ",\n         ".join(
        f"lag(value, {_AE_L - 1 - i}) OVER w AS x{i}" for i in range(_AE_L)
    )
    zcols = ",\n         ".join(
        f"{ze} AS z{i}" for i, ze in enumerate(z_es)
    )
    levels, recon = sql_forward_exprs(wts, [f"z{i}" for i in range(_AE_L)])
    ctes = ""
    prev = "zs"
    for t, exprs in enumerate(levels):
        ctes += f", c{t} AS (SELECT *, {', '.join(exprs)} FROM {prev})\n"
        prev = f"c{t}"
    errs = sql_error_exprs(wts, [f"z{i}" for i in range(_AE_L)], recon)
    es = [f"e{k}" for k in range(_AE_L)]
    s = es[0]
    for c in es[1:]:
        s = f"({s} + {c})"
    mean6 = round6_sql(f"{s} / {float(_AE_L)!r}")
    return f"""
WITH r AS (
  SELECT event_type AS source, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER w AS rn,
         {lags}
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY floor(epoch(ts)), event_id)
), f AS (
  SELECT * FROM r WHERE rn >= {_AE_L} AND (rn - {_AE_L}) % {_AE_STRIDE} = 0
), ms AS (
  SELECT *, {m_e} AS m FROM f
), ss AS (
  SELECT *, {sd_e} AS sd FROM ms
), zs AS (
  SELECT source, ts_s, event_id,
         {zcols}
  FROM ss
){ctes}, ee AS (
  SELECT source, ts_s, event_id, {', '.join(errs)} FROM {prev}
)
SELECT source, ts_s AS end_s, event_id,
       {mean6} AS err_mean,
       greatest({', '.join(es)}) AS err_max
FROM ee
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- driver-gate window: the driver verifies list(queries())[:50].
        # Rounds 1-4 gated the historical head of this dict, leaving the
        # later waves (LM, diagnostics, sketches, downsamplers, cleaning)
        # with pytest/selfcheck evidence only. Round 5 promotes those 45
        # entries into the gate window; 5 rollup anchors keep continuity.
        "scrub_pii_documents": _q_scrub_pii,
        "boilerplate_lines_documents": _q_boilerplate,
        "normalize_text_documents": _q_normalize,
        "lm_perplexity_documents": _q_lm_ppl,
        "lm_ppl_buckets_documents": _q_lm_buckets,
        "acf_events": _q_acf,
        "cusum_changepoint_events": _q_cusum,
        "hampel_filter_events": _q_hampel,
        "stl_decompose_events": _q_stl,
        "holt_linear_1h_events": _q_holt,
        "rolling_corr_pairs_events": _q_rolling_corr,
        "ccf_pairs_events": _q_ccf,
        "page_hinkley_1h_events": _q_page_hinkley,
        "psi_drift_events": _q_psi_drift,
        "dominant_period_events": _q_dominant_period,
        "kalman_level_1h_events": _q_kalman,
        "token_divergence_documents": _q_token_divergence,
        "pca_project_embeddings": _q_pca_project,
        "series_summary_events": _q_series_summary,
        "trend_slope_events": _q_trend_slope,
        "seasonal_anomalies_events": _q_seasonal_anomalies,
        "pot_threshold_events": _q_pot_threshold,
        "counter_rate_events": _q_counter_rate,
        "m4_downsample_events": _q_m4,
        "retention_policy_events": _q_retention,
        "sax_symbols_events": _q_sax,
        "dup_ngram_spans_documents": _q_dup_ngrams,
        "heavy_hitter_tokens_documents": _q_heavy_hitters,
        "lttb_downsample_events": _q_lttb,
        "histogram_quantile_events": _q_hist_quantile,
        "asof_join_events": _q_asof,
        "dsir_weights_documents": _q_dsir,
        "hll_distinct_events": _q_hll,
        "sessionize_events": _q_sessionize,
        "hll_tier_cascade_events": _q_hll_cascade,
        "interval_overlap_join_events": _q_interval_join,
        "quality_calibration_documents": _q_quality_calibration,
        "cms_freq_documents": _q_cms,
        "pmi_collocations_documents": _q_pmi,
        "staleness_report_events": _q_staleness,
        "rollup_refresh_1h_events": _q_rollup_refresh,
        "dedup_clusters_documents": _q_dedup_clusters,
        "bpe_encode_documents": _q_bpe_encode,
        "nb_classify_documents": _q_nb_classify,
        "ae_inference_events": _q_ae_inference,
        "conv_ae_inference_events": _q_conv_ae_inference,
        "lstm_ae_inference_events": _q_lstm_ae_inference,
        "sparse_ae_inference_events": _q_sparse_ae_inference,
        "transformer_ae_inference_events": _q_transformer_ae_inference,
        "vae_inference_events": _q_vae_inference,
        # --- evidence tail: every entry below holds a green driver row
        # in CORRECTNESS_r04.json or r03 (curriculum_order was demoted
        # from the window — r3-green — to make room for the sixth model
        # family, the mean-latent Conv1dVAE); rotated out of the 50-slot
        # window to make room for the never-gated wave above;
        # pack_greedy (r3-green) likewise demoted for the round-5
        # incremental-refresh query.
        "pack_greedy_documents": _q_pack_greedy,
        "curriculum_order_documents": _q_curriculum,
        "rollup_1m_events": _q_rollup("1m"),
        "rollup_1h_events": _q_rollup("1h"),
        "rollup_1d_events": _q_rollup("1d"),
        "rollup_tiers_fused_events": _q_rollup_fused,
        "gapfill_1m_events": _q_gapfill,
        "stateless_transforms": _q_log_transform,
        "score_norms": _q_score_norm,
        "difference_transform": _q_diff,
        "tail_n_per_series": _q_tail_n,
        "ewm_window_agg": _q_ewm_window_agg,
        "tanh_scaler_stddev_threshold": _q_tanh_scaler,
        "percentile_scaler_threshold": _q_percentile_scaler,
        "compressed_rollup_roundtrip": _q_compress_roundtrip,
        "dedup_exact_documents": _q_dedup_exact,
        "dedup_jaccard_documents": _q_dedup_jaccard,
        "embedding_cosine_scores": _q_cosine_scores,
        "centroid_cosine_embeddings": _q_centroid_cosine,
        "embedding_near_pairs": _q_embedding_pairs,
        "semdedup_prune_embeddings": _q_semdedup,
        "text_quality_documents": _q_text_quality,
        "lang_id_documents": _q_lang_id,
        "lang_id_ngram_documents": _q_lang_id_ngram,
        "token_frequencies_documents": _q_token_freq,
        "tf_idf_topk_documents": _q_tf_idf,
        "sequence_pack_documents": _q_sequence_pack,
        "ngram_contamination_documents": _q_contamination,
        "repetition_stats_documents": _q_repetition,
        "trigram_entropy_documents": _q_trigram_entropy,
        "stratified_sample_documents": _q_sample,
        "training_order_documents": _q_training_order,
        "mixture_plan_documents": _q_mixture,
        "minhash_near_dup_documents": _q_minhash,
        "simhash_near_dup_documents": _q_simhash,
        "doc_fingerprint_documents": _q_fingerprint,
        "ann_topk_embeddings": _q_ann_topk,
        "ivf_ann_topk_embeddings": _q_ivf_topk,
        "score_pipeline_events": _q_score_pipeline,
        "pivot_metrics_1m": _q_pivot,
        "train_val_split_events": _q_train_val_split,
        "backtest_events": _q_backtest,
        "sliding_window_stats": _q_sliding_window_stats,
        "sliding_window_salted_stats": _q_sliding_window_salted_stats,
        "rollup_1m_sql_api": _q_rollup_sql_api,
        "multi_metric_rollup_lineitem": _q_multi_rollup_lineitem,
        "ewm_smooth_events": _q_ewm_smooth,
        "mahalanobis_events": _q_mahalanobis,
        "sklearn_scalers_events": _q_sklearn_scalers,
        "robust_mahalanobis_events": _q_robust_mahalanobis,
        "seasonal_naive_1h_events": _q_seasonal_naive,
        "forecast_metrics_events": _q_forecast_metrics,
        "prometheus_frame_events": _q_prometheus_frame,
    }


def oracle_sql() -> dict[str, str]:
    out = {
        "ae_inference_events": _ae_sql(),
        "rollup_1m_events": _rollup_sql("minute", 60),
        "rollup_1h_events": _rollup_sql("hour", 3600),
        "rollup_1d_events": _rollup_sql("day", 86400),
        "rollup_tiers_fused_events": _rollup_fused_sql(),
        "gapfill_1m_events": _GAPFILL_SQL,
        "stateless_transforms": _LOG_SQL,
        "score_norms": _SCORE_SQL,
        "difference_transform": _DIFF_SQL,
        "tail_n_per_series": _TAIL_SQL,
        "ewm_window_agg": _EWM_SQL,
        "tanh_scaler_stddev_threshold": _TANH_SCALER_SQL,
        "percentile_scaler_threshold": _PCT_SCALER_SQL,
        "compressed_rollup_roundtrip": _COMPRESS_SQL,
        "dedup_exact_documents": _DEDUP_EXACT_SQL,
        "dedup_jaccard_documents": _DEDUP_JACCARD_SQL,
        "embedding_cosine_scores": _COSINE_SQL,
        "centroid_cosine_embeddings": _CENTROID_COSINE_SQL,
        "embedding_near_pairs": _EMB_PAIRS_SQL,
        "text_quality_documents": _TEXT_QUALITY_SQL,
        "lang_id_documents": _langid_sql(),
        "lang_id_ngram_documents": _lang_id_ngram_sql(),
        "token_frequencies_documents": _TOKEN_FREQ_SQL,
        "tf_idf_topk_documents": _TF_IDF_SQL,
        "sequence_pack_documents": _SEQ_PACK_SQL,
        "ngram_contamination_documents": _contamination_sql(),
        "repetition_stats_documents": _repetition_sql(),
        "trigram_entropy_documents": _trigram_entropy_sql(),
        "stratified_sample_documents": _sample_sql(),
        "training_order_documents": _training_order_sql(),
        "mixture_plan_documents": _MIXTURE_SQL,
        "score_pipeline_events": _score_pipeline_sql(),
        "pivot_metrics_1m": _PIVOT_SQL,
        "train_val_split_events": _SPLIT_SQL,
        "sliding_window_stats": _SLIDING_SQL,
        "sliding_window_salted_stats": _SLIDING_SQL,
        "rollup_1m_sql_api": _ROLLUP_SQL_API_ORACLE,
        "multi_metric_rollup_lineitem": _MULTI_ROLLUP_SQL,
        "minhash_near_dup_documents": _minhash_sql(),
        "simhash_near_dup_documents": _simhash_sql(),
        "doc_fingerprint_documents": _FINGERPRINT_SQL,
        "mahalanobis_events": _mahalanobis_sql(),
        "sklearn_scalers_events": _SKLEARN_SCALERS_SQL,
        "seasonal_naive_1h_events": _SEASONAL_NAIVE_SQL,
        "forecast_metrics_events": _FORECAST_METRICS_SQL,
        "ewm_smooth_events": _ewm_smooth_sql(),
        "backtest_events": _backtest_sql(),
        "prometheus_frame_events": _prom_frame_sql(),
        "dedup_clusters_documents": _dedup_clusters_sql(),
        "ann_topk_embeddings": _ann_sql(),
        "bpe_encode_documents": _bpe_encode_sql(),
        "nb_classify_documents": _nb_classify_sql(),
        "pack_greedy_documents": _PACK_GREEDY_SQL,
        "curriculum_order_documents": _CURRICULUM_SQL,
        "scrub_pii_documents": _scrub_pii_sql(),
        "boilerplate_lines_documents": _BOILER_SQL,
        "normalize_text_documents": _normalize_sql(),
        "lm_perplexity_documents": _lm_ppl_sql(),
        "lm_ppl_buckets_documents": _lm_buckets_sql(),
        "acf_events": _acf_sql(),
        "cusum_changepoint_events": _cusum_sql(),
        "hampel_filter_events": _hampel_sql(),
        "stl_decompose_events": _stl_sql(),
        "holt_linear_1h_events": _holt_sql(),
        "rolling_corr_pairs_events": _rolling_corr_sql(),
        "ccf_pairs_events": _ccf_sql(),
        "page_hinkley_1h_events": _page_hinkley_sql(),
        "psi_drift_events": _psi_sql(),
        "dominant_period_events": _dominant_period_sql(),
        "kalman_level_1h_events": _kalman_sql(),
        "token_divergence_documents": _token_divergence_sql(),
        "series_summary_events": _series_summary_sql(),
        "trend_slope_events": _trend_slope_sql(),
        "seasonal_anomalies_events": _seasonal_anomalies_sql(),
        "pot_threshold_events": _pot_sql(),
        "counter_rate_events": _COUNTER_RATE_SQL,
        "m4_downsample_events": _M4_SQL,
        "retention_policy_events": _retention_sql(),
        "sax_symbols_events": _SAX_SQL,
        "dup_ngram_spans_documents": _DUP_NGRAM_SQL,
        "heavy_hitter_tokens_documents": _HEAVY_HITTERS_SQL,
        "lttb_downsample_events": _lttb_sql(),
        "histogram_quantile_events": _hist_quantile_sql(),
        "asof_join_events": _ASOF_SQL,
        "dsir_weights_documents": _dsir_sql(),
        "hll_distinct_events": _hll_sql_builder(),
        "sessionize_events": _SESSIONIZE_SQL,
        "hll_tier_cascade_events": _hll_cascade_sql(),
        "interval_overlap_join_events": _interval_join_sql(),
        "quality_calibration_documents": _QUALITY_CALIBRATION_SQL,
        "cms_freq_documents": _cms_sql(),
        "pmi_collocations_documents": _PMI_SQL,
        "staleness_report_events": _STALENESS_SQL,
        "rollup_refresh_1h_events": _rollup_refresh_sql(),
        "conv_ae_inference_events": _conv_ae_sql(),
        "lstm_ae_inference_events": _lstm_ae_sql(),
        "sparse_ae_inference_events": _ae_sql(_sparse_ae_weights()),
        "transformer_ae_inference_events": _transformer_ae_sql(),
        "vae_inference_events": _vae_sql(),
    }
    # The ivf oracle is generated by REPLAYING the codebook training over
    # the driver's comparison-scale data (sf0.01 per the driver contract —
    # it is the one oracle that is data-dependent, valid only at that
    # scale). If the fixture is unavailable (different machine/layout),
    # fall back to rows-only rather than failing EVERY oracle.
    try:
        out["ivf_ann_topk_embeddings"] = _ivf_sql()
    except Exception:
        pass
    # Same discipline: the robust-Mahalanobis oracle replays the MCD fit
    # over the sf0.01 fixture and embeds the fitted stats as literals.
    try:
        out["robust_mahalanobis_events"] = _robust_mahalanobis_sql()
    except Exception:
        pass
    # PCA: the oracle generator replays the portable-hash sample + shared
    # numpy fit (pca_fit_numpy) and embeds components/biases as literals.
    try:
        out["pca_project_embeddings"] = _pca_sql()
    except Exception:
        pass
    # SemDeDup: codebook replayed over the sf0.01 fixture (same
    # data-dependent-oracle caveat as IVF/MCD/PCA above).
    try:
        out["semdedup_prune_embeddings"] = _semdedup_sql()
    except Exception:
        pass
    return out
