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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full rollup cascade over the synthetic token table at
    smoke scale — union of all tiers (the engine's continuous aggregates)."""
    from numalogic_spark.datagen import gen_tokens_spark

    df = gen_tokens_spark(spark, 10_000, n_sources=20)
    tiers = rollup_cascade(df, RollupConfig())
    out = tiers["1m"].unionByName(tiers["1h"]).unionByName(tiers["1d"])
    return out.select(
        "source", F.unix_timestamp("bucket_ts").alias("bucket_s"), "tier",
        "count", "n_tok_sum", "n_tok_mean", "n_tok_p95", "token_rate",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m_events": _q_rollup("1m"),
        "rollup_1h_events": _q_rollup("1h"),
        "rollup_1d_events": _q_rollup("1d"),
        "gapfill_1m_events": _q_gapfill,
        "stateless_transforms": _q_log_transform,
        "score_norms": _q_score_norm,
        "difference_transform": _q_diff,
        "tail_n_per_series": _q_tail_n,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1m_events": _rollup_sql("minute", 60),
        "rollup_1h_events": _rollup_sql("hour", 3600),
        "rollup_1d_events": _rollup_sql("day", 86400),
        "gapfill_1m_events": _GAPFILL_SQL,
        "stateless_transforms": _LOG_SQL,
        "score_norms": _SCORE_SQL,
        "difference_transform": _DIFF_SQL,
        "tail_n_per_series": _TAIL_SQL,
    }
