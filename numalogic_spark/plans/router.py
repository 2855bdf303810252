"""Downsample-on-read tier routing.

Grafana/Thanos-style query planning over the tier cascade: given a time
range and a per-series point budget, answer every read from the FINEST
tier that (a) still retains the whole range under the retention ladder
and (b) keeps points-per-series within budget — the reason the cascade
exists: a 90-day dashboard panel must hit the 1d table, not re-scan
10^12 raw rows.

`route_tier` is pure planning (no Spark); `read_routed` applies it to
the tier-partitioned parquet layout `jobs/retention_job.py` writes
(`tier=<name>/...`), so the tier choice prunes at the directory level
and the range filter pushes into the parquet scan.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from numalogic_spark.operators.retention import DEFAULT_POLICY

TIER_WIDTH_S: dict[str, int] = {"1m": 60, "1h": 3600, "1d": 86400}


def route_tier(
    start_s: int,
    end_s: int,
    max_points_per_series: int = 2000,
    now_s: Optional[int] = None,
    policy: Mapping[str, Optional[int]] = DEFAULT_POLICY,
    tier_width_s: Mapping[str, int] = TIER_WIDTH_S,
) -> str:
    """Finest tier that retains [start_s, end_s] and fits the budget.

    Retention check (needs `now_s`; skipped when None): a tier with
    horizon H retains buckets younger than H, so it can serve the range
    only if `now_s - start_s < H`. Budget check: points per series =
    ceil(span / bucket width) <= max_points_per_series. If no tier
    satisfies the budget, the coarsest retained tier is returned (the
    best the cascade can do — callers wanting a hard cap downsample the
    result with M4/LTTB).
    """
    if end_s < start_s:
        raise ValueError(f"empty range: [{start_s}, {end_s}]")
    span = end_s - start_s
    retained = []
    for tier, width in sorted(tier_width_s.items(), key=lambda kv: kv[1]):
        horizon = policy.get(tier, None)
        if now_s is not None and horizon is not None and now_s - start_s >= horizon:
            continue  # tier has already expired part of the range
        retained.append((tier, width))
    if not retained:
        raise ValueError(
            f"no tier retains a range starting at {start_s} under {dict(policy)}"
        )
    for tier, width in retained:
        if -(-span // width) <= max_points_per_series:
            return tier
    return retained[-1][0]  # coarsest retained


def read_routed(
    spark: SparkSession,
    tier_root: str,
    start_s: int,
    end_s: int,
    max_points_per_series: int = 2000,
    now_s: Optional[int] = None,
    policy: Mapping[str, Optional[int]] = DEFAULT_POLICY,
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Read the routed tier from a `tier=`-partitioned layout, range
    filter pushed to the scan. Returns rows of exactly one tier; the
    `tier` partition column is kept so callers can see what served them."""
    tier = route_tier(start_s, end_s, max_points_per_series, now_s, policy)
    df = spark.read.parquet(tier_root)
    return df.filter(
        (F.col("tier") == tier)
        & (F.unix_timestamp(F.col(ts_col)) >= F.lit(int(start_s)))
        & (F.unix_timestamp(F.col(ts_col)) < F.lit(int(end_s)))
    )
