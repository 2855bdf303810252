"""Tier routing: budget + retention interplay, and the routed read's
partition pruning over a tier= layout."""

import pandas as pd
import pytest

from numalogic_spark.plans.router import TIER_WIDTH_S, read_routed, route_tier

DAY = 86400
POLICY = {"1m": 7 * DAY, "1h": 90 * DAY, "1d": None}


def test_route_budget_only():
    # 1 hour at 2000 points -> 60 minute buckets fits -> 1m
    assert route_tier(0, 3600, 2000, policy=POLICY) == "1m"
    # 30 days -> 43200 minutes > 2000, 720 hours fits -> 1h
    assert route_tier(0, 30 * DAY, 2000, policy=POLICY) == "1h"
    # 10 years -> hours too many, days fit
    assert route_tier(0, 3650 * DAY, 2000, policy=POLICY) == "1d"


def test_route_retention_overrides_budget():
    now = 1000 * DAY
    # a 1-hour range fits the 1m budget trivially, but 30 days ago the
    # minute tier has already expired -> 1h serves it
    start = now - 30 * DAY
    assert route_tier(start, start + 3600, 2000, now_s=now, policy=POLICY) == "1h"
    # a year back even hours are gone -> 1d
    start = now - 365 * DAY
    assert route_tier(start, start + 3600, 2000, now_s=now, policy=POLICY) == "1d"
    # recent range -> finest
    start = now - DAY
    assert route_tier(start, start + 3600, 2000, now_s=now, policy=POLICY) == "1m"


def test_route_budget_overflow_returns_coarsest():
    # even days blow a 10-point budget over 3 years: coarsest retained wins
    assert route_tier(0, 1000 * DAY, 10, policy=POLICY) == "1d"


def test_route_rejects_bad_inputs():
    with pytest.raises(ValueError):
        route_tier(100, 50)
    with pytest.raises(ValueError):
        # every tier bounded and the range older than all horizons
        route_tier(0, 3600, now_s=10**9, policy={"1m": DAY, "1h": DAY, "1d": DAY})


def test_read_routed_prunes_partition(spark, tmp_path):
    rows = []
    for tier, step, n in (("1m", 60, 600), ("1h", 3600, 400), ("1d", DAY, 40)):
        for i in range(n):
            rows.append((tier, "s0", pd.Timestamp(1700000000 + i * step, unit="s"), float(i)))
    pdf = pd.DataFrame(rows, columns=["tier", "source", "bucket_ts", "val"])
    root = str(tmp_path / "tiers")
    spark.createDataFrame(pdf).write.partitionBy("tier").parquet(root)

    start, end = 1700000000, 1700000000 + 7200
    out = read_routed(spark, root, start, end, max_points_per_series=2000,
                      policy=POLICY)
    got = out.toPandas()
    assert set(got["tier"]) == {"1m"}
    assert len(got) == 120  # two hours of minutes
    # the tier predicate reaches the scan as a partition filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1m" in plan
