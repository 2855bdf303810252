"""Deterministic HLL sketch: estimate accuracy vs exact, merge =
recompute, and determinism across partitionings."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from numalogic_spark.operators.sketches import hll_distinct, hll_estimate, hll_registers


def _frame(spark, n_groups=4, per_group=(10, 100, 1000, 5000), seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        ids = rng.choice(np.arange(10_000_000), size=per_group[g], replace=False)
        # each id appears 1-3 times: distinct-count must ignore multiplicity
        for i in ids:
            for _ in range(int(rng.integers(1, 4))):
                rows.append((f"g{g}", int(i)))
    pdf = pd.DataFrame(rows, columns=["grp", "uid"])
    return spark.createDataFrame(pdf), {f"g{g}": per_group[g] for g in range(n_groups)}


def test_hll_estimate_within_error(spark):
    df, truth = _frame(spark)
    out = hll_distinct(df, "uid", ["grp"], m=256).toPandas().set_index("grp")
    for g, exact in truth.items():
        est = out.loc[g, "hll_estimate"]
        # 1.04/sqrt(256) ≈ 6.5% standard error; allow 4 sigma
        assert abs(est - exact) / exact < 0.26, (g, est, exact)


def test_hll_small_range_is_near_exact(spark):
    # linear counting regime: tiny cardinalities are almost exact
    df, truth = _frame(spark, per_group=(5, 17, 40, 90))
    out = hll_distinct(df, "uid", ["grp"], m=256).toPandas().set_index("grp")
    for g, exact in truth.items():
        assert abs(out.loc[g, "hll_estimate"] - exact) <= max(2.0, 0.1 * exact)


def test_hll_merge_equals_recompute(spark):
    """Registers merged by MAX across two halves == registers of the
    union — the mergeability that makes the sketch tier-cascadable."""
    df, _ = _frame(spark, per_group=(800, 800, 800, 800))
    a = df.filter(F.col("uid") % 2 == 0)
    b = df.filter(F.col("uid") % 2 == 1)
    ra = hll_registers(a, "uid", ["grp"])
    rb = hll_registers(b, "uid", ["grp"])
    merged = (
        ra.unionByName(rb)
        .groupBy("grp", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    est_merged = (
        hll_estimate(merged, ["grp"]).toPandas().sort_values("grp", ignore_index=True)
    )
    est_full = (
        hll_distinct(df, "uid", ["grp"]).toPandas().sort_values("grp", ignore_index=True)
    )
    assert (est_merged["hll_estimate"] == est_full["hll_estimate"]).all()


def test_hll_partitioning_invariant(spark):
    df, _ = _frame(spark, per_group=(500, 500, 500, 500))
    e1 = (
        hll_distinct(df.repartition(1), "uid", ["grp"])
        .toPandas()
        .sort_values("grp", ignore_index=True)
    )
    e16 = (
        hll_distinct(df.repartition(16), "uid", ["grp"])
        .toPandas()
        .sort_values("grp", ignore_index=True)
    )
    assert (e1["hll_estimate"] == e16["hll_estimate"]).all()


def test_hll_sequential_ids_within_error(spark):
    """The regression the quadratic mixer exists for: sequential integer
    ids (auto-increment shape) must estimate as well as random ids —
    the raw affine char fold measured −59% here."""
    rows = []
    for g, (base, n) in enumerate((( 10_000, 2000), (500_000, 8000))):
        for i in range(base, base + n):
            rows.append((f"g{g}", i))
    pdf = pd.DataFrame(rows, columns=["grp", "uid"])
    out = (
        hll_distinct(spark.createDataFrame(pdf), "uid", ["grp"], m=256)
        .toPandas()
        .set_index("grp")
    )
    for g, exact in (("g0", 2000), ("g1", 8000)):
        est = out.loc[g, "hll_estimate"]
        assert abs(est - exact) / exact < 0.26, (g, est, exact)
