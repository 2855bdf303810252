"""Skew handling: salted repartitioning + hot-key detection.

The reference never faces skew (one series per message by construction;
SURVEY §4 "Skew handling" row); at 10^12 rows a Zipf-hot `source` (our
datagen gives src_000 ~30% of all rows) would pin one reducer. Strategy:

- rollup path: the histogram groupBy key (source, bucket_ts, v) already
  spreads hot sources across reducers (value+bucket act as natural salt)
  and partial aggregation collapses map-side — nothing extra needed.
- generic shuffles (e.g. repartition before window kernels or writes):
  `salted_repartition` adds an explicit deterministic salt derived from a
  row id so one source's rows land on `salt_buckets` reducers.
- joins: AQE skew-join splitting is enabled in session.py
  (spark.sql.adaptive.skewJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_col: str, salt_buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, salt_buckets) from a stable row id."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets)))


def salted_repartition(
    df: DataFrame, key_cols: list[str], id_col: str, salt_buckets: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Repartition on (keys..., salt) so a hot key spreads over
    `salt_buckets` partitions instead of one."""
    salted = with_salt(df, id_col, salt_buckets)
    cols = [F.col(c) for c in key_cols] + [F.col("_salt")]
    out = salted.repartition(num_partitions, *cols) if num_partitions else salted.repartition(*cols)
    return out.drop("_salt")


def hot_keys(df: DataFrame, key_col: str, threshold: float = 0.2, sample_fraction: float | None = None) -> list[str]:
    """Keys holding more than `threshold` of (sampled) rows — candidates for
    salting. Sampling keeps detection O(small) at full scale."""
    probe = df.sample(sample_fraction, seed=42) if sample_fraction else df
    counts = probe.groupBy(key_col).count()
    total = probe.count()
    if total == 0:
        return []
    hot = counts.filter(F.col("count") > threshold * total).select(key_col).collect()
    return [r[0] for r in hot]
