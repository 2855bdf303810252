"""Time-series as-of join.

The join every metrics engine needs and vanilla Spark lacks: attach to
each left row the most recent right row at-or-before its timestamp
(backward as-of) — events to their latest fitted threshold, trades to
quotes, scrapes to config epochs. The reference delegates this to its
TSDB/registry lookups (`ArtifactManager.load` picks the latest fitted
artifact before "now", /root/reference/numalogic/registry/artifact.py);
here it is a first-class distributed operator.

Implementation — the union trick, NOT a range join:
  1. tag left rows (is_left=1) and right rows (is_left=0), union them
     into one frame with nulls for the other side's payload;
  2. one exchange + sort per key on (ts, is_left) — right sorts before
     left at equal timestamps, so a right row AT the left timestamp
     matches (>= semantics, DuckDB/pandas `merge_asof` convention);
  3. one running `last(_r, ignorenulls=True)` over
     (unboundedPreceding, currentRow) carries the latest right row
     forward as a single packed struct (incremental O(n) frame — never
     the O(n²) unboundedFollowing shape; one struct, so a NULL in a
     right payload column can never splice two right rows);
  4. keep the left rows; an optional tolerance nulls matches older than
     `tolerance` seconds.

Scale shape: ONE shuffle of |left| + |right| rows and one sort — the
same cost as a window aggregate, independent of match distances. A
naive `left.ts >= right.ts` range join explodes to the full triangle
(every left row × every earlier right row) before picking the max; at
10^12 left rows that plan is unrunnable. Per-key sort parallelism =
key cardinality (the windows.py salted-chunk note applies: as-of state
crossing a chunk boundary is exactly one row — the latest right row of
the previous chunk).

Right rows must be unique per (key, right_ts) — pre-aggregate if not
(the deterministic-ordering discipline; ties inside the frame would
otherwise make "latest" engine-dependent).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str] = ("source",),
    left_ts: str = "ts_s",
    right_ts: str = "ts_s",
    tolerance_s: Optional[int] = None,
) -> DataFrame:
    """Backward as-of join: left columns + the right payload of the
    latest right row with right_ts <= left_ts per key (prefixed
    `asof_`), plus `asof_ts` (the matched right timestamp; NULL when no
    right row precedes). `tolerance_s` nulls matches older than the
    given age.
    """
    keys = list(key_cols)
    lpay = [c for c in left.columns if c not in keys and c != left_ts]
    rpay = [c for c in right.columns if c not in keys and c != right_ts]
    overlap = set(lpay) & ({f"asof_{c}" for c in rpay} | {"asof_ts"})
    if overlap:
        raise ValueError(f"left columns collide with asof_ outputs: {overlap}")
    # the union/carry machinery owns these temp names; a payload or key
    # column using one would be silently clobbered (or corrupt the sort
    # order) instead of surviving the join — fail loudly up front
    reserved = {"_ts", "_is_left", "_r", "_m"}
    clash = reserved & (set(lpay) | set(rpay) | set(keys))
    if clash:
        raise ValueError(
            f"columns collide with asof internal temp names: {sorted(clash)}"
        )

    # the right side rides as ONE struct so a NULL inside a right payload
    # column can never splice fields from two different right rows
    r_struct = F.struct(
        F.col(right_ts).cast("bigint").alias("ts"),
        *[F.col(c).alias(c) for c in rpay],
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lpay],
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).cast("bigint").alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        r_struct.alias("_r"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    m = F.col("_m")
    if tolerance_s is not None:
        stale = m.isNull() | (F.col("_ts") - m["ts"] > F.lit(int(tolerance_s)))
        m = F.when(stale, F.lit(None)).otherwise(F.col("_m"))
    return carried.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lpay],
        m["ts"].alias("asof_ts"),
        *[m[c].alias(f"asof_{c}") for c in rpay],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    l_id: str = "l_id",
    r_id: str = "r_id",
    l_start: str = "start_s",
    l_end: str = "end_s",
    r_start: str = "start_s",
    r_end: str = "end_s",
    grid_s: int = 3600,
) -> DataFrame:
    """Interval-overlap join: all (left, right) interval pairs sharing a
    key whose CLOSED time ranges intersect (l_start <= r_end AND
    r_start <= l_end).

    The naive formulation is a range join — Spark plans it as a
    per-key cartesian with a post-filter, quadratic in intervals per
    key. Here each interval instead explodes onto the fixed grid cells
    it covers (`sequence(start // grid_s, end // grid_s)`), candidate
    pairs come from an EQUI-join on (key, cell) — shuffle-partitionable,
    AQE-skew-splittable — and are deduped on (key, l_id, r_id) before
    the exact overlap verify. The classic spatial-binning reduction:
    candidates ∝ true overlaps + grid-alignment noise, never n².

    `grid_s` trades duplication for selectivity: intervals spanning k
    cells appear k times pre-dedup, so pick a grid near the typical
    interval length (the same knob as geohash precision). Interval ids
    (`l_id`/`r_id`) must be unique per side within a key.
    """
    keys = list(key_cols)

    def cells(df: DataFrame, sc: str, ec: str) -> Column:
        return F.explode(
            F.sequence(
                (F.col(sc) / F.lit(grid_s)).cast("bigint"),
                (F.col(ec) / F.lit(grid_s)).cast("bigint"),
            )
        )

    la = left.select(
        *keys,
        F.col(l_id).alias("_lid"),
        F.col(l_start).alias("_ls"),
        F.col(l_end).alias("_le"),
        cells(left, l_start, l_end).alias("_cell"),
    )
    ra = right.select(
        *keys,
        F.col(r_id).alias("_rid"),
        F.col(r_start).alias("_rs"),
        F.col(r_end).alias("_re"),
        cells(right, r_start, r_end).alias("_cell"),
    )
    cand = la.join(ra, keys + ["_cell"]).dropDuplicates(keys + ["_lid", "_rid"])
    return (
        cand.filter((F.col("_ls") <= F.col("_re")) & (F.col("_rs") <= F.col("_le")))
        .select(
            *keys,
            F.col("_lid").alias(l_id),
            F.col("_ls").alias("l_start_s"),
            F.col("_le").alias("l_end_s"),
            F.col("_rid").alias(r_id),
            F.col("_rs").alias("r_start_s"),
            F.col("_re").alias("r_end_s"),
        )
    )
