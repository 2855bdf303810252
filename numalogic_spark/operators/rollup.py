"""Continuous-aggregate rollup with cascading retention tiers.

Semantics mirror the reference's Druid granularity rollup — time-bucket
aggregation with count/sum/mean plus an approximate-quantile aggregator
(/root/reference/numalogic/connectors/druid/_druid.py:106-115 granularity
params; aggregators.py:1-22 quantilesDoublesSketch) — except our quantiles
are EXACT: instead of a DataSketch we cascade a *mergeable exact histogram*
(value → count) per bucket, which supports numpy-style linear-interpolation
percentiles at every tier without rescanning raw data.

Plan shape (one raw scan total, all JVM-side):

    raw ─groupBy(source, 1m-bucket, value)→ hist_1m      (partial agg map-side)
        hist_1m ─window+groupBy→ tier_1m (count/sum/mean/p95/rate)
        hist_1m ─groupBy(hour)→ hist_1h ─→ tier_1h
        hist_1h ─groupBy(day)→  hist_1d ─→ tier_1d

The (source, bucket, value) grouping key spreads a hot source across many
reducers (value acts as a natural salt), and partial aggregation collapses
duplicates map-side — this is the skew story for the rollup path; explicit
salting helpers for other paths live in plans/skew.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TIERS: dict[str, tuple[str, int, str]] = {
    # tier name -> (date_trunc unit, bucket seconds, calendar spine step).
    # The spine step for 1d is a CALENDAR day, not 86400s: under a non-UTC
    # session timezone date_trunc('day') buckets are 23/25h apart across
    # DST transitions and a fixed-second spine would miss real buckets.
    "1m": ("minute", 60, "INTERVAL 1 MINUTE"),
    "1h": ("hour", 3600, "INTERVAL 1 HOUR"),
    "1d": ("day", 86400, "INTERVAL 1 DAY"),
}


@dataclass(frozen=True)
class RollupConfig:
    source_col: str = "source"
    ts_col: str = "event_ts"
    value_col: str = "n_tok"
    percentile: float = 0.95
    integral_values: bool = True  # token counts are ints → store sums as long
    # For non-integral values: sum via exact decimal arithmetic so that the
    # result is independent of aggregation order (a distributed engine must
    # not let reducer scheduling change the answer). Value precision in the
    # source data is expected to fit decimal(20,6).
    decimal_sum: bool = False


def bucket(ts_col: str | Column, unit: str) -> Column:
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.date_trunc(unit, c)


def histogram(
    df: DataFrame, cfg: RollupConfig, unit: str, extra_keys: list[str] | None = None
) -> DataFrame:
    """(*extra_keys, source, bucket_ts, v) → cnt — the mergeable exact
    histogram. `extra_keys` carries orthogonal grouping columns (a metric
    name, a manifest bucket id) through the whole cascade."""
    extra_keys = extra_keys or []
    return (
        df.select(
            *[F.col(k) for k in extra_keys],
            F.col(cfg.source_col).alias("source"),
            bucket(cfg.ts_col, unit).alias("bucket_ts"),
            F.col(cfg.value_col).cast("double").alias("v"),
        )
        .groupBy(*extra_keys, "source", "bucket_ts", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_with_fingerprint(
    df: DataFrame,
    cfg: RollupConfig,
    unit: str,
    token_col: str = "tokens",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """histogram() with a per-(source, bucket, v) xor-fingerprint of the
    token arrays folded into the SAME scan — one pass over the raw table
    yields both the rollup input and the raw-tier invariant digest.

    At 10^12 rows the tokens column dominates I/O; computing the invariant
    in a separate pass would read it twice. bit_xor is order-independent
    and mergeable, so the global fingerprint (and any per-partition lineage
    fingerprint for the checkpoint manifest) is a trivial re-aggregation of
    the histogram — see invariant_from_histogram()."""
    extra_keys = extra_keys or []
    return (
        df.select(
            *[F.col(k) for k in extra_keys],
            F.col(cfg.source_col).alias("source"),
            bucket(cfg.ts_col, unit).alias("bucket_ts"),
            F.col(cfg.value_col).cast("double").alias("v"),
            F.xxhash64(token_col).alias("_h"),
        )
        .groupBy(*extra_keys, "source", "bucket_ts", "v")
        .agg(F.count(F.lit(1)).alias("cnt"), F.bit_xor("_h").alias("fp"))
    )


def invariant_from_histogram(hist: DataFrame) -> DataFrame:
    """Global raw-tier invariant (row count, token sum, xor fingerprint)
    from a fingerprinted histogram — no second raw scan. xor of group xors
    == global xor; sum(cnt) == rows; sum(v*cnt) == token sum.

    The token sum multiplies in EXACT long arithmetic (v is an integral
    token count stored as double — cast back before the multiply): a double
    product-sum would shed low-order bits past 2^53 total tokens, and this
    invariant exists precisely to be byte-exact against F.sum(n_tok) on
    the raw tier."""
    return hist.agg(
        F.bit_xor("fp").alias("fp"),
        F.sum("cnt").alias("rows"),
        F.sum(F.col("v").cast("long") * F.col("cnt")).alias("tokens"),
    )


def merge_histogram(hist: DataFrame, unit: str, extra_keys: list[str] | None = None) -> DataFrame:
    """Re-bucket a finer histogram to a coarser tier (pure merge, no raw scan)."""
    extra_keys = extra_keys or []
    return (
        hist.groupBy(*extra_keys, "source", bucket("bucket_ts", unit).alias("bucket_ts"), "v")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _percentile_cols(p: float) -> list[Column]:
    """Exact linear-interpolation percentile over a (v, cnt) histogram.

    Matches numpy.percentile / Spark `percentile` / DuckDB quantile_cont:
    pos = p*(N-1); result = v[floor(pos)] + frac * (v[floor(pos)+1] - v[floor(pos)])
    computed from cumulative counts via window functions (stays in codegen).
    Expects columns: cum (running count ordered by v), total, v, cnt.
    """
    lo = F.floor(F.lit(p) * (F.col("total") - 1)).cast("long")
    hi = F.least(lo + 1, F.col("total") - 1)
    frac = F.lit(p) * (F.col("total") - 1) - lo
    v_lo = F.max(F.when((F.col("cum") - F.col("cnt") <= lo) & (F.col("cum") > lo), F.col("v")))
    v_hi = F.max(F.when((F.col("cum") - F.col("cnt") <= hi) & (F.col("cum") > hi), F.col("v")))
    return [v_lo.alias("_v_lo"), v_hi.alias("_v_hi"), F.max(frac).alias("_frac")]


def _tier_agg(
    hist: DataFrame,
    cfg: RollupConfig,
    keys: list[str],
    tier_col: Column,
    secs_col: Column,
    extra_keys: list[str],
) -> DataFrame:
    """Shared histogram → tier aggregation: window cum/total over `keys`,
    exact-percentile agg, final metric projection. The window partitioning
    matches the groupBy key prefix, so Catalyst reuses one exchange for
    both. `tier_col`/`secs_col` are expressions so the per-tier
    (tier_from_histogram) and fused all-tier (rollup_tiers_fused) paths
    share ONE copy of the percentile/metric semantics."""
    w = Window.partitionBy(*keys).orderBy("v", "cnt")
    enriched = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy(*keys))
    )
    if cfg.decimal_sum and not cfg.integral_values:
        vsum = F.sum(F.col("v").cast("decimal(20,6)") * F.col("cnt")).cast("double")
    else:
        vsum = F.sum(F.col("v") * F.col("cnt"))
    if cfg.integral_values:
        vsum = vsum.cast("long")
    agg = enriched.groupBy(*keys).agg(
        F.sum("cnt").alias("count"),
        vsum.alias("n_tok_sum"),
        *_percentile_cols(cfg.percentile),
    )
    return agg.select(
        *extra_keys,
        "source",
        "bucket_ts",
        tier_col.alias("tier"),
        "count",
        "n_tok_sum",
        (F.col("n_tok_sum") / F.col("count")).alias("n_tok_mean"),
        (F.col("_v_lo") + F.col("_frac") * (F.col("_v_hi") - F.col("_v_lo"))).alias("n_tok_p95"),
        (F.col("n_tok_sum") / secs_col).alias("token_rate"),
    )


def tier_from_histogram(
    hist: DataFrame, cfg: RollupConfig, tier: str, extra_keys: list[str] | None = None
) -> DataFrame:
    """Histogram → continuous-aggregate tier table.

    Output: (*extra_keys, source, bucket_ts, tier, count, n_tok_sum,
    n_tok_mean, n_tok_p95, token_rate)."""
    extra_keys = extra_keys or []
    _, secs, _ = TIERS[tier]
    keys = [*extra_keys, "source", "bucket_ts"]
    return _tier_agg(hist, cfg, keys, F.lit(tier), F.lit(float(secs)), extra_keys)


def rollup_cascade(
    df: DataFrame, cfg: RollupConfig | None = None, extra_keys: list[str] | None = None
) -> dict[str, DataFrame]:
    """Full raw → 1m → 1h → 1d cascade from ONE scan of the raw table.

    Returns {"1m": df, "1h": df, "1d": df}. count/sum/mean re-aggregate
    exactly by construction; p95 is exact at every tier because the
    histogram merge is lossless (reference analog: Druid would re-ingest or
    merge quantile sketches — approximate; we are exact).
    """
    cfg = cfg or RollupConfig()
    h1m = histogram(df, cfg, "minute", extra_keys)
    h1h = merge_histogram(h1m, "hour", extra_keys)
    h1d = merge_histogram(h1h, "day", extra_keys)
    return {
        "1m": tier_from_histogram(h1m, cfg, "1m", extra_keys),
        "1h": tier_from_histogram(h1h, cfg, "1h", extra_keys),
        "1d": tier_from_histogram(h1d, cfg, "1d", extra_keys),
    }


def rollup_tiers_fused(
    h1m: DataFrame, cfg: RollupConfig | None = None, extra_keys: list[str] | None = None
) -> DataFrame:
    """Every retention tier from the minute histogram in ONE exchange and
    ONE window/aggregate chain, as a single frame with a ``tier`` column.

    Row-identical to ``unionByName`` over ``rollup_cascade``'s tiers. The
    cascade shape (1m → 1h → 1d as separate merges) is what an INCREMENTAL
    production pipeline wants — coarse tiers re-derive from stored fine
    histograms without touching raw. For a BATCH job that computes all
    tiers at once, exploding each histogram row into its (tier, bucket)
    memberships replaces three small merge→window→agg job chains with one
    chain over ~3× histogram rows: fewer stage barriers, fewer exchanges,
    and the scheduling latency of five small jobs stops serializing — the
    difference between 0.6 and 0.9 scaling efficiency on short tiers.
    """
    cfg = cfg or RollupConfig()
    extra_keys = extra_keys or []
    tb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("tier"), bucket("bucket_ts", unit).alias("bucket_ts")
                )
                for t, (unit, _, _) in TIERS.items()
            ]
        )
    ).alias("_tb")
    keys = [*extra_keys, "tier", "source", "bucket_ts"]
    h_all = (
        h1m.select(*extra_keys, "source", "v", "cnt", tb)
        .select(
            *extra_keys,
            F.col("_tb.tier").alias("tier"),
            "source",
            F.col("_tb.bucket_ts").alias("bucket_ts"),
            "v",
            "cnt",
        )
        .groupBy(*keys, "v")
        .agg(F.sum("cnt").alias("cnt"))
    )
    secs = F.lit(None).cast("double")
    for t, (_, s, _) in TIERS.items():
        secs = F.when(F.col("tier") == t, F.lit(float(s))).otherwise(secs)
    return _tier_agg(h_all, cfg, keys, F.col("tier"), secs, extra_keys)


def touched_coarse_buckets(
    delta_h1m: DataFrame, tier: str, extra_keys: list[str] | None = None
) -> DataFrame:
    """Distinct (*extra_keys, source, bucket_ts) at `tier` granularity that
    a delta's minute histogram touches — the rewrite set for an incremental
    refresh. Bounded by |distinct (source, coarse bucket)| of the delta
    (e.g. one day of new data touches ≤ 1440·S minute buckets, 24·S hour
    buckets, S day buckets), independent of the stored table's size."""
    extra_keys = extra_keys or []
    unit, _, _ = TIERS[tier]
    return delta_h1m.select(
        *extra_keys, "source", bucket("bucket_ts", unit).alias("bucket_ts")
    ).distinct()


def refresh_histogram(
    stored_h1m: DataFrame,
    delta_h1m: DataFrame,
    extra_keys: list[str] | None = None,
    touched_only: bool = False,
    broadcast_touched: bool = True,
) -> DataFrame:
    """Merge a raw delta's minute histogram into the stored minute
    histogram — the incremental-ingest path of the continuous aggregate.
    The merge is a pure (key, v)-count addition, so late/out-of-order
    delta rows land in their true buckets with no special casing
    (TimescaleDB-style continuous-aggregate refresh; the reference would
    re-ingest into Druid segments — we re-aggregate mergeable state).

    ``touched_only=True`` returns ONLY the minute buckets the delta
    touches — the replacement partitions for a dynamic-partition-overwrite
    write; rows for untouched buckets are never read, shuffled, or
    rewritten. At 10^12 stored rows the work is O(|delta| + |stored
    histogram rows in touched buckets|): the semi-join prunes the stored
    scan to touched partitions (bucket_ts is the storage partition key),
    and the touched set broadcasts (``broadcast_touched``) because it is
    delta-bounded, never table-bounded."""
    extra_keys = extra_keys or []
    keys = [*extra_keys, "source", "bucket_ts"]
    if touched_only:
        touched = touched_coarse_buckets(delta_h1m, "1m", extra_keys)
        if broadcast_touched:
            touched = F.broadcast(touched)
        stored_h1m = stored_h1m.join(touched, on=keys, how="left_semi")
    return (
        stored_h1m.unionByName(delta_h1m)
        .groupBy(*keys, "v")
        .agg(F.sum("cnt").alias("cnt"))
    )


def refresh_tier(
    stored_h1m: DataFrame,
    delta_h1m: DataFrame,
    cfg: RollupConfig | None = None,
    tier: str = "1m",
    extra_keys: list[str] | None = None,
    broadcast_touched: bool = True,
) -> DataFrame:
    """Replacement tier rows for ONLY the coarse buckets a delta touches.

    Semantics: for every (*extra_keys, source, tier-bucket) with at least
    one delta row, recompute the continuous-aggregate point from (stored
    minute histogram restricted to that bucket) ∪ (delta histogram) —
    exactly what a from-scratch rollup over base+delta would produce for
    those buckets, including exact percentiles (the histogram is lossless,
    so refresh ≡ recompute is an identity, not an approximation). Buckets
    the delta does not touch are never read: a daily delta against a
    10^12-row table reads O(|delta| + touched-bucket histogram rows), not
    the table. A job writes the result with dynamic partition overwrite
    keyed by (tier, source/bucket date) and the tier table stays exact."""
    cfg = cfg or RollupConfig()
    extra_keys = extra_keys or []
    unit, _, _ = TIERS[tier]
    touched = touched_coarse_buckets(delta_h1m, tier, extra_keys)
    if broadcast_touched:
        touched = F.broadcast(touched)
    stored_c = stored_h1m.withColumn("_cb", bucket("bucket_ts", unit))
    on = [
        *[stored_c[k] == touched[k] for k in extra_keys],
        stored_c["source"] == touched["source"],
        stored_c["_cb"] == touched["bucket_ts"],
    ]
    relevant = stored_c.join(touched, on=on, how="left_semi").drop("_cb")
    merged = merge_histogram(relevant.unionByName(delta_h1m), unit, extra_keys)
    return tier_from_histogram(merged, cfg, tier, extra_keys)


def refresh_cascade(
    stored_h1m: DataFrame,
    delta: DataFrame,
    cfg: RollupConfig | None = None,
    extra_keys: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Incremental refresh of the whole retention cascade from one delta:
    {"h1m": touched minute-histogram replacement rows, "1m"/"1h"/"1d":
    replacement tier points for the delta-touched buckets at each tier}.
    A minute touched by the delta dirties its enclosing hour and day, and
    the per-tier semi-joins encode exactly that propagation. ONE
    histogram() scan of the delta feeds all four outputs (persist the
    returned delta histogram upstream if materializing all of them)."""
    cfg = cfg or RollupConfig()
    dh1m = histogram(delta, cfg, "minute", extra_keys)
    out: dict[str, DataFrame] = {
        "h1m": refresh_histogram(stored_h1m, dh1m, extra_keys, touched_only=True)
    }
    for tier in TIERS:
        out[tier] = refresh_tier(stored_h1m, dh1m, cfg, tier, extra_keys)
    return out


def rollup_cascade_multi(
    df: DataFrame,
    value_cols: list[str],
    cfg: RollupConfig | None = None,
) -> dict[str, DataFrame]:
    """Multi-metric cascade: unpivot the metric columns into the histogram
    key — one shuffle covers every metric (the reference's wide frames,
    prometheus.py:113-118, become long rows with a `metric` column).

    Output per tier: (source, metric, bucket_ts, tier, count, n_tok_sum,
    n_tok_mean, n_tok_p95, token_rate).
    """
    cfg = cfg or RollupConfig()
    long = df.select(
        F.col(cfg.source_col).alias("source"), F.col(cfg.ts_col).alias("event_ts"),
        *[F.col(c) for c in value_cols],
    ).unpivot(["source", "event_ts"], value_cols, "metric", "n_tok")
    tiers = rollup_cascade(
        long,
        RollupConfig(percentile=cfg.percentile, integral_values=cfg.integral_values,
                     decimal_sum=cfg.decimal_sum),
        extra_keys=["metric"],
    )
    return {
        tier: t.select("source", "metric", "bucket_ts", "tier", "count",
                       "n_tok_sum", "n_tok_mean", "n_tok_p95", "token_rate")
        for tier, t in tiers.items()
    }


def raw_tier(df: DataFrame, cfg: RollupConfig | None = None) -> DataFrame:
    """The raw retention tier: per-event points, token arrays untouched.

    Per-row invariant vs the source (BASELINE.json): token-array equality —
    verified by an anti-join in tests (see tests/test_invariants.py).
    """
    cfg = cfg or RollupConfig()
    return df.select(
        "doc_id", F.col(cfg.source_col).alias("source"), F.col(cfg.ts_col).alias("event_ts"),
        "tokens", F.col(cfg.value_col).alias("n_tok"), F.lit("raw").alias("tier")
    )
