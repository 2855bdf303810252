"""Dump formatted physical plans of the engine's key operators → PLANS.md.

Plan-quality evidence: column pruning at the scan (rollup never reads
`tokens`), filter pushdown, exchange reuse in the tier computation,
broadcast joins for fitted stats, and whole-stage codegen coverage.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from numalogic_spark.datagen import gen_tokens_spark
from numalogic_spark.functions.scalers import fit_stddev_threshold, score_threshold
from numalogic_spark.operators.gapfill import gapfill_linear
from numalogic_spark.operators.rollup import (
    RollupConfig,
    histogram_with_fingerprint,
    rollup_cascade,
    rollup_tiers_fused,
)
from numalogic_spark.session import get_spark


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("plans", cores=2, shuffle_partitions=4)
    path = "/tmp/plans_tokens.parquet"
    gen_tokens_spark(spark, 2_000, n_sources=5).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    sections = []
    tiers = rollup_cascade(df, RollupConfig())
    sections.append(("rollup tier 1m (from one raw scan; NOTE ReadSchema has no `tokens` column — pruned)", grab(tiers["1m"])))
    sections.append(("rollup tier 1d (cascaded histogram merge — no second raw scan)", grab(tiers["1d"])))
    sections.append(("gap-fill 1m (ONE exchange+sort: lead() neighbors, sequence-exploded gap rows)", grab(gapfill_linear(tiers["1m"], "1m"))))
    fused = rollup_tiers_fused(histogram_with_fingerprint(df, RollupConfig(), "minute"), RollupConfig())
    sections.append(("fused all-tier rollup (invariant fingerprint in the same scan; one window chain for 1m/1h/1d)", grab(fused)))

    from numalogic_spark.operators.tokens import sequence_pack_plan, token_frequencies

    sections.append(("corpus token frequencies (partial agg map-side; count-distinct via per-doc array_distinct, never a shuffle-wide distinct)", grab(token_frequencies(df))))
    sections.append(("sequence packing plan (one exchange per source partition: window cumsum + sequence explode)", grab(sequence_pack_plan(df, 2048))))

    stats = fit_stddev_threshold(df, ["n_tok"], by=["source"])
    sections.append(("fitted threshold score (stats joined back via BroadcastHashJoin)", grab(score_threshold(df, stats, ["n_tok"], by=["source"]))))

    filtered = df.filter(F.col("source") == "src_001").select("source", "event_ts", "n_tok")
    sections.append(("filter+projection (PushedFilters reach the parquet scan)", grab(filtered)))

    # round 3: centroid_cosine at production dims — the posexplode
    # long-skinny centroid keeps the plan size independent of `dim`
    # (the inline branch would embed 512 decimal aggregate columns)
    from numalogic_spark.operators.similarity import centroid_cosine

    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 3).alias("label"),
        F.transform(
            F.sequence(F.lit(1), F.lit(512)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 1000.0),
        ).alias("embedding"),
    )
    sections.append((
        "centroid cosine at dim=512 (posexplode long-skinny centroid: map-side partial agg bounds shuffle at n_groups*dim rows; plan size independent of dim)",
        grab(centroid_cosine(emb)),
    ))

    # round 3: NB classifier scoring — model tables ride broadcast joins,
    # the only shuffle is the per-doc decimal sum
    from numalogic_spark.operators.classify import nb_score, nb_train

    docs = spark.createDataFrame(
        [(f"d{i}", ["alpha", "beta", "gamma"][i % 3], f"alpha beta w{i} gamma")
         for i in range(60)],
        "doc_id string, label string, text string",
    )
    priors, lik = nb_train(docs, max_vocab=100)
    sections.append((
        "NB classifier scoring (both model tables BroadcastHashJoin; one exchange for the per-doc decimal sum)",
        grab(nb_score(docs, priors, lik)),
    ))

    # round 4: time-series feature operators — every one rides a single
    # exchange on the series key; re-aggregations reuse that partitioning
    from numalogic_spark.operators.tsfeatures import (
        acf,
        cusum_changepoint,
        hampel_filter,
        stl_lite,
    )

    ev = spark.range(5000).select(
        (F.col("id") % 5).cast("string").alias("source"),
        (F.col("id") * 60).alias("ts_s"),
        F.col("id").alias("event_id"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 10.0).alias("value"),
    )
    sections.append((
        "ACF lags 1/2/3/6/12 (ONE exchange on source: every lag column from the same sort, decimal moments partial-agg map-side, stack unpivot adds no shuffle)",
        grab(acf(ev)),
    ))
    sections.append((
        "CUSUM change-point (running decimal sum + moments reuse one exchange; per-series stats come back as BroadcastHashJoin; argmax is a second sort, not a second exchange)",
        grab(cusum_changepoint(ev)),
    ))
    sections.append((
        "Hampel filter (rolling sorted-array median/MAD as JVM HOFs over one window sort; no Python, no second exchange)",
        grab(hampel_filter(ev)),
    ))
    hourly = ev.groupBy("source", (F.col("ts_s") - F.col("ts_s") % 3600).alias("bucket_s")).agg(
        F.sum("value").alias("val")
    )
    sections.append((
        "STL-lite decomposition (trend from one window sort; seasonal fit is a tiny source*phase table joined back twice via BroadcastHashJoin)",
        grab(stl_lite(hourly)),
    ))

    # round 4 second wave: histogram-statistics + drift + pair operators
    from numalogic_spark.operators.tsfeatures import (
        ccf_pairs,
        pot_threshold,
        series_summary,
    )

    sections.append((
        "series summary (distinct-value histogram: one groupBy + a tiny per-series window; quantiles/mean/std read off the histogram, never a row-level sort)",
        grab(series_summary(ev)),
    ))
    sections.append((
        "POT/GPD extreme-value threshold (histogram quantile u broadcast back; exceedance moments are one partial-agg groupBy; fit is a closed-form projection)",
        grab(pot_threshold(ev)),
    ))
    sections.append((
        "CCF pair cross-correlation (lag explode + time-shift equi-join — no per-series sort; moments partial-aggregate on (pair, lag))",
        grab(ccf_pairs(hourly)),
    ))

    # round 4: bigram-LM perplexity — vocab and model ride broadcasts,
    # the corpus is tokenized exactly once
    from numalogic_spark.operators.lm import bigram_perplexity

    docs = spark.createDataFrame(
        [(f"d{i}", " ".join(f"w{(i * 7 + j) % 50}" for j in range(30)))
         for i in range(200)],
        "doc_id string, text string",
    )
    sections.append((
        "bigram-LM perplexity (vocab + model BroadcastHashJoin; bigrams formed JVM-side from the persisted word arrays; scoring join shuffles only per-doc bigram counts)",
        grab(bigram_perplexity(docs, vocab_size=50, checkpoint=False)),
    ))

    # round 4 third wave: counter semantics, downsampling, as-of, sketch
    from numalogic_spark.operators.joins import asof_join_backward
    from numalogic_spark.operators.promql import (
        counter_rate,
        m4_downsample,
        sessionize,
    )
    from numalogic_spark.operators.sketches import hll_distinct

    sections.append((
        "counter rate/increase/resets (ONE exchange: lag window + reset-adjusted deltas + map-side bucket agg on the same partitioning)",
        grab(counter_rate(ev)),
    ))
    sections.append((
        "M4 downsample (ONE exchange of partial struct-extremes — 4 points per pixel shuffle, not rows)",
        grab(m4_downsample(ev)),
    ))
    right = hourly.select("source", (F.col("bucket_s") + 3600).alias("rt"), "val")
    sections.append((
        "as-of join (union + one sort; running last(struct) carry — no range-join triangle)",
        grab(asof_join_backward(ev.select("source", "ts_s", "event_id", "value"), right, right_ts="rt")),
    ))
    sections.append((
        "HLL distinct sketch (register groupBy partial-aggregates map-side; dense grid is groups x broadcast literals)",
        grab(hll_distinct(ev.select("source", "ts_s", (F.col("event_id") % 100).alias("uid")), "uid", ["source"])),
    ))
    sections.append((
        "sessionize (boundary lag + running session ids off one sort; per-session agg map-side combinable)",
        grab(sessionize(ev.select(F.col("source").alias("user_id"), "ts_s", "event_id", "value"))),
    ))

    # round 4 fourth wave: selection + sketch + interval operators
    from numalogic_spark.operators.joins import interval_overlap_join
    from numalogic_spark.operators.lm import pmi_collocations
    from numalogic_spark.operators.sampling import quantile_transform
    from numalogic_spark.operators.sketches import cms_sketch

    sections.append((
        "PMI collocations (one tokenize pass; marginals re-aggregated from persisted joint; top-k = TakeOrderedAndProject, no global rank window)",
        grab(pmi_collocations(docs.withColumnRenamed("label", "source"), min_count=2, top_k=20)),
    ))
    iv_l = ev.select("source", F.col("event_id").alias("lid"),
                     F.col("ts_s").alias("start_s"), (F.col("ts_s") + 1000).alias("end_s")).limit(500)
    iv_r = ev.select("source", F.col("event_id").alias("rid"),
                     (F.col("ts_s") + 500).alias("start_s"), (F.col("ts_s") + 1500).alias("end_s")).limit(500)
    sections.append((
        "interval-overlap join (grid-cell explode -> equi-join -> pair dedup -> exact verify; no per-key cartesian)",
        grab(interval_overlap_join(iv_l, iv_r, key_cols=("source",), l_id="lid", r_id="rid", grid_s=1000)),
    ))
    sections.append((
        "CMS sketch build (depth-cell explode partial-aggregates map-side; weighted input hashes once per distinct item)",
        grab(cms_sketch(ev.select("source", (F.col("event_id") % 50).cast("string").alias("item")), "item", ["source"])),
    ))
    sections.append((
        "quantile transform (one exchange + sort per group; percent_rank over the same partitioning)",
        grab(quantile_transform(ev.select("source", "event_id", "value"), "value", ("source",))),
    ))

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("# Physical plans of key operators (`.explain(\"formatted\")`)\n\n")
        f.write("Generated by tools/explain_plans.py on the synthetic token table.\n")
        for title, text in sections:
            f.write(f"\n## {title}\n\n```\n{text}\n```\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
