"""Round-6 optimization harness: time individual queries / operators in
isolation with the noop sink (guide §1.4), N repeats per target, labelled
jobs. NOT the driver bench — bench.py stays frozen; this file exists so
per-query before/after numbers can be measured without paying the full
bench every iteration.

Usage:
    python bench_extra.py q <name> [<name> ...]   # declared queries
    python bench_extra.py op <target> [...]       # named operator rows
    SPARK_GRAFT_EXTRA_REPS=3 to change repeats (default 2).

Prints one JSON line: {"target": [t1, t2, ...], ...} (seconds, all reps —
first rep is cold, later reps warm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from numalogic_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "2"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "q"
    names = sys.argv[2:]
    main_cores = min(CPUS, 16)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        "bench_extra", cores=main_cores, shuffle_partitions=2 * main_cores,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )

    # python-worker/Arrow warmup, as in bench.py
    def _identity_batches(it):
        yield from it

    _noop(
        spark.range(main_cores * 2)
        .repartition(main_cores)
        .mapInPandas(_identity_batches, "id long")
    )

    out: dict[str, list[float]] = {}

    if mode == "q":
        import __spark_entry__ as E

        qs = E.queries()
        for name in names:
            fn = qs[name]
            reps = []
            for r in range(REPS):
                spark.sparkContext.setJobDescription(f"{name} rep{r}")
                t0 = time.time()
                _noop(fn(spark, SF_DIR))
                reps.append(round(time.time() - t0, 3))
            out[name] = reps
            print(f"# {name}: {reps}", file=sys.stderr, flush=True)
    elif mode == "op":
        for name in names:
            fn = _op_target(spark, name)
            reps = []
            for r in range(REPS):
                spark.sparkContext.setJobDescription(f"{name} rep{r}")
                t0 = time.time()
                fn()
                reps.append(round(time.time() - t0, 3))
            out[name] = reps
            print(f"# {name}: {reps}", file=sys.stderr, flush=True)
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


def _op_target(spark, name: str):
    """Named operator micro-targets mirroring bench.py's extra rows."""
    token_path = _token_path()

    if name == "pack_greedy_skewed_seq" or name == "pack_greedy_skewed_salted":
        from numalogic_spark.operators.tokens import pack_greedy_no_split

        skew = spark.read.parquet(token_path).select(
            F.lit("s0").alias("source"), "doc_id", "n_tok"
        )
        if name.endswith("_seq"):
            return lambda: _noop(pack_greedy_no_split(skew, 2048))
        return lambda: _noop(
            pack_greedy_no_split(skew, 2048, sub_salt=100_000, chunk_by="range")
        )

    if name in ("windows_single_series_seq", "windows_single_series_salted"):
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
        if name.endswith("_seq"):
            return lambda: _noop(sliding_windows(one_series, ["value"], 12, 4))
        return lambda: _noop(
            sliding_windows_salted(one_series, ["value"], 12, 4, chunk_rows=15_625)
        )

    if name in ("minhash_cold", "minhash_warm"):
        from numalogic_spark.operators.dedup import minhash_lsh_pairs

        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        return lambda: _noop(minhash_lsh_pairs(docs, threshold=0.8))

    if name == "dup_ngram_xxh64":
        from numalogic_spark.operators.dedup import duplicate_ngram_spans

        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        return lambda: _noop(duplicate_ngram_spans(docs, n=8, min_docs=2))

    if name == "full_job":
        import bench as B

        return lambda: B.run_full_job(spark, token_path)

    raise SystemExit(f"unknown op target {name!r}")


def _token_path() -> str:
    import bench as B

    sf = B._sf()
    rows = max(int(B.ROWS_PER_SF * sf), 10_000)
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", f"tokens_sf{sf}_r{rows}.parquet"
    )


if __name__ == "__main__":
    main()
