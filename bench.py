"""Benchmark harness.

Measures the engine's headline job — full rollup cascade (raw→1m→1h→1d)
+ 1m gap-fill over the deterministic synthetic token table — and the
events-table rollup at $SPARK_GRAFT_SF_DIR scale. Also produces the
BASELINE.json scaling evidence: the same cascade on the same input at two
local parallelism levels (N and 4N cores), reporting throughput at both and
strong-scaling efficiency eff = (thr_4N / thr_N) / 4.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "sec", "queries": {...}, "sf": ...,
   "tokens_per_sec": ..., "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_spark.datagen import gen_tokens_spark
from numalogic_spark.operators.gapfill import gapfill_linear
from numalogic_spark.operators.rollup import RollupConfig, rollup_cascade
from numalogic_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROWS_PER_SF = 6_000_000  # sf0.1 → 600k rows (~0.6B tokens), mirroring lineitem scale


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


def run_cascade(spark, path: str) -> float:
    """Full tier cascade + gap-fill; returns wall seconds."""
    df = spark.read.parquet(path)
    t0 = time.time()
    tiers = rollup_cascade(df, RollupConfig())
    for t in ("1m", "1h", "1d"):
        _noop(tiers[t])
    _noop(gapfill_linear(tiers["1m"], "1m"))
    return time.time() - t0


def main() -> None:
    sf = _sf()
    rows = max(int(ROWS_PER_SF * sf), 10_000)
    token_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", f"tokens_sf{sf}.parquet")
    ensure_token_table(token_path, rows)

    queries: dict[str, float] = {}

    spark = get_spark("bench", cores=CPUS)
    total_tokens = (
        spark.read.parquet(token_path).selectExpr("sum(n_tok) s").collect()[0]["s"]
    )

    queries["tokens_cascade_all_tiers"] = run_cascade(spark, token_path)

    df = spark.read.parquet(token_path)
    t0 = time.time()
    tiers = rollup_cascade(df, RollupConfig())
    _noop(gapfill_linear(tiers["1m"], "1m"))
    queries["tokens_gapfill_1m"] = time.time() - t0

    import __spark_entry__ as E

    for name in ("rollup_1m_events", "rollup_1d_events", "gapfill_1m_events",
                 "stateless_transforms", "difference_transform"):
        fn = E.queries()[name]
        t0 = time.time()
        _noop(fn(spark, SF_DIR))
        queries[name] = time.time() - t0
    spark.stop()

    # scaling evidence: same job, same input, N vs 4N cores
    lo_cores = max(CPUS // 4, 1)
    scaling: dict[str, float] = {}
    for cores, key in ((lo_cores, "n"), (CPUS, "4n")):
        s = get_spark(f"bench_scale_{cores}", cores=cores, shuffle_partitions=max(cores, 8))
        wall = run_cascade(s, token_path)
        scaling[f"wall_sec_{key}_{cores}c"] = wall
        scaling[f"tokens_per_sec_{key}_{cores}c"] = total_tokens / wall
        s.stop()
    thr_n = [v for k, v in scaling.items() if k.startswith("tokens_per_sec_n")][0]
    thr_4n = [v for k, v in scaling.items() if k.startswith("tokens_per_sec_4n")][0]
    scaling["efficiency"] = (thr_4n / thr_n) / (CPUS / lo_cores)

    out = {
        "metric": "rollup_cascade_wall_sec",
        "value": round(queries["tokens_cascade_all_tiers"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf,
        "input_rows": rows,
        "input_tokens": int(total_tokens),
        "tokens_per_sec": round(total_tokens / queries["tokens_cascade_all_tiers"], 1),
        "scaling": {k: round(v, 3) for k, v in scaling.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
