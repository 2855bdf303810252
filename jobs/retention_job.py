"""spark-submit entrypoint: retention/compaction pass over tier tables.

The expiry half of the rollup engine: read the unified tier table,
apply the retention ladder (raw minutes age out first, daily points kept
forever), rewrite the retained set (the "compaction" output a lakehouse
job would commit in place of the old files), and write the per-tier
expiry audit alongside — the lineage/metrics discipline the manifest
uses, applied to deletion.

Usage:

    zip -r dist/numalogic_spark.zip numalogic_spark
    spark-submit --master local[8] \
        --py-files dist/numalogic_spark.zip \
        jobs/retention_job.py --input <tier path> --output <retained path> \
        --audit <audit path> [--policy 1m=604800,1h=7776000,1d=keep] \
        [--now-s <epoch>]

Prints a one-line JSON summary (per-tier kept/expired).
"""

from __future__ import annotations

import argparse
import json
import time

from numalogic_spark.operators.retention import (
    DEFAULT_POLICY,
    apply_retention,
    retention_summary,
)
from numalogic_spark.session import get_spark


def parse_policy(spec: str) -> dict:
    """"1m=604800,1h=7776000,1d=keep" → {"1m": 604800, ..., "1d": None}."""
    out = {}
    for part in spec.split(","):
        tier, _, horizon = part.partition("=")
        if not tier or not horizon:
            raise ValueError(f"bad policy entry: {part!r}")
        out[tier.strip()] = None if horizon.strip() == "keep" else int(horizon)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--audit", required=True)
    ap.add_argument("--policy", default=None)
    ap.add_argument("--now-s", type=int, default=None)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    policy = parse_policy(args.policy) if args.policy else dict(DEFAULT_POLICY)
    spark = get_spark("retention_job", cores=args.cores)
    t0 = time.time()
    tiers = spark.read.parquet(args.input)
    retained = apply_retention(tiers, policy, now_s=args.now_s)
    # partition the compacted output by tier: the next retention pass
    # (and every tier-scoped read) prunes at the directory level
    retained.write.mode("overwrite").partitionBy("tier").parquet(args.output)
    audit = retention_summary(tiers, policy, now_s=args.now_s)
    audit.write.mode("overwrite").parquet(args.audit)
    rows = {
        r["tier"]: {"kept": r["kept"], "expired": r["expired"]}
        for r in spark.read.parquet(args.audit).collect()
    }
    print(
        json.dumps(
            {
                "job": "retention",
                "policy": {k: (v if v is not None else "keep") for k, v in policy.items()},
                "tiers": rows,
                "wall_sec": round(time.time() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
