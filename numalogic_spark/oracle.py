"""Pure pandas/numpy oracle for the rollup engine.

Independent re-implementation of the rollup/gap-fill semantics (and of the
reference's transform formulas where tests need them) used by pytest to
verify the Spark plans. numpy.percentile(linear) is the quantile ground
truth — the engine's histogram cascade must match it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_FREQ = {"1m": "min", "1h": "h", "1d": "D"}
_SECS = {"1m": 60, "1h": 3600, "1d": 86400}


def rollup_oracle(df: pd.DataFrame, tier: str, value_col: str = "n_tok", p: float = 0.95) -> pd.DataFrame:
    """Per (source, bucket) count/sum/mean/p-quantile/rate, from raw."""
    secs = _SECS[tier]
    g = df.assign(bucket_ts=df["event_ts"].dt.floor(_FREQ[tier]))
    out = (
        g.groupby(["source", "bucket_ts"])[value_col]
        .agg(
            count="count",
            n_tok_sum="sum",
            n_tok_mean="mean",
            n_tok_p95=lambda s: float(np.percentile(s.to_numpy(dtype=float), p * 100)),
        )
        .reset_index()
    )
    out["tier"] = tier
    out["count"] = out["count"].astype("int64")
    out["n_tok_sum"] = out["n_tok_sum"].astype("int64")
    out["n_tok_mean"] = out["n_tok_sum"] / out["count"]
    out["token_rate"] = out["n_tok_sum"] / float(secs)
    return out[
        ["source", "bucket_ts", "tier", "count", "n_tok_sum", "n_tok_mean", "n_tok_p95", "token_rate"]
    ].sort_values(["source", "bucket_ts"], ignore_index=True)


def gapfill_oracle(tier_pdf: pd.DataFrame, tier: str, metric_cols: list[str] | None = None) -> pd.DataFrame:
    """Dense per-source spine + linear interpolation (matches operators.gapfill)."""
    metric_cols = metric_cols or ["count", "n_tok_sum", "n_tok_mean", "n_tok_p95", "token_rate"]
    out = []
    for src, g in tier_pdf.groupby("source"):
        g = g.sort_values("bucket_ts")
        spine = pd.date_range(g["bucket_ts"].min(), g["bucket_ts"].max(), freq=_FREQ[tier])
        r = g.set_index("bucket_ts").reindex(spine)
        filled = r[metric_cols].astype(float).interpolate(method="index")
        filled["source"] = src
        filled["tier"] = tier
        filled["is_interpolated"] = r[metric_cols[0]].isna()
        filled = filled.rename_axis("bucket_ts").reset_index()
        out.append(filled)
    res = pd.concat(out, ignore_index=True)
    return res[
        ["source", "bucket_ts", "tier", *metric_cols, "is_interpolated"]
    ].sort_values(["source", "bucket_ts"], ignore_index=True)
