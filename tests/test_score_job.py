"""End-to-end AE scoring job (jobs/score_job.py) via spark-submit:
the job's parquet scores must equal the pure-numpy replay of the
gated-query arithmetic on the same events, artifact-file loading must
round-trip, and the threshold flag must partition the outputs."""

import json
import os
import subprocess
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = "/opt/spark/bin/spark-submit"
EVENTS = "/root/testdata/sf0.001/events.parquet"
L, STRIDE = 8, 4


def _expected_scores(weights) -> pd.DataFrame:
    """Numpy replay of strided_z_windows + the kernel on the events
    table (the arithmetic the driver gate proves against DuckDB)."""
    from numalogic_spark.functions.ae import window_scores_np, zscore_windows_np

    pdf = duckdb.sql(
        f"""SELECT event_type AS source,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                   event_id, CAST(value AS DOUBLE) AS value
            FROM '{EVENTS}' ORDER BY source, ts_s, event_id"""
    ).df()
    rows = []
    for src, g in pdf.groupby("source"):
        vals = g["value"].to_numpy()
        wins, ends = [], []
        for p in range(1, len(vals) + 1):
            if p >= L and (p - L) % STRIDE == 0:
                wins.append(vals[p - L : p])
                ends.append(p - 1)
        if not wins:
            continue
        mean6, emax = window_scores_np(weights, zscore_windows_np(np.asarray(wins)))
        rows.append(
            pd.DataFrame(
                {
                    "source": src,
                    "ts_s": g["ts_s"].to_numpy()[ends],
                    "event_id": g["event_id"].to_numpy()[ends],
                    "err_mean": mean6,
                    "err_max": emax,
                }
            )
        )
    return pd.concat(rows).sort_values(
        ["source", "ts_s", "event_id"], ignore_index=True
    )


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="spark-submit not available")
def test_score_job_end_to_end(tmp_path):
    from numalogic_spark.functions.ae import make_sparse_demo_weights

    zip_path = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", str(zip_path), "numalogic_spark"],
        cwd=REPO, check=True,
    )
    # artifact-file mode: write the frozen JSON and have the job load it
    weights = make_sparse_demo_weights(seq_len=L)
    artifact = tmp_path / "sparse_ae.json"
    artifact.write_text(weights.to_json())
    out = tmp_path / "scores"
    r = subprocess.run(
        [
            SUBMIT, "--master", "local[4]", "--py-files", str(zip_path),
            "jobs/score_job.py",
            "--input", EVENTS, "--output", str(out),
            "--family", "sparse", "--artifact", str(artifact),
            "--stride", str(STRIDE), "--threshold", "0.35",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    exp = _expected_scores(weights)
    assert summary["windows"] == len(exp)
    assert summary["sources"] == exp["source"].nunique()

    got = duckdb.sql(
        f"SELECT * FROM '{out}/*/*.parquet' ORDER BY source, ts_s, event_id"
    ).df()
    np.testing.assert_array_equal(got["err_mean"].to_numpy(), exp["err_mean"].to_numpy())
    np.testing.assert_array_equal(got["err_max"].to_numpy(), exp["err_max"].to_numpy())
    # threshold flag partitions the rows exactly
    assert summary["anomalies"] == int((exp["err_mean"] > 0.35).sum())
    assert (got["is_anomaly"].to_numpy() == (got["err_mean"].to_numpy() > 0.35)).all()


def test_load_weights_rejects_unknown_family():
    from numalogic_spark.operators.score import demo_weights, load_weights

    with pytest.raises(ValueError, match="unknown model family"):
        load_weights("gru", "{}")
    with pytest.raises(ValueError, match="unknown model family"):
        demo_weights("gru", 8)


def test_artifact_roundtrip_every_family():
    from numalogic_spark.operators.score import demo_weights, load_weights

    for family in ("vanilla", "sparse", "conv", "lstm", "transformer", "vae"):
        w = demo_weights(family, 8)
        w2 = load_weights(family, w.to_json())
        assert w2.seq_len == w.seq_len
