"""End-to-end training-data prep job (jobs/prep_job.py) via spark-submit:
funnel monotonicity, token conservation through packing, pack-size bound."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="spark-submit not available")
def test_prep_job_end_to_end(tmp_path):
    zip_path = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", str(zip_path), "numalogic_spark"],
        cwd=REPO, check=True,
    )
    out = tmp_path / "packs"
    report = tmp_path / "funnel.json"
    r = subprocess.run(
        [
            SUBMIT, "--master", "local[4]", "--py-files", str(zip_path),
            "jobs/prep_job.py",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(out), "--report", str(report),
            "--max-tokens", "128", "--min-words", "3",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    funnel = json.loads(report.read_text())
    # funnel only ever shrinks, and nothing shrinks to zero
    stages = ["input_docs", "after_quality", "after_lang", "after_exact_dedup", "after_near_dedup"]
    vals = [funnel[s] for s in stages]
    assert vals == sorted(vals, reverse=True)
    assert vals[-1] > 0
    # packing conserves every token and respects the pack-size bound
    assert funnel["packed_tokens"] == funnel["total_tokens"] > 0
    import duckdb

    mx, cnt = duckdb.sql(
        f"select max(n_tok), count(*) from '{out}/*/*.parquet'"
    ).fetchone()
    assert cnt == funnel["packs"]
    assert mx <= 128
