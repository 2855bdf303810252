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


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="spark-submit not available")
def test_stream_job_end_to_end(tmp_path):
    """jobs/stream_job.py --once drains a static token dir through the
    watermarked streaming rollup; emitted 1m buckets must agree with the
    batch rollup on every bucket the watermark finalized."""
    import duckdb

    zip_path = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", str(zip_path), "numalogic_spark"],
        cwd=REPO, check=True,
    )
    src = tmp_path / "tokens"
    gen = (
        "import sys; sys.path.insert(0, %r); "
        "from numalogic_spark.session import get_spark; "
        "from numalogic_spark.datagen import gen_tokens_spark; "
        "s = get_spark('gen', cores=2); "
        "gen_tokens_spark(s, 20000, n_sources=5).coalesce(4).write.parquet(%r); s.stop()"
        % (REPO, str(src))
    )
    subprocess.run([sys.executable, "-c", gen], cwd=REPO, check=True, timeout=240)
    out, ckpt = tmp_path / "tier1m", tmp_path / "ckpt"
    r = subprocess.run(
        [
            SUBMIT, "--master", "local[4]", "--py-files", str(zip_path),
            "jobs/stream_job.py", "--input", str(src), "--output", str(out),
            "--checkpoint", str(ckpt), "--once", "--max-files-per-trigger", "2",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json as _json

    summary = _json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["tier_rows"] > 0 and summary["sources"] == 5
    # streamed buckets match the batch aggregate for the same (source, bucket)
    mism = duckdb.sql(
        f"""
        WITH streamed AS (
          SELECT source, bucket_ts, "count" AS cnt, n_tok_sum
          FROM '{out}/*/*.parquet'
        ), batch AS (
          SELECT source, date_trunc('minute', event_ts) AS bucket_ts,
                 count(*) AS cnt, sum(CAST(n_tok AS DOUBLE)) AS n_tok_sum
          FROM '{src}/*.parquet' GROUP BY 1, 2
        )
        SELECT count(*) FROM streamed s JOIN batch b
          USING (source, bucket_ts)
        WHERE s.cnt != b.cnt OR abs(s.n_tok_sum - b.n_tok_sum) > 1e-6
        """
    ).fetchone()[0]
    assert mism == 0


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="spark-submit not available")
def test_diagnostics_job_end_to_end(tmp_path):
    zip_path = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", str(zip_path), "numalogic_spark"],
        cwd=REPO, check=True,
    )
    out = tmp_path / "diag"
    r = subprocess.run(
        [
            SUBMIT, "--master", "local[4]", "--py-files", str(zip_path),
            "jobs/diagnostics_job.py",
            "--input", "/root/testdata/sf0.001/events.parquet",
            "--output", str(out),
        ],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    rows = summary["rows"]
    assert set(rows) == {"acf", "cusum", "hampel", "stl", "holt", "rolling_corr"}
    # per-series shapes: 5 sources, 5 lags; hampel = one row per event
    assert rows["acf"] == 25
    assert rows["cusum"] == 5
    assert rows["hampel"] == 1000
    assert all(v > 0 for v in rows.values())


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="spark-submit not available")
def test_retention_job_end_to_end(tmp_path, spark):
    """Retention/compaction pass: tier table in, retained set (partitioned
    by tier) + per-tier audit out; kept+expired covers the input and the
    retained output matches the audit counts."""
    from pyspark.sql import functions as F

    from numalogic_spark.operators.rollup import RollupConfig, histogram, rollup_tiers_fused

    cfg = RollupConfig(
        source_col="event_type", ts_col="ts", value_col="value",
        integral_values=False, decimal_sum=True,
    )
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tiers_path = tmp_path / "tiers"
    rollup_tiers_fused(histogram(ev, cfg, "minute"), cfg).write.parquet(
        str(tiers_path)
    )
    n_in = spark.read.parquet(str(tiers_path)).count()

    zip_path = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", str(zip_path), "numalogic_spark"],
        cwd=REPO, check=True,
    )
    out = tmp_path / "retained"
    audit = tmp_path / "audit"
    r = subprocess.run(
        [
            SUBMIT, "--master", "local[4]", "--py-files", str(zip_path),
            "jobs/retention_job.py",
            "--input", str(tiers_path), "--output", str(out),
            "--audit", str(audit),
            "--policy", "1m=259200,1h=864000,1d=keep",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["job"] == "retention"
    import duckdb

    kept_total = sum(t["kept"] for t in summary["tiers"].values())
    expired_total = sum(t["expired"] for t in summary["tiers"].values())
    assert kept_total + expired_total == n_in
    (n_out,) = duckdb.sql(f"select count(*) from '{out}/*/*.parquet'").fetchone()
    assert n_out == kept_total
    # tier-partitioned layout (directory-level pruning for tier reads)
    assert any(p.name.startswith("tier=") for p in out.iterdir())
    # daily tier is keep-forever
    assert summary["tiers"]["1d"]["expired"] == 0


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="spark-submit not available")
def test_dedup_job_semantic_stage(tmp_path):
    """jobs/dedup_job.py with --embeddings runs the SemDeDup stage after
    exact + near dedup: the summary accounts for every dropped row and the
    kept corpus excludes the semantically pruned ids."""
    zip_path = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", str(zip_path), "numalogic_spark"],
        cwd=REPO, check=True,
    )
    out = tmp_path / "kept"
    r = subprocess.run(
        [
            SUBMIT, "--master", "local[4]", "--py-files", str(zip_path),
            "jobs/dedup_job.py",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(out),
            "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
            "--emb-id-col", "vec_id",
            "--centroids", "8",
            # the synthetic hash-derived embeddings have low pairwise
            # cosine (see the gated query's note) — 0.35 actually prunes
            "--semantic-threshold", "0.35",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["semantic_dropped"] > 0
    assert (
        summary["rows_kept"]
        == summary["rows_in"]
        - summary["exact_dropped"]
        - summary["near_dup_dropped"]
        - summary["semantic_dropped"]
    )
    import duckdb

    (n,) = duckdb.sql(f"select count(*) from '{out}/*.parquet'").fetchone()
    assert n == summary["rows_kept"] > 0
