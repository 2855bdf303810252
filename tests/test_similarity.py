import numpy as np
import pandas as pd
import pytest

from numalogic_spark.operators.similarity import (
    brute_force_topk,
    knn_join,
    lsh_bucketed_ann,
    score_all,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((400, 32)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(400, dtype=np.int64), "embedding": list(x), "label": np.arange(400) % 4}
    )
    return spark.createDataFrame(pdf), x


def _np_cos(x, q):
    return (x @ q) / (np.linalg.norm(x, axis=1) * np.linalg.norm(q))


def test_score_all_matches_numpy(vecs):
    df, x = vecs
    q = x[0].astype(float).tolist()
    got = score_all(df, q).orderBy("id").toPandas()
    np.testing.assert_allclose(got["cos_sim"], _np_cos(x.astype(float), np.asarray(q)), rtol=1e-6)


def test_brute_force_topk(vecs):
    df, x = vecs
    q = x[0].astype(float).tolist()
    got = brute_force_topk(df, q, k=10).toPandas()
    cos = _np_cos(x.astype(float), np.asarray(q))
    exp_ids = np.argsort(-cos, kind="stable")[:10]
    assert got["id"].tolist() == exp_ids.tolist()
    assert got["cos_sim"].iloc[0] == pytest.approx(1.0)  # query is vec 0 itself


def test_lsh_ann_recall(vecs):
    df, x = vecs
    q = x[0].astype(float).tolist()
    cos = _np_cos(x.astype(float), np.asarray(q))
    exact = set(np.argsort(-cos, kind="stable")[:10].tolist())
    got = lsh_bucketed_ann(df, q, k=10, n_planes=8, multiprobe_hamming=2).toPandas()
    recall = len(set(got["id"].tolist()) & exact) / 10
    assert recall >= 0.4  # ANN: probes 37/256 buckets, near vectors collide w.h.p.
    assert 0 in got["id"].tolist()  # the query itself is always found
    # scores of returned candidates are exact
    for _, r in got.iterrows():
        np.testing.assert_allclose(r["cos_sim"], cos[int(r["id"])], rtol=1e-6)


def test_ivf_ann_recall(vecs):
    from numalogic_spark.operators.similarity import ivf_ann_topk, ivf_train_centroids

    df, x = vecs
    cents = ivf_train_centroids(df, n_centroids=8, sample_rows=400, seed=42)
    assert cents.shape == (8, 32)
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, rtol=1e-9)
    # deterministic across calls
    cents2 = ivf_train_centroids(df, n_centroids=8, sample_rows=400, seed=42)
    np.testing.assert_array_equal(cents, cents2)

    q = x[0].astype(float).tolist()
    cos = _np_cos(x.astype(float), np.asarray(q))
    exact = set(np.argsort(-cos, kind="stable")[:10].tolist())
    got = ivf_ann_topk(df, q, cents, k=10, nprobe=4).toPandas()
    recall = len(set(got["id"].tolist()) & exact) / 10
    assert recall >= 0.5  # probing half the lists
    assert 0 in got["id"].tolist()
    for _, r in got.iterrows():
        np.testing.assert_allclose(r["cos_sim"], cos[int(r["id"])], rtol=1e-6)


def test_ivf_robust_to_null_and_zero_vectors(spark):
    """Review findings: NULL/zero embeddings must not crash training or
    NaN-poison centroids; precomputed list_col path must match on-the-fly."""
    from numalogic_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_assign_expr,
        ivf_train_centroids,
    )

    rng = np.random.default_rng(0)
    vecs = [rng.standard_normal(8).astype(np.float32) for _ in range(50)]
    vecs[3] = None
    vecs[7] = np.zeros(8, dtype=np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64), "embedding": vecs})
    df = spark.createDataFrame(pdf)
    cents = ivf_train_centroids(df, n_centroids=4, sample_rows=100)
    assert not np.isnan(cents).any()
    q = [float(x) for x in vecs[0]]
    got = ivf_ann_topk(df, q, cents, k=5, nprobe=2).toPandas()
    assert got["id"].iloc[0] == 0
    pre = df.withColumn("ivf_list", ivf_assign_expr("embedding", cents))
    got2 = ivf_ann_topk(pre, q, cents, k=5, nprobe=2, list_col="ivf_list").toPandas()
    assert got["id"].tolist() == got2["id"].tolist()
    with pytest.raises(ValueError, match="no non-null"):
        empty = spark.createDataFrame(
            pd.DataFrame({"vec_id": [0], "embedding": [np.zeros(8, dtype=np.float32)]})
        )
        ivf_train_centroids(empty, n_centroids=2)


def test_large_dim_kernel_paths(spark):
    """Above _LITERAL_BUDGET the SRP/IVF bucketing switches from literal
    expression trees to the Arrow matmul kernel: recall must hold at
    dim=256 / 16 planes / 64 centroids, the two paths must agree where both
    are computable, and the plan must stay bounded (literal trees at big
    dims blow up codegen and plan serialization)."""
    from numalogic_spark.operators.similarity import (
        _LITERAL_BUDGET,
        ivf_ann_topk,
        ivf_assign_expr,
        ivf_train_centroids,
        lsh_bucketed_ann,
        srp_bucket_expr,
        _hyperplanes,
    )

    dim, n, n_planes, n_cents = 256, 300, 16, 64
    assert n_planes * dim > _LITERAL_BUDGET and n_cents * dim > _LITERAL_BUDGET
    rng = np.random.default_rng(7)
    x = rng.standard_normal((n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(x)})
    df = spark.createDataFrame(pdf)
    q = x[0].astype(float).tolist()
    cos = _np_cos(x.astype(float), np.asarray(q))
    exact = set(np.argsort(-cos, kind="stable")[:10].tolist())

    got = lsh_bucketed_ann(df, q, k=10, n_planes=n_planes, multiprobe_hamming=2).toPandas()
    assert 0 in got["id"].tolist()

    cents = ivf_train_centroids(df, n_centroids=n_cents, sample_rows=n, seed=42)
    assert cents.shape == (n_cents, dim) and not np.isnan(cents).any()
    got_ivf = ivf_ann_topk(df, q, cents, k=10, nprobe=16).toPandas()
    recall = len(set(got_ivf["id"].tolist()) & exact) / 10
    assert recall >= 0.5
    assert got_ivf["id"].iloc[0] == 0

    # kernel assignment == numpy argmax reference
    assigned = df.withColumn("lst", ivf_assign_expr("embedding", cents)).orderBy("vec_id").toPandas()
    exp_assign = (x.astype(float) @ cents.T).argmax(axis=1)
    np.testing.assert_array_equal(assigned["lst"].to_numpy(), exp_assign)

    # plan stays bounded: the kernel ships the matrix inside the UDF, not
    # as k*dim literal expression nodes
    planes = _hyperplanes(dim, n_planes, 42)
    bucketed = df.withColumn("b", srp_bucket_expr("embedding", planes))
    plan = bucketed._jdf.queryExecution().toString()
    assert len(plan) < 50_000, f"plan exploded: {len(plan)} chars"


def test_ivf_build_index(vecs):
    """Index build: codebook trained once + list assignment attached; the
    list_col probe path returns the same answer as on-the-fly assignment."""
    from numalogic_spark.operators.similarity import ivf_ann_topk, ivf_build_index

    df, x = vecs
    cents, indexed = ivf_build_index(df, n_centroids=8, sample_rows=400, seed=42)
    assert "ivf_list" in indexed.columns
    lists = indexed.select("ivf_list").distinct().count()
    assert 1 < lists <= 8
    q = x[0].astype(float).tolist()
    via_index = ivf_ann_topk(indexed, q, cents, k=10, nprobe=4, list_col="ivf_list").toPandas()
    on_the_fly = ivf_ann_topk(df, q, cents, k=10, nprobe=4).toPandas()
    assert via_index["id"].tolist() == on_the_fly["id"].tolist()


def test_knn_join_blocked(vecs):
    df, x = vecs
    got = knn_join(df, df, k=3, block_col="label").toPandas()
    assert (got.groupby("lid").size() == 3).all()
    # verify one group against numpy
    xd = x.astype(float)
    lid = 0
    blk = np.where(np.arange(400) % 4 == 0)[0]
    cos = _np_cos(xd[blk], xd[lid])
    order = blk[np.argsort(-cos, kind="stable")]
    exp = [i for i in order if i != lid][:3]
    g = got[got["lid"] == lid].sort_values("rank")["rid"].tolist()
    assert g == exp


def test_centroid_cosine_matches_numpy(spark):
    """Per-group centroid cosine vs a numpy oracle, including an outlier
    that scores far below its group's inliers."""
    import numpy as np
    import pandas as pd

    from numalogic_spark.operators.similarity import centroid_cosine

    rng = np.random.default_rng(7)
    base = rng.normal(size=(2, 8))
    rows = []
    for g in range(2):
        for i in range(10):
            rows.append((f"v{g}_{i}", g, (base[g] + 0.05 * rng.normal(size=8)).astype("float32")))
    rows.append(("outlier", 0, (-base[0]).astype("float32")))  # anti-aligned
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    pdf["embedding"] = pdf["embedding"].map(list)
    df = spark.createDataFrame(pdf, "vec_id string, label int, embedding array<float>")
    got = centroid_cosine(df).toPandas().set_index("vec_id")

    embs = {r[0]: np.asarray(r[2], dtype=np.float64) for r in rows}
    for g in (0, 1):
        members = [k for k, (_, gg, _) in zip(pdf["vec_id"], rows) if gg == g]
        cent = np.mean([embs[m] for m in members], axis=0)
        for m in members:
            v = embs[m]
            exp = float(v @ cent / (np.linalg.norm(v) * np.linalg.norm(cent)))
            assert abs(got.loc[m, "cos_to_centroid"] - exp) < 1e-9, m
    inliers = [f"v0_{i}" for i in range(10)]
    assert got.loc["outlier", "cos_to_centroid"] < min(got.loc[m, "cos_to_centroid"] for m in inliers) - 0.5


def test_centroid_cosine_high_dim_exploded_path(spark):
    """dim > _CENTROID_INLINE_DIMS must flip to the posexplode long-skinny
    centroid: bit-identical scores to the inline-branch numerics, and a plan
    whose size is bounded (no per-dim aggregate expression blowup)."""
    import numpy as np
    import pandas as pd

    from numalogic_spark.operators import similarity as S

    dim = 512
    assert dim > S._CENTROID_INLINE_DIMS
    rng = np.random.default_rng(11)
    x = rng.standard_normal((60, dim)).astype(np.float32)
    pdf = pd.DataFrame(
        {
            "vec_id": [f"v{i}" for i in range(60)],
            "label": np.arange(60) % 3,
            "embedding": [r.tolist() for r in x],
        }
    )
    df = spark.createDataFrame(pdf, "vec_id string, label int, embedding array<float>")

    got = S.centroid_cosine(df)
    # bounded plan: the analyzed string must not scale with dim (the old
    # inline branch embedded `dim` decimal aggregate columns ~100 chars each)
    plan = got._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 20_000, f"plan string {len(plan)} chars — per-dim blowup"
    got_pd = got.toPandas().set_index("vec_id")["cos_to_centroid"]

    # bit-identical to the inline branch run on the same data
    try:
        S._CENTROID_INLINE_DIMS = 10_000
        inline_pd = (
            S.centroid_cosine(df).toPandas().set_index("vec_id")["cos_to_centroid"]
        )
    finally:
        S._CENTROID_INLINE_DIMS = 256
    assert (got_pd.sort_index().to_numpy() == inline_pd.sort_index().to_numpy()).all()

    # and correct vs a numpy oracle
    x64 = x.astype(np.float64)
    for g in range(3):
        m = pdf["label"].to_numpy() == g
        cent = x64[m].mean(axis=0)
        exp = x64[m] @ cent / (np.linalg.norm(x64[m], axis=1) * np.linalg.norm(cent))
        ids = pdf["vec_id"][m].tolist()
        np.testing.assert_allclose(got_pd.loc[ids].to_numpy(), exp, atol=1e-9)


def test_ivf_auto_presample_bounds_training_scan(spark):
    """Above auto_presample_rows the training plan must contain a Sample
    below the top-k, so the hash-order stage sees a bounded stream; below
    the threshold (and on the portable/replayable path) it must not."""
    import numpy as np
    import pandas as pd

    from numalogic_spark.operators import similarity as S

    rng = np.random.default_rng(2)
    x = rng.standard_normal((300, 16))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(300), "embedding": [r.tolist() for r in x]})
    )

    captured = {}
    orig_sample = type(df).sample

    def spy(self, *a, **kw):
        captured["fraction"] = kw.get("fraction", a[0] if a else None)
        return orig_sample(self, *a, **kw)

    type(df).sample = spy
    try:
        # corpus (300) > threshold (100): auto presample kicks in
        c1 = S.ivf_train_centroids(df, n_centroids=4, sample_rows=2,
                                   auto_presample_rows=100)
        assert 0 < captured["fraction"] <= 1.0
        assert captured["fraction"] == min(1.0, 50.0 * 2 / 300)
        captured.clear()
        # below threshold: no sample inserted
        S.ivf_train_centroids(df, n_centroids=4, sample_rows=2,
                              auto_presample_rows=1000)
        assert "fraction" not in captured
        # replayable portable path never auto-presamples
        S.ivf_train_centroids(df, n_centroids=4, sample_rows=2,
                              portable_order_id="vec_id",
                              auto_presample_rows=100)
        assert "fraction" not in captured
        # DERIVED frame (filter lineage over a real scan — a filter over a
        # LocalRelation is folded away by ConvertToLocalRelation, so use
        # parquet): no automatic count — a count on a non-plain scan is a
        # full job, so auto-presample is opt-in...
        derived = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
            "vec_id % 2 = 0"
        )
        S.ivf_train_centroids(derived, n_centroids=4, sample_rows=2,
                              auto_presample_rows=100)
        assert "fraction" not in captured
        # ...via row_count_hint, which sizes the fraction without any count
        S.ivf_train_centroids(derived, n_centroids=4, sample_rows=2,
                              auto_presample_rows=100, row_count_hint=300)
        assert captured["fraction"] == min(1.0, 50.0 * 2 / 300)
    finally:
        type(df).sample = orig_sample
    # and the presampled codebook still trains something usable
    assert c1.shape[1] == 16


def test_codebook_save_load_roundtrip(tmp_path):
    import numpy as np

    from numalogic_spark.operators.similarity import load_codebook, save_codebook

    c = np.random.default_rng(0).standard_normal((8, 32))
    p = str(tmp_path / "codebook.json")
    save_codebook(p, c)
    got = load_codebook(p)
    assert got.shape == c.shape
    assert (got == c).all()  # exact (hex) roundtrip


def test_centroid_cosine_ragged_vectors_branch_parity(spark):
    """Ragged vectors (shorter than the inferred dim): the exploded branch
    must divide by the GROUP row count like the inline branch, so both
    yield identical scores (review finding round 3)."""
    import numpy as np
    import pandas as pd

    from numalogic_spark.operators import similarity as S

    rows = [
        ("a", 0, [1.0, 2.0, 3.0, 4.0]),
        ("b", 0, [3.0]),            # ragged
        ("c", 0, [2.0, 1.0]),       # ragged
        ("d", 1, [1.0, 1.0, 1.0, 1.0]),
        ("e", 1, [2.0, 0.0, 2.0]),  # ragged
        ("f", 2, [1.0, 2.0]),       # group 2: EVERY vector shorter than dim
        ("g", 2, [2.0, 4.0]),       # (inline yields NULL cosines; branches
                                    # must agree on that too)
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    df = spark.createDataFrame(pdf, "vec_id string, label int, embedding array<double>")
    inline = S.centroid_cosine(df).toPandas().set_index("vec_id")["cos_to_centroid"]
    try:
        S._CENTROID_INLINE_DIMS = 0  # force the exploded branch
        exploded = S.centroid_cosine(df).toPandas().set_index("vec_id")["cos_to_centroid"]
    finally:
        S._CENTROID_INLINE_DIMS = 256
    got, exp = exploded.sort_index().to_numpy(), inline.sort_index().to_numpy()
    assert (got == exp).all() or np.allclose(got, exp, atol=0, rtol=0, equal_nan=True)


class TestPca:
    def test_project_matches_numpy_and_properties(self, spark):
        import numpy as np
        import pandas as pd

        from numalogic_spark.operators.similarity import (
            pca_fit_numpy,
            pca_project,
            pca_train,
        )

        rng = np.random.default_rng(7)
        # anisotropic cloud: variance concentrated along two directions
        basis = rng.normal(size=(8, 8))
        scales = np.array([10.0, 5.0, 1.0, 0.5, 0.3, 0.2, 0.1, 0.05])
        x = rng.normal(size=(300, 8)) * scales @ basis
        pdf = pd.DataFrame(
            {"vec_id": np.arange(300), "embedding": [list(map(float, v)) for v in x]}
        )
        df = spark.createDataFrame(pdf)
        comps, mu, ratio = pca_train(df, k=3, sample_rows=300)
        # orthonormal components, descending explained variance
        np.testing.assert_allclose(comps @ comps.T, np.eye(3), atol=1e-9)
        assert ratio[0] >= ratio[1] >= ratio[2] > 0
        # sign convention: max-|w| coordinate positive
        for w in comps:
            assert w[int(np.argmax(np.abs(w)))] > 0

        got = (
            pca_project(df, comps, mu)
            .select("vec_id", "pc1", "pc2", "pc3")
            .toPandas()
            .sort_values("vec_id", ignore_index=True)
        )
        want = (x - mu) @ comps.T
        for j in range(3):
            np.testing.assert_allclose(
                got[f"pc{j + 1}"].to_numpy(), want[:, j], atol=1e-8
            )
        # the fit itself is deterministic and matches a direct numpy fit
        c2, m2, _ = pca_fit_numpy(x, 3)
        sample_used = pca_train(df, k=3, sample_rows=300)[0]
        np.testing.assert_allclose(sample_used, c2, atol=0)
        # projected variance dominated by pc1
        assert got["pc1"].var() > got["pc2"].var() > got["pc3"].var()

    def test_pca_train_validates_empty(self, spark):
        from numalogic_spark.operators.similarity import pca_train

        df = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError):
            pca_train(df)

    def test_kernel_path_matches_inline(self, spark):
        """Above the literal budget the Arrow matmul kernel must produce
        the same projections as the inline fold path (up to matmul
        association error)."""
        import numpy as np
        import pandas as pd

        from numalogic_spark.operators.similarity import (
            _pca_project_kernel,
            pca_project,
            pca_train,
        )

        rng = np.random.default_rng(19)
        x = rng.normal(size=(100, 16))
        pdf = pd.DataFrame(
            {"vec_id": np.arange(100), "embedding": [list(map(float, v)) for v in x]}
        )
        df = spark.createDataFrame(pdf)
        comps, mu, _ = pca_train(df, k=2, sample_rows=100)
        inline = (
            pca_project(df, comps, mu).select("vec_id", "pc1", "pc2")
            .toPandas().sort_values("vec_id", ignore_index=True)
        )
        kernel = (
            _pca_project_kernel(df, np.asarray(comps), np.asarray(mu), "embedding")
            .select("vec_id", "pc1", "pc2")
            .toPandas().sort_values("vec_id", ignore_index=True)
        )
        for c in ("pc1", "pc2"):
            np.testing.assert_allclose(
                inline[c].to_numpy(), kernel[c].to_numpy(), atol=1e-9
            )
