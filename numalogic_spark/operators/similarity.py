"""Approximate-nearest-neighbor similarity search over embedding columns.

Training-data-pipeline capability (not in the reference): brute-force
cosine top-k as the exact baseline, and a signed-random-projection LSH
bucketed variant as the scale path — at 10^12 vectors the bucket join
replaces the full cross product; probes share buckets with their
neighbors w.h.p. (Charikar 2002 SimHash-for-cosine construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from numalogic_spark.operators.dedup import cosine_expr

# Plane/centroid matrices up to this many floats are inlined as literal
# expression trees (pure JVM, zero Python); above it the plan would blow up
# (k·dim literals at dim=1536, k=4096 is ~6M expression nodes — codegen and
# plan serialization both fall over), so bucketing/assignment switch to an
# Arrow-vectorized kernel whose matrix ships once inside the serialized UDF
# (one copy per executor, BLAS matmul per batch).
_LITERAL_BUDGET = 2048

# centroid_cosine inlines `dim` decimal aggregate columns below this bound;
# above it (real embedding dims: 768/1536/4096) the plan switches to a
# posexplode long-skinny aggregate with identical numerics. Lower than
# _LITERAL_BUDGET because each inline column is a full aggregate expression,
# not a literal leaf.
_CENTROID_INLINE_DIMS = 256


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine vs one query vector: one narrow map + a
    top-k-by-sort (Spark optimizes ORDER BY + LIMIT into TakeOrdered —
    no full sort, no shuffle of the full table)."""
    q = F.lit(query_vec).cast("array<double>")
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("id")).limit(k)


def score_all(
    df: DataFrame, query_vec: list[float], vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Cosine of every vector vs the query (exact; useful as oracle gate)."""
    q = F.lit(query_vec).cast("array<double>")
    return df.select(
        F.col(id_col).alias("id"),
        cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def _dot_const_expr(vec_col: str, const_vec) -> "F.Column":
    """v · c for a literal vector c — the shared JVM-side dot-product idiom
    (zip_with + fold) used by SRP bucketing and IVF assignment."""
    v = F.col(vec_col).cast("array<double>")
    c = F.lit([float(x) for x in const_vec]).cast("array<double>")
    return F.aggregate(F.zip_with(v, c, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)


def srp_bucket_expr(vec_col: str, planes: np.ndarray):
    """Signed-random-projection bucket id: bit i = sign(v · h_i).

    Small plane matrices are inlined JVM-side (sum of weighted dot-product
    signs); large ones use the Arrow kernel (see _LITERAL_BUDGET). Vectors
    must be non-null (filter upstream)."""
    planes = np.asarray(planes, dtype=float)
    if planes.size > _LITERAL_BUDGET:
        return _srp_bucket_kernel(vec_col, planes)
    bucket = F.lit(0).cast("long")
    for i, h in enumerate(planes):
        dot = _dot_const_expr(vec_col, h)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def _srp_bucket_kernel(vec_col: str, planes: np.ndarray):
    """Arrow path for big plane matrices: one BLAS matmul per batch."""
    weights = (np.int64(1) << np.arange(planes.shape[0], dtype=np.int64))
    planes_t = planes.T.copy()

    @F.pandas_udf(T.LongType())
    def bucket(v: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        return pd.Series(((m @ planes_t) >= 0) @ weights)

    return bucket(F.col(vec_col))


def lsh_bucketed_ann(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: hash all vectors into 2^n_planes SRP buckets, search only
    buckets within `multiprobe_hamming` of the query's bucket.

    At scale, the bucket column is a partition/bucketing key so the probe
    reads only matching buckets (partition pruning); here it's a filter.
    Recall vs brute force is tested in tests/test_similarity.py.
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=float)
    qbits = (planes @ qv >= 0).astype(np.int64)
    qbucket = int((qbits << np.arange(n_planes)).sum())
    # multiprobe: all buckets within hamming radius of the query bucket
    probes = [qbucket]
    if multiprobe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]
    if multiprobe_hamming >= 2:
        probes += [
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    bucketed = df.withColumn("_bucket", srp_bucket_expr(vec_col, planes))
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    q = F.lit([float(x) for x in qv]).cast("array<double>")
    scored = cand.select(
        F.col(id_col).alias("id"),
        cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("id")).limit(k)


def kmeans_fit(x: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic spherical mini k-means (kmeans++ D² seeding + Lloyd)
    over already-collected sample rows — shared by the Spark trainer AND
    the DuckDB oracle generator, so an external replayer that feeds the
    same sample in the same order gets the bit-identical codebook."""
    x = x / np.linalg.norm(x, axis=1, keepdims=True)  # cosine → unit sphere
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(x))
    # kmeans++ seeding: next centroid sampled ∝ squared distance to nearest
    idx = [int(rng.integers(len(x)))]
    for _ in range(1, k):
        d2 = 1.0 - (x @ x[idx].T).max(axis=1)  # cosine distance to nearest seed
        d2 = np.maximum(d2, 0.0) ** 2
        if d2.sum() == 0:
            idx.append(int(rng.integers(len(x))))
        else:
            idx.append(int(rng.choice(len(x), p=d2 / d2.sum())))
    cents = x[idx].copy()
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for ci in range(len(cents)):
            m = assign == ci
            if m.any():
                c = x[m].mean(axis=0)
                cents[ci] = c / (np.linalg.norm(c) or 1.0)
    return cents


def ivf_train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    presample_fraction: float | None = None,
    portable_order_id: str | None = None,
    auto_presample_rows: int | None = 1_000_000,
    row_count_hint: int | None = None,
) -> np.ndarray:
    """IVF coarse quantizer: deterministic mini k-means on a seeded sample.

    The sample (≤ sample_rows) fits on the driver by construction — the
    classic IVF recipe (train the codebook on a sample, assign the corpus
    distributedly). kmeans++ D²-weighted seeded init, Lloyd iterations in
    numpy. NULL and zero-norm embeddings are excluded from training (they
    carry no direction on the unit sphere).

    The xxhash64 TakeOrdered avoids a full shuffle but hashes every row it
    sees, so presampling is ON BY DEFAULT at scale: when the corpus
    exceeds ``auto_presample_rows`` (counted metadata-only, pre-filter — a
    columnar count reads no data pages), a seeded Bernoulli sample with
    ~50× oversampling vs ``sample_rows`` is inserted below the top-k, so
    the hash-order stage sees a bounded row stream. Pass
    ``presample_fraction`` explicitly to override, or
    ``auto_presample_rows=None`` to force the exact full-corpus order.
    Train ONCE and persist the codebook (``save_codebook``) — don't
    re-train per query.

    ``portable_order_id``: order the sample by the PORTABLE hash of this
    id column (sampling.uniform_hash_unit) instead of xxhash64 — an
    external replayer (the DuckDB oracle generator) can then reproduce the
    exact sample order, and with kmeans_fit shared, the exact codebook.
    Auto-presample is disabled on this path (the oracle must see the same
    row universe).
    """
    src = df.filter(F.col(vec_col).isNotNull())
    auto = (
        presample_fraction is None
        and portable_order_id is None
        and auto_presample_rows is not None
    )
    n_raw = None
    if auto:
        if row_count_hint is not None:
            n_raw = int(row_count_hint)
        else:
            # The fraction needs a row count, but df.count() is only
            # metadata-cheap on a PLAIN columnar scan; on a derived frame
            # (post-filter/join lineage) it is a full extra job before
            # training even starts. Gate the automatic count on the
            # optimized plan being a bare relation; for derived frames
            # auto-presample is opt-in via row_count_hint (or an explicit
            # presample_fraction).
            try:
                plan = df._jdf.queryExecution().optimizedPlan().toString()
                lines = [ln for ln in plan.strip().splitlines() if ln.strip()]
                plain_scan = len(lines) == 1 and lines[0].lstrip().startswith(
                    ("Relation", "LocalRelation")
                )
            except Exception:  # non-classic backends: stay conservative
                plain_scan = False
            if plain_scan:
                n_raw = df.count()
        if n_raw is not None and n_raw > auto_presample_rows:
            presample_fraction = min(1.0, 50.0 * sample_rows / n_raw)

    def collect_sample(frame):
        if portable_order_id is not None:
            from numalogic_spark.operators.sampling import uniform_hash_unit

            frac_df = (
                frame.orderBy(
                    uniform_hash_unit(portable_order_id, salt=seed),
                    F.col(portable_order_id),
                )
                .select(vec_col)
                .limit(sample_rows)
            )
        else:
            frac_df = frame.select(vec_col).orderBy(
                F.xxhash64(F.col(vec_col), F.lit(seed))
            ).limit(sample_rows)
        rows = [np.asarray(r[0], dtype=float) for r in frac_df.collect()]
        return [v for v in rows if v.ndim == 1 and np.linalg.norm(v) > 0]

    sampled = src
    if presample_fraction is not None:
        sampled = src.sample(fraction=presample_fraction, seed=seed)
    rows = collect_sample(sampled)
    if auto and presample_fraction is not None and len(rows) < min(sample_rows, 50 * n_centroids):
        # Auto-presample undershot (fraction was sized off the pre-filter
        # count; most rows must have had NULL embeddings) — fall back to
        # the exact full-corpus order rather than training a degenerate
        # codebook on a sliver.
        rows = collect_sample(src)
    if not rows:
        raise ValueError("no non-null, non-zero embeddings available to train IVF centroids")
    return kmeans_fit(np.asarray(rows), n_centroids, iters, seed)


def ivf_assign_expr(vec_col: str, centroids: np.ndarray):
    """Nearest-centroid id: k dot products + argmax (first max wins).
    Centroids are unit vectors so dot = cosine ranking. Small codebooks are
    inlined JVM-side via array_position(array_max); large ones use the
    Arrow kernel (see _LITERAL_BUDGET)."""
    centroids = np.asarray(centroids, dtype=float)
    if centroids.size > _LITERAL_BUDGET:
        return _ivf_assign_kernel(vec_col, centroids)
    dots = F.array(*[_dot_const_expr(vec_col, c) for c in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def _ivf_assign_kernel(vec_col: str, centroids: np.ndarray):
    """Arrow path for big codebooks: batch matmul + argmax (first max wins,
    matching the literal path's array_position semantics)."""
    cents_t = centroids.T.copy()

    @F.pandas_udf(T.IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        return pd.Series((m @ cents_t).argmax(axis=1).astype(np.int32))

    return assign(F.col(vec_col))


def save_codebook(path: str, centroids: np.ndarray) -> None:
    """Persist a trained IVF codebook as a replayable JSON artifact (the
    registry analog — train once, reuse across probe jobs; exact float
    roundtrip via hex)."""
    import json

    arr = np.asarray(centroids, dtype=np.float64)
    with open(path, "w") as f:
        json.dump(
            {"shape": list(arr.shape), "hex": [v.hex() for v in arr.reshape(-1)]}, f
        )


def load_codebook(path: str) -> np.ndarray:
    import json

    with open(path) as f:
        obj = json.load(f)
    return np.array([float.fromhex(h) for h in obj["hex"]]).reshape(obj["shape"])


def ivf_build_index(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
    sample_rows: int = 10_000,
    seed: int = 42,
    presample_fraction: float | None = None,
) -> tuple[np.ndarray, DataFrame]:
    """Train the codebook ONCE and attach the inverted-list assignment as a
    column: returns (centroids, df + list_col). Write the result
    `partitionBy(list_col)` so ivf_ann_topk's nprobe filter becomes
    partition pruning — the intended at-rest layout for repeated queries
    (re-training / re-assigning per query is the anti-pattern)."""
    cents = ivf_train_centroids(
        df, n_centroids=n_centroids, vec_col=vec_col, sample_rows=sample_rows,
        seed=seed, presample_fraction=presample_fraction,
    )
    return cents, df.withColumn(list_col, ivf_assign_expr(vec_col, cents))


def ivf_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    list_col: str | None = None,
) -> DataFrame:
    """IVF probe: score only vectors in the nprobe lists nearest the query.

    At scale the inverted lists are a materialized table column
    (`PARTITIONED BY (ivf_list)`) so the probe is partition pruning — pass
    it as `list_col`. Without it the assignment is computed on the fly
    (fine for one-off queries, wasteful for repeated ones).
    """
    q = np.asarray(query_vec, dtype=float)
    qn = q / np.linalg.norm(q)
    probes = np.argsort(-(centroids @ qn), kind="stable")[:nprobe].tolist()
    assigned = (
        df.withColumnRenamed(list_col, "_list")
        if list_col
        else df.withColumn("_list", ivf_assign_expr(vec_col, centroids))
    )
    cand = assigned.filter(F.col("_list").isin([int(p) for p in probes]))
    qlit = F.lit([float(x) for x in q]).cast("array<double>")
    scored = cand.select(
        F.col(id_col).alias("id"),
        cosine_expr(F.col(vec_col).cast("array<double>"), qlit).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("id")).limit(k)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
) -> DataFrame:
    """k nearest right-neighbors for every left vector (optionally blocked).
    Exact within blocks; ranking window + filter (per-group top-k)."""
    l = left.select(F.col(id_col).alias("lid"), F.col(vec_col).alias("lv"),
                    *( [F.col(block_col).alias("blk")] if block_col else [] ))
    r = right.select(F.col(id_col).alias("rid"), F.col(vec_col).alias("rv"),
                     *( [F.col(block_col).alias("blk")] if block_col else [] ))
    joined = l.join(r, on=(["blk"] if block_col else None), how="inner") if block_col else l.crossJoin(r)
    scored = joined.filter(F.col("lid") != F.col("rid")).select(
        "lid", "rid",
        cosine_expr(F.col("lv").cast("array<double>"), F.col("rv").cast("array<double>")).alias("cos_sim"),
    )
    w = Window.partitionBy("lid").orderBy(F.col("cos_sim").desc(), F.col("rid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def centroid_cosine(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-quality curation signal: cosine of every vector to its
    GROUP CENTROID (per-dimension mean). Low scores mark outliers — the
    standard embedding-space filter for mislabeled/degenerate documents.

    Returns (id, group, cos_to_centroid). Plan, below
    `_CENTROID_INLINE_DIMS`: one groupBy computing the per-dim means as dim
    inline aggregate columns, a broadcast join of the tiny centroid frame,
    and a zip_with fold per row. Above it (production embedding dims,
    768-4096), the inline plan blows up — dim decimal aggregates explode
    codegen and plan serialization — so the centroid flips to a
    posexplode→groupBy(group, pos) long-skinny aggregate with the SAME
    decimal-sum numerics (bit-identical means, asserted in
    tests/test_similarity.py) and a bounded plan: map-side partial agg
    collapses the exploded rows to n_groups·dim per partition before the
    shuffle, so shuffle volume is independent of row count. NULL vectors
    are excluded. The per-dim mean sums in DECIMAL (exact,
    order-independent) before the final double divide — a double
    partial-agg sum varies with reducer merge order and would make the
    hash-gated oracle comparison flaky at rounding edges."""
    df = df.filter(F.col(vec_col).isNotNull())
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("no non-null embeddings")
    dim = len(first[0])
    v = F.col(vec_col).cast("array<double>")
    if dim > _CENTROID_INLINE_DIMS:
        # exact decimal sum -> double -> IEEE divide, identical arithmetic
        # to the inline branch, just in long-skinny shape. The divisor is
        # the GROUP row count (broadcast-joined), not the per-(group,pos)
        # exploded count — on ragged vectors (shorter than the inferred
        # dim) the two differ, and the inline branch divides by rows.
        gcnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
        cents = (
            df.select(F.col(group_col), F.posexplode(v).alias("_pos", "_val"))
            .groupBy(group_col, "_pos")
            .agg(F.sum(F.col("_val").cast("decimal(27,12)")).alias("_sum"))
            .join(F.broadcast(gcnt), group_col)
            .select(
                group_col,
                "_pos",
                (F.col("_sum").cast("double") / F.col("_n")).alias("_mean"),
            )
            .groupBy(group_col)
            .agg(F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_pos", "_mean")))
            ).alias("_m"))
            # re-densify to exactly `dim` entries, NULL where a group has
            # no vector reaching that position — the inline branch's
            # sum(all-null)=NULL semantics; without this, a group whose
            # vectors are ALL shorter than dim would get a short centroid
            # here but a null-padded one inline, and the branches would
            # disagree (review finding round 3).
            .select(
                F.col(group_col),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    # try_element_at: ANSI element_at throws on missing keys
                    lambda i: F.try_element_at(F.col("_m"), i),
                ).alias("_cent"),
            )
        )
    else:
        cents = df.groupBy(group_col).agg(
            *[
                # exact decimal sum -> double -> IEEE divide: each step is
                # order-independent and engine-identical (a decimal QUOTIENT's
                # scale/rounding would differ per engine). try_element_at, not
                # v[i]: ANSI mode throws on a ragged (shorter) vector; a null
                # element is skipped by sum while the divisor stays the group
                # row count — i.e. ragged tails are zero-imputed, matching
                # the exploded branch exactly.
                (
                    F.sum(F.try_element_at(v, F.lit(i + 1)).cast("decimal(27,12)"))
                    .cast("double") / F.count(F.lit(1))
                ).alias(f"_c{i}")
                for i in range(dim)
            ]
        ).select(group_col, F.array(*[F.col(f"_c{i}") for i in range(dim)]).alias("_cent"))
    joined = df.join(F.broadcast(cents), group_col)
    return joined.select(
        F.col(id_col),
        F.col(group_col),
        cosine_expr(v, F.col("_cent").cast("array<double>")).alias("cos_to_centroid"),
    )


def pca_fit_numpy(x: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic PCA fit shared by the engine and the oracle
    generator (the kmeans_fit discipline): population covariance of the
    sample, `eigh` eigendecomposition (symmetric, deterministic for a
    given numpy build), components ordered by descending eigenvalue with
    ties broken by eigh's ascending output order, and a fixed sign
    convention (the largest-|w| coordinate of each component is
    positive; first index wins ties). Returns (components k×d, mean d,
    explained_variance_ratio k)."""
    x = np.asarray(x, dtype=float)
    mu = x.mean(axis=0)
    xc = x - mu
    cov = xc.T @ xc / len(x)
    evals, evecs = np.linalg.eigh(cov)
    idx = np.argsort(-evals, kind="stable")[: int(k)]
    comps = evecs[:, idx].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    total = float(evals.sum())
    ratio = (evals[idx] / total) if total > 0 else np.zeros(len(idx))
    return comps, mu, ratio


def pca_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    sample_rows: int = 2000,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA on a deterministic driver-side sample: rows ordered by the
    PORTABLE hash of `id_col` (sampling.uniform_hash_unit — an external
    replayer reproduces the exact sample), capped at `sample_rows` so the
    driver state is bounded by contract regardless of corpus size (the
    IVF-codebook recipe: fit on a sample, project the corpus
    distributedly). Train once and reuse; don't refit per query."""
    from numalogic_spark.operators.sampling import uniform_hash_unit

    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .orderBy(uniform_hash_unit(id_col, salt=seed), F.col(id_col))
        .select(vec_col)
        .limit(int(sample_rows))
        .collect()
    )
    x = np.asarray([list(r[0]) for r in rows], dtype=float)
    if x.ndim != 2 or not len(x):
        raise ValueError("no non-null embeddings to fit PCA")
    return pca_fit_numpy(x, k)


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Project each vector onto the fitted components: score_j =
    (v − μ)·w_j = v·w_j − (μ·w_j), with the μ·w_j bias folded into a
    literal so the per-row work is one JVM-side zip_with fold per
    component — no Python, no shuffle, broadcast-free (the components
    ride the plan as literals). Above _LITERAL_BUDGET inlined floats
    (k·d — real dims like 8×1536) the plan switches to one Arrow-batched
    matmul kernel instead of k giant fold expressions (the SRP/IVF
    discipline; the oracle-gated query stays on the small inline path).
    Adds columns pc1..pck."""
    comps = np.asarray(components, dtype=float)
    mu = np.asarray(mean, dtype=float)
    if comps.size > _LITERAL_BUDGET:
        return _pca_project_kernel(df, comps, mu, vec_col)
    out = df
    for j, w in enumerate(comps, start=1):
        bias = 0.0
        for a, b in zip(mu, w):  # sequential fold — replayable in SQL
            bias += a * b
        out = out.withColumn(
            f"pc{j}", _dot_const_expr(vec_col, w) - F.lit(float(bias))
        )
    return out


def _pca_project_kernel(
    df: DataFrame, comps: np.ndarray, mu: np.ndarray, vec_col: str
) -> DataFrame:
    """Arrow path for large k·d: one pandas UDF computing all k scores
    per batch as (V − μ)·Wᵀ; returns the same pc1..pck columns."""
    from pyspark.sql.functions import pandas_udf

    k = comps.shape[0]
    wt = comps.T.copy()

    @pandas_udf("array<double>")
    def project(v: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(e, dtype=float) for e in v])
        scores = (x - mu) @ wt
        return pd.Series([list(map(float, row)) for row in scores])

    out = df.withColumn("_pcs", project(F.col(vec_col)))
    for j in range(1, k + 1):
        out = out.withColumn(f"pc{j}", F.element_at("_pcs", j))
    return out.drop("_pcs")
