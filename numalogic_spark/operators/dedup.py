"""Deduplication suite for large-scale training-data pipelines.

Not present in the reference (numalogic processes metrics, not corpora) —
this is the training-data-pipeline capability layer required by the build
brief, implemented Spark-first:

- exact:      hash-groupBy on normalized text (one shuffle, partial agg)
- n-gram Jaccard: relational set-similarity — explode distinct tokens,
  equi-join on token within blocking keys, count intersections; pure
  joins/aggs, no UDF, scales with AQE skew handling
- MinHash+LSH: k seeded hash functions over character shingles (JVM-side
  higher-order functions), banded signatures → candidate buckets →
  exact-Jaccard verification join
- SimHash:    64-bit signature via Arrow-vectorized pandas UDF (bit-level
  majority vote needs numpy), near-dups via 16-bit chunk banding +
  popcount(xor) verification (F.bit_count, JVM-side)
- embedding near-dup: cosine over `array<float>` with zip_with dot products
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: keeper id (min), cluster size.

    groupBy on md5(text) — map-side partial agg makes the hot path cheap
    even when one document dominates.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("cluster_size"))
    )


def drop_exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep only the keeper row of each exact-duplicate cluster."""
    keep = exact_dedup(df, text_col, id_col).select(F.col("keeper_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


# --------------------------------------------------------------------------
# word n-gram Jaccard (relational, no UDF)
# --------------------------------------------------------------------------

def _word_set(text_col: str) -> Column:
    # array_remove '': leading/trailing whitespace otherwise yields an
    # empty-string token that becomes a hot shared join key across docs
    return F.array_remove(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+")), "")


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """All (a, b) pairs with word-set Jaccard ≥ threshold, blocked by
    `block_cols` to bound the candidate space (classic blocking strategy —
    at 10^12 docs the blocks are the parallelism unit; AQE splits skewed
    blocks)."""
    block_cols = block_cols or []
    base = df.select(
        F.col(id_col).alias("id"), *block_cols, _word_set(text_col).alias("words")
    ).withColumn("n_words", F.size("words"))
    tok = base.select("id", *block_cols, "n_words", F.explode("words").alias("w"))
    a, b = tok.alias("a"), tok.alias("b")
    cond = (F.col("a.w") == F.col("b.w")) & (F.col("a.id") < F.col("b.id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_words").alias("na"),
            F.col("b.n_words").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = inter.withColumn(
        "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "inter", "jaccard")


# --------------------------------------------------------------------------
# MinHash + LSH over character shingles
# --------------------------------------------------------------------------

def char_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct character n-grams, via sequence+transform (JVM-side)."""
    t = F.lower(F.col(text_col))
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(n))))


def minhash_signature(shingles_col: Column | str, num_hashes: int = 64) -> Column:
    """k-permutation MinHash: sig[i] = min over shingles of xxhash64(h(s), i).

    Each shingle string is hashed to a long ONCE; the k permutations then
    hash (long, seed) pairs — k× cheaper than re-hashing strings per
    permutation."""
    c = F.col(shingles_col) if isinstance(shingles_col, str) else shingles_col
    hashed = F.transform(c, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(F.transform(hashed, lambda h, i=i: F.xxhash64(h, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs: LSH banding proposes candidates, exact shingle
    Jaccard verifies. bands=16, rows=4 → catches J≈0.8 w.h.p.
    (s-curve: P(candidate) = 1-(1-J^r)^b)."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of bands ({bands})"
        )
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"), char_shingles(text_col, shingle_n).alias("sh")
    ).withColumn("sig", minhash_signature("sh", num_hashes))
    # Slim candidate generation: the band self-join carries ONLY (id, band
    # hash) — shingle arrays must not travel through the n² join. Dedup the
    # candidate id-pairs BEFORE the (expensive) exact-Jaccard verification,
    # then join the shingle sets back once per pair side. (No persist: the
    # two consumers need different columns, and a cached handle would leak
    # for the application lifetime with no way for callers to release it.)
    slim = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[F.element_at("sig", bi * rows + ri + 1).cast("string") for ri in range(rows)])
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a, b = slim.alias("a"), slim.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = base.select("id", "sh")
    pairs = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """Arrow-vectorized 64-bit SimHash from per-word hash arrays: per-bit
    majority vote (numpy unpackbits over uint64 views — no per-row loop
    beyond the ragged boundary bookkeeping)."""
    out = np.zeros(len(hashes), dtype=np.int64)
    for i, hs in enumerate(hashes):  # ragged rows; each step fully vectorized
        if hs is None or len(hs) == 0:
            continue
        u = np.asarray(hs, dtype=np.int64).view(np.uint64)
        bits = np.unpackbits(u.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1, bitorder="big")
        votes = bits.sum(axis=0) * 2 - len(u)  # majority per bit column
        sim = np.uint64(0)
        setbits = np.nonzero(votes > 0)[0]
        for bpos in setbits:
            sim |= np.uint64(1) << np.uint64(63 - bpos)
        out[i] = np.int64(sim.astype(np.uint64).view(np.int64))
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    words = F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    return df.select(F.col(id_col).alias("id"), _simhash_from_hashes(hashes).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: band on (max_hamming+1) chunks — a pair
    within hamming ≤ max_hamming must agree on ≥1 chunk (pigeonhole), so
    candidate generation is recall-complete for the requested radius —
    then verify with bit_count(xor) ≤ max_hamming, all JVM-side."""
    n_chunks = max_hamming + 1
    if n_chunks > 16:
        raise ValueError("max_hamming > 15 would need chunks smaller than 4 bits")
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1
    sh = simhash(df, text_col, id_col)
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("chunk"),
                        F.shiftrightunsigned("simhash", chunk_bits * k).bitwiseAND(F.lit(mask)).alias("cv"),
                    )
                    for k in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sa"), F.col("b.simhash").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.withColumn("hamming", ham).filter(ham <= max_hamming).select("id_a", "id_b", "hamming")


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def cosine_expr(a: Column, b: Column) -> Column:
    """cos(a,b) via zip_with dot product — JVM-side, no UDF."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def embedding_near_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Pairs with cosine ≥ threshold within blocks. The block join bounds
    the O(n²); for unblocked corpora use similarity.lsh_bucketed_ann."""
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    pairs = a.join(b, cond).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine_expr(F.col("a.v").cast("array<double>"), F.col("b.v").cast("array<double>")).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


def embedding_near_pairs_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup for UNBLOCKED corpora: signed-random-projection
    buckets replace the label block — a pair with cosine ≥ threshold agrees
    on all n_planes sign bits w.p. (1 - θ/π)^k (Charikar 2002), so near-dups
    land in the same bucket w.h.p. and the join is per-bucket instead of n².

    Recall misses pairs straddling a hyperplane; raise recall by unioning a
    second seed's buckets (cheap — the verification cosine dedups).
    """
    from numalogic_spark.operators.similarity import _hyperplanes, srp_bucket_expr

    df = df.filter(F.col(vec_col).isNotNull())
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("no non-null embeddings to pair")
    dim = len(first[0])
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    out = None
    for s in (seed, seed + 1):  # two independent hash tables
        planes = _hyperplanes(dim, n_planes, s)
        bucketed = base.withColumn("blk", srp_bucket_expr("v", planes))
        a, b = bucketed.alias("a"), bucketed.alias("b")
        pairs = a.join(
            b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id"))
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_expr(F.col("a.v").cast("array<double>"), F.col("b.v").cast("array<double>")).alias("cos_sim"),
        ).filter(F.col("cos_sim") >= threshold)
        out = pairs if out is None else out.unionByName(pairs)
    return out.dropDuplicates(["id_a", "id_b"])
