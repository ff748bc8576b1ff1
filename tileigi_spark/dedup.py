"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup. Designed for the 10^12-document scale path:
every stage is a hash-partitioned groupBy/join on bounded keys (band
buckets, hash prefixes), never an all-pairs product.
"""

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from .textops import word_ngrams


# ----------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per md5(text). One shuffle
    (hash aggregate with map-side partial min)."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy("content_md5").orderBy(F.col(id_col).asc())
    return (df.withColumn("content_md5", h)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn"))


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(content_md5, n_dups, keep_id) per duplicate group — the audit view."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("keep_id"))
            )


# --------------------------------------------------------------- minhash

def _shingle_hash(col, seed: int):
    # deterministic per-seed hash: xxhash64 of (seed, shingle)
    return F.xxhash64(F.lit(seed), col)


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 16,
                       shingle_n: int = 3) -> DataFrame:
    """MinHash signature per doc: shingle -> per-seed xxhash64 -> min.
    Runs entirely in Catalyst HOFs (transform + array_min) — no UDF, no
    shuffle; the signature column is computed at scan time. The gram array
    is materialized once so the n_hashes min-scans don't each re-tokenize
    (keeps the codegen tree linear in n_hashes)."""
    with_grams = df.select(
        id_col, word_ngrams(F.col(text_col), shingle_n).alias("_grams"))
    sig = F.array(*[
        F.array_min(F.transform(F.col("_grams"),
                                lambda g, s=s: _shingle_hash(g, s)))
        for s in range(n_hashes)])
    return with_grams.select(id_col, sig.alias("minhash"))


def minhash_candidates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 16,
                       bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """LSH banding: split the signature into `bands` rows, bucket-join on
    (band_idx, band_hash), emit candidate pairs (a < b). The join is an
    equi self-join on the band bucket — Spark's native strength; bucket
    sizes bound the pair blow-up."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    banded = (sigs.select(
        id_col,
        F.posexplode(F.array(*[
            F.xxhash64(*[F.element_at("minhash", b * rows_per_band + r + 1)
                         for r in range(rows_per_band)])
            for b in range(bands)])).alias("band_idx", "band_hash")))
    left = banded.select(F.col(id_col).alias("a"), "band_idx", "band_hash")
    right = banded.select(F.col(id_col).alias("b"), "band_idx", "band_hash")
    return (left.join(right, on=["band_idx", "band_hash"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", shingle_n: int = 3,
                   threshold: float = 0.7) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs: join texts in, compute
    |A∩B|/|A∪B| with array ops."""
    docs = df.select(F.col(id_col).alias("_jid"),
                     word_ngrams(F.col(text_col), shingle_n).alias("_grams"))
    joined = (pairs
              .join(docs.withColumnRenamed("_jid", "a")
                        .withColumnRenamed("_grams", "grams_a"), on="a")
              .join(docs.withColumnRenamed("_jid", "b")
                        .withColumnRenamed("_grams", "grams_b"), on="b"))
    ga = F.array_distinct("grams_a")
    gb = F.array_distinct("grams_b")
    inter = F.size(F.array_intersect(ga, gb))
    union = F.size(F.array_union(ga, gb))
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    return (joined.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n_hashes: int = 16,
                        bands: int = 4, shingle_n: int = 3,
                        threshold: float = 0.7) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline."""
    cands = minhash_candidates(df, text_col, id_col, n_hashes, bands,
                               shingle_n)
    return jaccard_verify(df, cands, text_col, id_col, shingle_n, threshold)


# ---------------------------------------------------------------- simhash

def simhash_pandas(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """SimHash via an Arrow-vectorized pandas UDF (numpy bit-matrix
    majority vote per document)."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            hs = np.array([_xx64_py(w) for w in t.split()], dtype=np.uint64)
            if hs.size == 0:
                continue
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
            votes = bits.sum(axis=0) * 2 - hs.size
            sh = np.uint64(0)
            for b in range(64):
                if votes[b] > 0:
                    sh |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sh.astype(np.int64))
        return pd.Series(out)

    return df.select(id_col, _simhash(F.col(text_col)).alias("simhash"))


def _xx64_py(s: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a; stable across workers)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= k, using the pigeonhole
    block trick: split 64 bits into (k+1) blocks; any pair within distance k
    agrees exactly on >= 1 block -> equi-join per block, then verify."""
    sh = simhash_pandas(df, text_col, id_col)
    blocks = max_hamming + 1
    width = 64 // blocks

    def block(b):
        shifted = F.shiftrightunsigned(F.col("simhash"), b * width)
        if width >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    exploded = sh.select(
        id_col, "simhash",
        F.posexplode(F.array(*[block(b) for b in range(blocks)]))
        .alias("block_idx", "block_val"))
    left = exploded.select(F.col(id_col).alias("a"),
                           F.col("simhash").alias("sh_a"),
                           "block_idx", "block_val")
    right = exploded.select(F.col(id_col).alias("b"),
                            F.col("simhash").alias("sh_b"),
                            "block_idx", "block_val")
    pairs = (left.join(right, on=["block_idx", "block_val"])
             .filter(F.col("a") < F.col("b"))
             .select("a", "b", "sh_a", "sh_b").distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))


# ------------------------------------------------------------- embeddings

def embedding_near_dups(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        threshold: float = 0.95,
                        n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-dup via LSH bucketing: sign-of-projection onto
    deterministic pseudo-random hyperplanes -> bucket equi-join -> exact
    cosine verify with zip_with/aggregate (JVM-side)."""
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    # deterministic "hyperplane" p: component j = sin(j*seed+1) via a cheap
    # integer-derived pseudo-random weight; sign bucket per plane
    buckets = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), dim_idx,
                       lambda v, j: v * F.sin((j + 1) * F.lit(float(p * 2 + 1)))),
            F.lit(0.0), lambda a, x: a + x)
        buckets.append(F.when(proj >= 0, 1).otherwise(0))
    bucket = sum(b * (2 ** i) for i, b in enumerate(buckets))
    with_b = df.select(id_col, vec_col).withColumn("bucket", bucket)
    left = with_b.select(F.col(id_col).alias("a"),
                         F.col(vec_col).alias("va"), "bucket")
    right = with_b.select(F.col(id_col).alias("b"),
                          F.col(vec_col).alias("vb"), "bucket")
    pairs = (left.join(right, on="bucket")
             .filter(F.col("a") < F.col("b")))
    return (pairs.withColumn("cosine", cosine_sim(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", "cosine"))


def embedding_near_dups_exact(df: DataFrame, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.95) -> DataFrame:
    """Exact all-pairs cosine near-dup: the brute-force baseline whose
    output the LSH path (embedding_near_dups) approximates. O(n^2) theta
    self-join (a < b) — the small-N / per-bucket verify path; at corpus
    scale, bucket with embedding_near_dups and this becomes the in-bucket
    verify."""
    left = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    right = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    pairs = left.join(right, F.col("a") < F.col("b"))
    return (pairs.withColumn("cosine", cosine_sim(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", "cosine"))


def cosine_sim(va, vb):
    """Exact cosine with JVM array HOFs (no UDF)."""
    va = va.cast("array<double>")
    vb = vb.cast("array<double>")
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(F.transform(va, lambda x: x * x),
                            F.lit(0.0), lambda a, x: a + x))
    nb = F.sqrt(F.aggregate(F.transform(vb, lambda x: x * x),
                            F.lit(0.0), lambda a, x: a + x))
    return dot / (na * nb)
