"""Similarity search over embedding columns: brute-force cosine top-k
(the correctness baseline) and an IVF-style bucketed variant (the scale
path — candidates shrink by the partition fan-in instead of scanning all
vectors per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import cosine_pairs


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int,
                     q_id: str = "query_id", c_id: str = "vec_id",
                     q_vec: str = "q_vec", c_vec: str = "embedding") -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the corpus,
    score with the Arrow-batched numpy dot kernel, window top-k. One
    shuffle (the window partition by query)."""
    from .dedup import spread_small

    joined = spread_small(corpus).crossJoin(F.broadcast(queries))
    scored = joined.withColumn("cosine", cosine_pairs(F.col(q_vec),
                                                      F.col(c_vec)))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(),
                                         F.col(c_id).asc())
    return (scored.withColumn("sim_rank", F.row_number().over(w))
            .filter(F.col("sim_rank") <= k)
            .select(q_id, c_id, "cosine", "sim_rank"))


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int,
             q_id: str = "query_id", c_id: str = "vec_id",
             q_vec: str = "q_vec", c_vec: str = "embedding",
             n_tables: int = 8, n_bits: int = 8, n_probes: int = 8,
             seed: int = 42, max_bucket: int = 1_000_000,
             dim: int | None = None) -> DataFrame:
    """Approximate top-k via banded sign-LSH inverted lists + multiprobe.

    Corpus is bucketed once per table (n_tables × 2^n_bits inverted
    lists, hash-partitioned by the equi-join — at 10^12 scale the bucket
    columns are computed at scan with JVM HOFs, no UDF). Each query
    probes its own bucket per table plus n_probes Hamming-1 flips, then
    exact-scores only candidates in probed buckets. Candidate fraction ≈
    n_tables·(1+n_probes)/2^n_bits of the corpus (raise n_bits with
    corpus size); max_bucket drops degenerate hot lists."""
    from .dedup import (cap_buckets, infer_dim, lsh_table_keys, lsh_tables,
                        rand_hyperplanes, spread_small)

    dim = dim or infer_dim(corpus, c_vec)
    c = cap_buckets(lsh_tables(spread_small(corpus.select(c_id, c_vec)),
                               c_vec, n_tables, n_bits, seed, dim),
                    max_bucket)

    # one expression builds every probe: per table, the home bucket plus
    # n_probes Hamming-1 flips (bit keys evaluated once per row — see
    # lsh_table_keys on why not element_at per table)
    keys = lsh_table_keys(F.col(q_vec),
                          rand_hyperplanes(dim, n_tables * n_bits, seed),
                          n_tables, n_bits)
    flips = F.sequence(F.lit(0), F.lit(min(n_probes, n_bits) - 1))
    probes = F.flatten(F.transform(
        keys,
        lambda kb, t: F.concat(
            F.array(F.struct(t.alias("table"), kb.alias("bucket"))),
            F.transform(
                flips,
                lambda p: F.struct(
                    t.alias("table"),
                    kb.bitwiseXOR(F.pow(F.lit(2), p).cast("int"))
                    .alias("bucket"))))))
    q = (queries
         .select("*", F.explode(probes).alias("_probe"))
         .select("*", "_probe.table", "_probe.bucket").drop("_probe"))

    joined = (q.join(c, on=["table", "bucket"])
              .dropDuplicates([q_id, c_id]))
    scored = joined.withColumn("cosine", cosine_pairs(F.col(q_vec),
                                                      F.col(c_vec)))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(),
                                         F.col(c_id).asc())
    return (scored.withColumn("sim_rank", F.row_number().over(w))
            .filter(F.col("sim_rank") <= k)
            .select(q_id, c_id, "cosine", "sim_rank"))
