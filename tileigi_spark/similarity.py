"""Similarity search over embedding columns: brute-force cosine top-k
(the correctness baseline) and an IVF-style bucketed variant (the scale
path — candidates shrink by the partition fan-in instead of scanning all
vectors per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import cosine_sim


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int,
                     q_id: str = "query_id", c_id: str = "vec_id",
                     q_vec: str = "q_vec", c_vec: str = "embedding") -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the corpus,
    score JVM-side with array HOFs, window top-k. One shuffle (the window
    partition by query)."""
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.withColumn("cosine", cosine_sim(F.col(q_vec),
                                                    F.col(c_vec)))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(),
                                         F.col(c_id).asc())
    return (scored.withColumn("sim_rank", F.row_number().over(w))
            .filter(F.col("sim_rank") <= k)
            .select(q_id, c_id, "cosine", "sim_rank"))


def _ivf_bucket(vec_col, n_planes: int):
    """Sign-of-projection bucket id (deterministic hyperplanes)."""
    dim_idx = F.sequence(F.lit(0), F.size(vec_col) - 1)
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), dim_idx,
                       lambda v, j: v * F.sin((j + 1) * F.lit(float(2 * p + 1)))),
            F.lit(0.0), lambda a, x: a + x)
        bucket = bucket + F.when(proj >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int,
             q_id: str = "query_id", c_id: str = "vec_id",
             q_vec: str = "q_vec", c_vec: str = "embedding",
             n_planes: int = 4, n_probes: int = 4) -> DataFrame:
    """Approximate top-k: bucket corpus once by hyperplane signs (IVF-style
    inverted lists as a hash-partitioned column), probe each query's own
    bucket plus its `n_probes`-nearest sibling buckets (Hamming-1 flips),
    then exact-score only candidates in probed buckets. At 10^12 scale the
    corpus-side bucket column is computed at scan (no UDF) and the join is
    equi on bucket — shuffle size ~ corpus/2^n_planes * probes."""
    c = corpus.withColumn("bucket", _ivf_bucket(F.col(c_vec), n_planes))
    q0 = queries.withColumn("bucket0", _ivf_bucket(F.col(q_vec), n_planes))
    probes = [F.col("bucket0")]
    for p in range(min(n_probes - 1, n_planes)):
        probes.append(F.col("bucket0").bitwiseXOR(F.lit(2 ** p)))
    q = q0.withColumn("bucket", F.explode(F.array(*probes))).drop("bucket0")
    joined = q.join(c, on="bucket")
    scored = joined.withColumn("cosine", cosine_sim(F.col(q_vec),
                                                    F.col(c_vec)))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(),
                                         F.col(c_id).asc())
    return (scored.withColumn("sim_rank", F.row_number().over(w))
            .filter(F.col("sim_rank") <= k)
            .select(q_id, c_id, "cosine", "sim_rank"))
