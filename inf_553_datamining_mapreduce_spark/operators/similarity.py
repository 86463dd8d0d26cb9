"""Similarity search over an embedding column (``array<float>``):
brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the 100-TB path.

No reference analog (SURVEY.md §2.9); north-star extension surface. The
cosine arithmetic lives in ``dedup.cosine_similarity`` (zip_with/aggregate —
JVM-side, deterministic order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from inf_553_datamining_mapreduce_spark.operators.dedup import cosine_similarity

# Deterministic pseudo-random hyperplanes: component h_{p,d} derived from a
# hash of (plane, dim) — symmetric about zero, no RNG state, so plans are
# stable across runs and executors.
def _hyperplane_component(plane: int, dim: int) -> F.Column:
    h = F.xxhash64(F.lit(f"plane_{plane}_dim_{dim}"))
    return (h % 2_000_001).cast("double") / F.lit(1_000_000.0)


def brute_force_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (small) is broadcast against the full embedding table — one
    pass over the big side, no shuffle of it; per-query ranking via a window
    keyed by query. Ties broken by neighbor id for determinism.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("q_emb"),
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("e_emb"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_emb"), F.col("e_emb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def signed_projections(emb_col: str, planes: list[int], dim: int) -> F.Column:
    """Bit-string bucket id: sign of the dot product with each deterministic
    hyperplane, concatenated. Runs as pure column expressions."""
    bits = []
    for p in planes:
        dot = None
        for d in range(dim):
            term = F.col(emb_col).getItem(d) * _hyperplane_component(p, d)
            dot = term if dot is None else dot + term
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with ``num_tables``
    independent bucketings; candidates = embeddings sharing a bucket with the
    query in ANY table, then exact cosine ranking of candidates only.

    At scale this replaces the all-pairs scan with a bucket-equi-join whose
    fan-in is the bucket occupancy — the standard IVF/LSH trade: recall
    depends on (planes, tables); precision of returned scores is exact.
    """
    dim = len(embeddings.select(emb_col).first()[0])
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("e_emb"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("q_emb"),
    )
    def table_planes(t: int) -> list[int]:
        return list(range(t * num_planes, (t + 1) * num_planes))

    e_buckets = e.select(
        "neighbor_id",
        "e_emb",
        *[
            signed_projections("e_emb", table_planes(t), dim).alias(f"b{t}")
            for t in range(num_tables)
        ],
    )
    q_buckets = q.select(
        "query_id",
        "q_emb",
        *[
            signed_projections("q_emb", table_planes(t), dim).alias(f"b{t}")
            for t in range(num_tables)
        ],
    )
    cand = None
    for t in range(num_tables):
        c = e_buckets.select("neighbor_id", "e_emb", F.col(f"b{t}").alias("bucket")).join(
            F.broadcast(
                q_buckets.select("query_id", "q_emb", F.col(f"b{t}").alias("bucket"))
            ),
            "bucket",
        )
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("q_emb"), F.col("e_emb")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
