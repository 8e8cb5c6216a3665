"""Similarity search over an embedding column (array<float>).

- ``cosine_top_k``  — brute-force exact top-k: one projection computing
  the cosine against a broadcast query vector + a global top-k. The
  baseline and the verifier.
- ``ivf_centroids`` / ``ivf_top_k`` — IVF-style scale path: partition
  vectors into lists (here: by an assigned cluster id — the testdata
  ``label`` column, or any k-means-ish assignment), keep per-list
  centroids, probe only the ``nprobe`` nearest lists. Search cost drops
  from N to N*nprobe/nlists; the centroid table is tiny and broadcast.

All arithmetic is zip_with/aggregate column expressions — JVM-side,
no Python per row, identical results in the DuckDB oracle
(list_cosine_similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_sim(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_top_k(
    emb: DataFrame, query_vec: list[float], id_col: str, vec_col: str, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector. The query
    vector is a constant folded into the projection — the scan streams
    once, and the top-k is a TakeOrdered (no full sort)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = emb.select(
        F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivf_centroids(emb: DataFrame, list_col: str, vec_col: str) -> DataFrame:
    """Per-list centroid = element-wise mean. posexplode + two-level
    agg keeps it fully distributed (dims are small; rows are not)."""
    exploded = emb.select(F.col(list_col), F.posexplode(F.col(vec_col)).alias("dim", "x"))
    means = exploded.groupBy(list_col, "dim").agg(F.avg("x").alias("m"))
    return means.groupBy(list_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def ivf_top_k_trained(
    emb_with_cluster: DataFrame,
    centers: list[list[float]],
    query_vec: list[float],
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 2,
    cluster_col: str = "cluster",
) -> DataFrame:
    """IVF probe against TRAINED centers (functions/kmeans.py): the
    probe ranking happens driver-side over the k literal centers
    (cosine in plain Python — deterministic and free; no Spark job),
    then the scan is pruned to the probed cluster ids with an isin
    filter that partition-prunes when the table is laid out by
    cluster. Avoids ``ivf_top_k``'s float-mean centroid recomputation
    entirely — the trained centers are exact by construction."""
    import math

    def cos(c):
        dot = 0.0
        nc = 0.0
        nq = 0.0
        for ci, qi in zip(c, query_vec):
            dot += ci * qi
            nc += ci * ci
            nq += qi * qi
        if nc == 0.0 or nq == 0.0:
            # a zero-norm center (all-zero cluster) has no direction:
            # rank it last instead of dividing by zero — the SQL oracle
            # applies the same CASE guard so the probe order matches
            return float("-inf")
        return dot / (math.sqrt(nc) * math.sqrt(nq))

    ranked = sorted(range(len(centers)), key=lambda j: (-cos(centers[j]), j))
    probed = ranked[:nprobe]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    pruned = emb_with_cluster.filter(F.col(cluster_col).isin(probed))
    scored = pruned.select(
        F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivf_top_k(
    emb: DataFrame,
    query_vec: list[float],
    id_col: str,
    vec_col: str,
    list_col: str,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF probe: rank lists by centroid cosine to the query, search
    only the top ``nprobe`` lists. The centroid ranking happens on a
    tiny broadcastable table; the main scan is pruned by a semi-join
    on the list id (partition pruning when the table is laid out by
    list id — at 100 TB, store sorted/partitioned by the IVF list)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cents = ivf_centroids(emb, list_col, vec_col)
    probe = (
        cents.withColumn("c_cos", cosine_sim(F.col("centroid"), q))
        .orderBy(F.col("c_cos").desc(), F.col(list_col))
        .limit(nprobe)
        .select(list_col)
    )
    pruned = emb.join(F.broadcast(probe), list_col, "left_semi")
    scored = pruned.select(
        F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)
