"""Deterministic distributed k-means (Lloyd) for IVF list training.

``similarity.ivf_top_k`` prunes the ANN scan by a precomputed list
column; at 100 TB the vectors arrive UNLABELED, so the missing first
step of the ANN story is a distributed trainer that produces those
lists from raw vectors. This is that trainer, built engine-portable
the same way the LSH hyperplanes are (dedup.random_hyperplanes): every
arithmetic step is reproducible bit-for-bit in any IEEE-754 engine, so
the DuckDB oracle replays the identical iterations and the driver's
hash gate can pin cluster assignments exactly.

Determinism rules (each rules out a float-ordering hazard):

- vectors are QUANTIZED up front: ``q_i = floor(x_i * scale + 0.5)``
  as int64 — float multiply/add/floor are single IEEE ops, identical
  everywhere;
- initial centers are the first ``k`` vectors ordered by
  ``(md5(id), id)`` — the same seeded-order trick the samplers use;
- centroid updates SUM the integer quanta (exact, order-free) and
  divide once: ``c_i = sum_q / (scale * n)`` — one deterministic
  double division, never a float mean (whose summation order Spark
  does not fix);
- distances fold ``(x_i/scale - c_i)^2`` left-to-right over dims
  (``F.aggregate`` over ``zip_with`` — a sequential lambda fold), and
  argmin ties break to the smallest cluster id via struct-ordered
  ``array_min``;
- a cluster that loses all points keeps its previous center.

Scale shape: per iteration, ONE assignment projection (centers are
literal arrays folded into the plan — no join) + ONE
``groupBy(cluster, dim)`` over posexploded quanta (k*dim groups,
map-side combined), then k*dim sums collected to the driver (k=100,
dim=1024 → 100k tiny rows; the same centers-on-driver loop Spark
MLlib's KMeans performs). The iteration count is fixed and small —
Lloyd for IVF needs coarse lists, not convergence.

No reference counterpart (the reference has no ANN surface at all);
this completes the IVF path flagged in round 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 1000


def _quantize(vec_col, scale: int) -> F.Column:
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    )


def _assign_expr(qvec, centers: list[list[float]], scale: int) -> F.Column:
    """Argmin-distance cluster id for one quantized vector against
    literal centers — pure column arithmetic, sequential fold, ties to
    the smallest cluster id (struct ordering of (dist, id))."""
    dv = F.transform(qvec, lambda q: q / F.lit(float(scale)))
    cands = []
    for j, cen in enumerate(centers):
        lit_c = F.array(*[F.lit(float(c)) for c in cen])
        dist = F.aggregate(
            F.zip_with(dv, lit_c, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        cands.append(F.struct(dist.alias("d"), F.lit(j).alias("j")))
    return F.array_min(F.array(*cands))["j"]


def kmeans_train(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
    scale: int = DEFAULT_SCALE,
) -> list[list[float]]:
    """Run ``iters`` Lloyd iterations; returns the trained centers as
    plain Python lists (doubles). Driver-side collects per iteration
    are k seed rows and k*dim integer sums — never data rows. With
    fewer than ``k`` input rows the model has one center per row
    (matching the SQL replay); an empty input raises ValueError."""
    if k < 1:
        raise ValueError(f"kmeans_train requires k >= 1, got {k}")
    q = emb.select(F.col(id_col).alias("_id"), _quantize(F.col(vec_col), scale).alias("_qv"))
    seed_rows = (
        q.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id")).limit(k).collect()
    )
    centers = [[qi / float(scale) for qi in r["_qv"]] for r in seed_rows]
    if not centers:
        raise ValueError("kmeans_train requires at least one input row")
    # fewer rows than k: train one center per row — the same outcome
    # the SQL replay produces (its seed CTE simply yields fewer rows)
    k = len(centers)
    for _ in range(iters):
        assigned = q.select(_assign_expr(F.col("_qv"), centers, scale).alias("_c"), "_qv")
        sums = (
            assigned.select("_c", F.posexplode("_qv").alias("_dim", "_q"))
            .groupBy("_c", "_dim")
            .agg(F.sum("_q").alias("_s"), F.count("*").alias("_n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r["_c"], {})[r["_dim"]] = (r["_s"], r["_n"])
        centers = [
            [
                by_cluster[j][d][0] / (float(scale) * by_cluster[j][d][1])
                for d in range(len(centers[j]))
            ]
            if j in by_cluster
            else centers[j]  # empty cluster: keep the previous center
            for j in range(k)
        ]
    return centers


def kmeans_assign(
    emb: DataFrame,
    centers: list[list[float]],
    id_col: str,
    vec_col: str,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Attach the argmin-distance ``cluster`` column for the given
    centers — one narrow projection, no shuffle, no Python per row."""
    return emb.withColumn(
        "cluster", _assign_expr(_quantize(F.col(vec_col), scale), centers, scale)
    )
