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

Scale shape: per iteration, ONE assignment projection — centers
folded in as literals for coarse k, or attached via a one-row
broadcast relation past ``LITERAL_ASSIGN_MAX_CELLS`` center cells
(``method="auto"`` picks; both are arithmetic-identical) — + ONE
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

#: ``method="auto"`` switch point: up to this many center CELLS
#: (k × dim) the assignment folds the centers into the plan as
#: literals (zero joins, whole-stage-codegen friendly — right for the
#: documented coarse-IVF intent, k≈100); past it, k*dim literal
#: expression nodes bloat plan construction/codegen and k interpreted
#: higher-order folds run per row, so the centers move into a ONE-ROW
#: broadcast relation instead (bounded plan, one fold over an array
#: attribute). 4096 ≈ the k=64×dim=64 corner; a k=4096 codebook at
#: dim=512 would be 2M literal nodes on the literal path.
LITERAL_ASSIGN_MAX_CELLS = 4096


def _quantize(vec_col, scale: int) -> F.Column:
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    )


def _divide(qvec, scale: int) -> F.Column:
    """Quantized longs back to doubles. Callers MUST materialize the
    result as its own column before handing it to an assign expr:
    codegen CSE does not dedupe higher-order-function subtrees (see
    ARCHITECTURE.md "Expression-evaluation discipline"), so an inline
    divide inside the argmin would re-run this transform once per
    CENTER per row — k×O(dim) interpreted work for nothing."""
    return F.transform(qvec, lambda q: q / F.lit(float(scale)))


def _assign_expr(dv, centers: list[list[float]]) -> F.Column:
    """Argmin-distance cluster id for one divided-vector ATTRIBUTE
    (``_divide`` output, materialized by the caller) against literal
    centers — pure column arithmetic, sequential fold, ties to the
    smallest cluster id (struct ordering of (dist, id))."""
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


def _centers_relation(spark, centers: list[list[float]], col_name: str):
    """The trained centers as a ONE-ROW DataFrame holding one
    array<array<double>> cell — broadcast-joined to the vectors so the
    plan stays O(1) in k·dim instead of folding every center value in
    as a literal node. A BroadcastNestedLoopJoin against a single-row
    side is a map-side column attach, not a data-size cross join.
    ``col_name`` is chosen by the caller to not collide with any input
    column (the join would otherwise make the reference ambiguous)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(col_name, T.ArrayType(T.ArrayType(T.DoubleType())), False)]
    )
    return spark.createDataFrame([([[float(c) for c in cen] for cen in centers],)], schema)


def _assign_broadcast_expr(dv, k: int, centers_col: str) -> F.Column:
    """Argmin-distance cluster id against the ``centers_col`` column of
    a joined one-row centers relation, over a divided-vector ATTRIBUTE
    (``_divide`` output, materialized by the caller). IDENTICAL
    arithmetic to ``_assign_expr`` — same quantize/divide, same
    left-to-right sequential fold per dimension, same struct-ordered
    tie-break to the smallest cluster id — so both paths produce
    bit-equal assignments (pinned by
    test_kmeans_assign_broadcast_matches_literal)."""

    def dist(j):
        cen = F.element_at(F.col(centers_col), j + 1)
        return F.aggregate(
            F.zip_with(dv, cen, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda s, v: s + v,
        )

    cands = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.struct(dist(j).alias("d"), j.alias("j")),
    )
    return F.array_min(cands)["j"]


def _resolve_assign_method(method: str, k: int, dim: int) -> str:
    if method not in ("auto", "literal", "broadcast"):
        raise ValueError(f"method must be 'auto', 'literal' or 'broadcast', got {method!r}")
    if method != "auto":
        return method
    return "literal" if k * max(dim, 1) <= LITERAL_ASSIGN_MAX_CELLS else "broadcast"


def kmeans_train(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
    scale: int = DEFAULT_SCALE,
    method: str = "auto",
) -> list[list[float]]:
    """Run ``iters`` Lloyd iterations; returns the trained centers as
    plain Python lists (doubles). Driver-side collects per iteration
    are k seed rows and k*dim integer sums — never data rows. With
    fewer than ``k`` input rows the model has one center per row
    (matching the SQL replay); an empty input raises ValueError.
    ``method`` picks the per-iteration assignment shape (see
    ``kmeans_assign``); both shapes are arithmetic-identical, so the
    trained centers do not depend on it."""
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
    how = _resolve_assign_method(method, k, len(centers[0]))
    # the divided vector is materialized ONCE, outside the loop — an
    # inline divide would re-run the transform per center per row
    qd = q.withColumn("_dv", _divide(F.col("_qv"), scale))
    for _ in range(iters):
        if how == "broadcast":
            # qd has only internal columns (_id/_qv/_dv), so "_centers" can't collide
            assigned = qd.crossJoin(
                F.broadcast(_centers_relation(emb.sparkSession, centers, "_centers"))
            ).select(
                _assign_broadcast_expr(F.col("_dv"), k, "_centers").alias("_c"), "_qv"
            )
        else:
            assigned = qd.select(_assign_expr(F.col("_dv"), centers).alias("_c"), "_qv")
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
    method: str = "auto",
) -> DataFrame:
    """Attach the argmin-distance ``cluster`` column for the given
    centers — no shuffle, no Python per row, bit-identical assignments
    under every ``method``:

    - ``"literal"``: centers folded into the projection as literal
      arrays — zero joins, but O(k·dim) plan nodes and k interpreted
      folds per row; right for coarse IVF lists (k≈100).
    - ``"broadcast"``: centers in a one-row broadcast relation joined
      to the scan (BroadcastNestedLoopJoin against a single row = a
      map-side column attach), argmin as ONE fold over the centers
      array attribute — bounded plan size for large-k codebooks.
    - ``"auto"`` (default): literal up to ``LITERAL_ASSIGN_MAX_CELLS``
      center cells, broadcast past it."""
    how = _resolve_assign_method(method, len(centers), len(centers[0]) if centers else 0)
    # collision-proof internal column names (a user column of the same
    # name would make references ambiguous and .drop() would strip
    # their data)
    dcol = "_dv"
    while dcol in emb.columns:
        dcol = "_" + dcol
    # divided vector materialized ONCE: inline it and the HOF transform
    # re-evaluates per center per row (codegen CSE skips lambda subtrees)
    divided = emb.withColumn(dcol, _divide(_quantize(F.col(vec_col), scale), scale))
    if how == "broadcast":
        ccol = "_centers"
        while ccol in emb.columns or ccol == dcol:
            ccol = "_" + ccol
        return (
            divided.crossJoin(F.broadcast(_centers_relation(emb.sparkSession, centers, ccol)))
            .withColumn(
                "cluster",
                _assign_broadcast_expr(F.col(dcol), len(centers), ccol),
            )
            .drop(ccol, dcol)
        )
    return divided.withColumn("cluster", _assign_expr(F.col(dcol), centers)).drop(dcol)
