"""Similarity-graph construction + FAMER link filtering — parity with
the reference's driver-side NetworkX pipeline
(/root/reference/src/pyodibel/operations/gradoop/graph_construction.py).

The reference builds an in-memory ``networkx.Graph`` from externally
computed ``(u, v, sim)`` edges (graph_construction.py:11-17) and prunes
it with ``filter_links`` (graph_construction.py:19-99): per entity and
per other *resource* (source dataset), neighbors sort by similarity;
an edge survives as **strong** when it is a max-similarity link in BOTH
directions (reciprocal best match, ties included) and as **normal**
when it is a max-similarity link in exactly one direction; everything
else is weak and removed, after which clusters re-form as connected
components. That loop is O(cluster²) driver-side Python.

Spark-first design, three scale-safe stages:

1. :func:`build_similarity_edges` — the edge list the reference takes
   as input, built *from raw entities* here: blocked self-join (never a
   global cross join) restricted to cross-resource pairs, per-property
   similarity from built-in expressions (exact / token-Jaccard /
   normalized Levenshtein), weight-averaged.
2. :func:`classify_links` — the reciprocal-best-match semantics as two
   shuffles: a window max per (entity, other-resource) marks
   directional best edges; a self-join marks reciprocity. The
   reference's tied-best subtlety (graph_construction.py:58-81)
   collapses exactly to: a directional best edge u→v is strong iff
   sim(u,v) equals v's max toward u's resource — because that max is
   always ≥ sim(u,v), and equality puts u in v's tied-best list by
   construction.
3. :func:`filter_similarity_links` / :func:`similarity_clusters` —
   keep the requested link types (reference ``types=['normal',
   'strong']``) and re-cluster with the distributed
   ``connected_components``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: reference link-type vocabulary (graph_construction.py:19 ``types``)
LINK_TYPES = ("strong", "normal")

COMPARATOR_KINDS = ("exact", "jaccard", "levenshtein")


@dataclass(frozen=True)
class PropertyComparator:
    """One per-property similarity term: ``prop`` is a key of the
    entity ``props`` map (FAMER vertex layout, sources/famer.py),
    ``kind`` one of exact / jaccard (whitespace-token Jaccard) /
    levenshtein (1 - distance/max-length), ``weight`` its share of
    the weighted average."""

    prop: str
    kind: str = "exact"
    weight: float = 1.0

    def __post_init__(self):
        if self.kind not in COMPARATOR_KINDS:
            raise ValueError(f"unknown comparator kind {self.kind!r}; one of {COMPARATOR_KINDS}")
        if self.weight <= 0:
            raise ValueError("comparator weight must be > 0")


def _prop_sim(kind: str, a: F.Column, b: F.Column) -> F.Column:
    if kind == "exact":
        return (a == b).cast("double")
    if kind == "jaccard":
        ta = F.array_distinct(F.split(F.lower(F.trim(a)), r"\s+"))
        tb = F.array_distinct(F.split(F.lower(F.trim(b)), r"\s+"))
        union = F.size(F.array_union(ta, tb))
        return F.when(union == 0, F.lit(0.0)).otherwise(
            F.size(F.array_intersect(ta, tb)) / union
        )
    # levenshtein, normalized to [0, 1]
    longest = F.greatest(F.length(a), F.length(b))
    return F.when(longest == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / longest
    )


def build_similarity_edges(
    vertices: DataFrame,
    comparators: list[PropertyComparator],
    block_on: str,
    min_sim: float = 0.0,
    id_col: str = "id",
    resource_col: str = "resource",
    props_col: str = "props",
    cross_resource_only: bool = True,
) -> DataFrame:
    """Weighted similarity edge list from raw FAMER entities — the
    input the reference's ``build_graph`` assumes already exists
    (graph_construction.py:11-17; nothing in the reference computes it
    distributed).

    ``block_on`` names the props key used as the blocking key: pairs
    are generated only *within* a block (equi-join on the key), never
    by a global cross join — the O(n²/b) candidate bound that makes
    this runnable at 100 TB. Choose a key with bounded block sizes
    (e.g. a name prefix or a sorted token signature); entities with a
    null key produce no pairs. Multi-key blocking = union of calls
    with different keys, then ``dropDuplicates(["src","dst"])``.

    Per-property similarities are null-tolerant: a property missing on
    either side drops out of both the numerator and the weight sum;
    pairs sharing no compared property are dropped. ``min_sim``
    prunes low-similarity edges before they ever shuffle onward.
    Output: (src, dst, sim) with src < dst, both directions implied.
    """
    if not comparators:
        raise ValueError("at least one PropertyComparator required")
    base = vertices.select(
        F.col(id_col).alias("_vid"),
        F.col(resource_col).alias("_res"),
        F.col(props_col)[block_on].alias("_blk"),
        *[F.col(props_col)[c.prop].alias(f"_p_{i}") for i, c in enumerate(comparators)],
    ).filter(F.col("_blk").isNotNull())
    a = base.select(
        F.col("_blk"),
        F.col("_vid").alias("src"),
        F.col("_res").alias("res_src"),
        *[F.col(f"_p_{i}").alias(f"_a_{i}") for i in range(len(comparators))],
    )
    b = base.select(
        F.col("_blk"),
        F.col("_vid").alias("dst"),
        F.col("_res").alias("res_dst"),
        *[F.col(f"_p_{i}").alias(f"_b_{i}") for i in range(len(comparators))],
    )
    pairs = a.join(b, "_blk").filter(F.col("src") < F.col("dst"))
    if cross_resource_only:
        pairs = pairs.filter(F.col("res_src") != F.col("res_dst"))
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i, c in enumerate(comparators):
        pa, pb = F.col(f"_a_{i}"), F.col(f"_b_{i}")
        present = pa.isNotNull() & pb.isNotNull()
        num = num + F.when(present, _prop_sim(c.kind, pa, pb) * c.weight).otherwise(F.lit(0.0))
        den = den + F.when(present, F.lit(float(c.weight))).otherwise(F.lit(0.0))
    sim = F.when(den > 0, num / den)
    return (
        pairs.select("src", "dst", sim.alias("sim"))
        .filter(F.col("sim").isNotNull() & (F.col("sim") >= min_sim))
        .dropDuplicates(["src", "dst"])
    )


def classify_links(
    edges: DataFrame,
    resources: DataFrame,
    id_col: str = "id",
    resource_col: str = "resource",
) -> DataFrame:
    """Tag undirected similarity edges with the reference's link type
    (graph_construction.py:52-81): **strong** = max-similarity link in
    both directions (per other-resource, ties count), **normal** = max
    in exactly one direction, **weak** = neither. Distributed shape:
    expand to directed edges, attach the destination's resource, one
    window max over (src, res_dst) marks directional bests, one
    self-join on the reversed pair marks reciprocity.

    ``resources``: (id, resource) for every vertex — e.g. the FAMER
    vertex table. Output: (src, dst, sim, link_type) with src < dst.
    """
    res = resources.select(F.col(id_col).alias("_rid"), F.col(resource_col).alias("_rres"))
    directed = edges.select("src", "dst", "sim").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "sim")
    )
    directed = directed.join(
        res.withColumnRenamed("_rid", "dst").withColumnRenamed("_rres", "res_dst"),
        "dst",
    )
    w = Window.partitionBy("src", "res_dst")
    best = (
        directed.withColumn("_max", F.max("sim").over(w))
        .filter(F.col("sim") == F.col("_max"))
        .select("src", "dst", "sim")
    )
    reciprocal = best.alias("f").join(
        best.alias("r"),
        (F.col("f.src") == F.col("r.dst")) & (F.col("f.dst") == F.col("r.src")),
        "left_semi",
    )
    strong = reciprocal.filter(F.col("src") < F.col("dst")).select(
        "src", "dst", F.lit("strong").alias("link_type")
    )
    best_und = (
        best.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        ).distinct()
    )
    classified = best_und.join(strong.select("src", "dst", "link_type"), ["src", "dst"], "left")
    classified = classified.select(
        "src", "dst", F.coalesce("link_type", F.lit("normal")).alias("link_type")
    )
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "sim",
        )
        .join(classified, ["src", "dst"], "left")
        .select("src", "dst", "sim", F.coalesce("link_type", F.lit("weak")).alias("link_type"))
    )


def filter_similarity_links(
    edges: DataFrame,
    resources: DataFrame,
    types: tuple[str, ...] = ("strong", "normal"),
    id_col: str = "id",
    resource_col: str = "resource",
) -> DataFrame:
    """Keep the requested link types (reference filter_links ``types``
    parameter, graph_construction.py:19 — default keeps normal+strong,
    strong-only is the precision setting). Reference parity details:
    strong edges are kept UNCONDITIONALLY (graph_construction.py:73-77
    adds reciprocal-best edges outside the ``types`` check; only the
    one-directional branch consults it), and weak links never survive,
    mirroring the unconditional removal."""
    bad = set(types) - set(LINK_TYPES)
    if bad:
        raise ValueError(f"unknown link types {sorted(bad)}; valid: {LINK_TYPES}")
    classified = classify_links(edges, resources, id_col, resource_col)
    keep = set(types) | {"strong"}
    return classified.filter(F.col("link_type").isin(sorted(keep)))


def similarity_clusters(
    vertices: DataFrame,
    comparators: list[PropertyComparator],
    block_on: str,
    min_sim: float = 0.0,
    types: tuple[str, ...] = ("strong", "normal"),
    id_col: str = "id",
    resource_col: str = "resource",
    props_col: str = "props",
) -> DataFrame:
    """End-to-end: raw entities → blocked similarity edges → link
    filtering → connected components (the reference's
    build_graph → filter_links → nx.connected_components →
    Cluster list, graph_construction.py:88-99, distributed).
    Output: (cluster, id, resource) — singleton entities keep their
    own id as cluster, matching famer_clusters' convention."""
    from odibel_spark.sources.famer import famer_clusters

    edges = build_similarity_edges(
        vertices, comparators, block_on, min_sim, id_col, resource_col, props_col
    )
    kept = filter_similarity_links(edges, vertices, types, id_col, resource_col)
    return famer_clusters(
        vertices.select(F.col(id_col).alias("id"), F.col(resource_col).alias("resource")),
        kept.select("src", "dst"),
    )
