"""Graph clustering: distributed connected components.

Reference parity: pyodibel's FAMER/Gradoop readers materialize entity
similarity graphs and derive clusters as NetworkX connected components
on the driver (reference src/pyodibel/operations/gradoop/reader.py:
21-137 — `nx.connected_components`), with `EntityCluster(cluster_id,
entities, representative)` as the output model (reference
src/pyodibel/management/clusters.py:16-33). A driver-side NetworkX
graph caps out at millions of edges; this is the Spark-native
replacement: alternating label propagation by iterative joins — each
vertex repeatedly adopts the minimum label in its closed neighborhood
until a fixed point. Converges in O(diameter) rounds; every round is
two shuffles (join + min-agg).

Scale notes: labels/lineage are truncated per round with
``localCheckpoint`` (iterative plans otherwise grow unboundedly and
re-execute from the source each round); convergence is detected with a
single count of changed labels; the edge list is symmetrized once and
cached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Cluster vertices of an undirected graph: returns
    ``(vertex, component)`` where ``component`` is the minimum vertex
    id in the connected component (a deterministic representative —
    the reference's ``EntityCluster.representative``).

    Vertices are whatever type ``src``/``dst`` share; isolated
    vertices only appear if present as a self-edge or on either side.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # min label over the closed neighborhood: own label ∪ neighbors'
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["vertex"], "inner")
            .groupBy(sym["a"].alias("vertex"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
        )
        changed = updated.filter(F.col("new_component") != F.col("component")).limit(1).count()
        labels = updated.select(
            "vertex", F.col("new_component").alias("component")
        ).localCheckpoint()
        if changed == 0:
            break
    return labels


def cluster_summary(components: DataFrame) -> DataFrame:
    """Per-cluster rollup: size + representative (= component id, the
    minimum member). Reference EntityCluster semantics
    (src/pyodibel/management/clusters.py:16-33)."""
    return components.groupBy("component").agg(
        F.count("*").alias("size"),
        F.min("vertex").alias("representative"),
    )
