"""Connected components over near-duplicate pair graphs.

Pairwise dedup (MinHash / SimHash / embedding-cosine) emits EDGES; the
artifact a training pipeline actually needs is the CLUSTER: every document
labeled with a canonical representative so one `where doc_id = cluster_id`
keeps exactly one copy per duplicate group.

Algorithm: iterative minimum-label propagation expressed as DataFrame
joins — each round every node adopts the smallest label among itself and
its neighbors; converges in O(graph diameter) rounds.  Duplicate clusters
are near-cliques (diameter 1-2 in practice), so the loop exits after 2-3
rounds; `max_iter` bounds pathological chain graphs.  Each round is one
shuffle of (node, label) pairs — edges are never re-materialized — and
intermediate label tables are localCheckpointed so the lineage (and the
plan Spark must re-optimize) stays flat across iterations.  This is the
standard label-propagation formulation of connected components used by
large-scale dedup pipelines (cf. the alternating-star algorithms in the
MapReduce CC literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20) -> DataFrame:
    """(src, dst) edge list -> (id, component) with component = min node id
    reachable; isolated endpoints appear with themselves."""
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
         .distinct()
         .localCheckpoint())
    labels = (e.select(F.col("a").alias("id"))
              .distinct()
              .withColumn("comp", F.col("id"))
              .localCheckpoint())
    for _ in range(max_iter):
        # neighbor labels: for each edge a->b, b's current label is a
        # candidate for a
        nbr = (e.join(labels.withColumnRenamed("id", "b"), "b")
               .select(F.col("a").alias("id"), "comp"))
        new_labels = (labels.select("id", "comp").union(nbr)
                      .groupBy("id").agg(F.min("comp").alias("comp"))
                      .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.comp") != F.col("o.comp"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def duplicate_clusters(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Label every document with its duplicate-cluster id (min doc id in
    the component); documents with no near-dup edge are their own cluster.
    Output: (doc_id, cluster_id, is_canonical)."""
    comp = connected_components(pairs, "id_a", "id_b")
    out = (docs.select(F.col(id_col))
           .join(comp.withColumnRenamed("id", id_col), id_col, "left")
           .select(
               F.col(id_col),
               F.coalesce("comp", F.col(id_col)).alias("cluster_id"))
           .withColumn("is_canonical",
                       (F.col(id_col) == F.col("cluster_id"))))
    return out
