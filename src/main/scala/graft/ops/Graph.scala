package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph helpers for dedup-cluster resolution: the pair lists
  * the dedup families emit (exact / minhash / simhash / n-gram) are EDGES;
  * a curation pipeline must collapse them into connected components and
  * keep one representative per component. Pairs alone under-delete: if
  * A~B and B~C but A!~C, keeping "one of each pair" can still retain two
  * near-identical documents.
  */
object Graph {

  /** Connected components by HashMin label propagation: every node starts
    * labelled with its own id; each round every node takes the min label
    * among itself and its neighbours; converges in O(component diameter)
    * rounds to the component-minimum id.
    *
    * Scale shape: each round is one shuffle of the (symmetrized) edge
    * list joined to the current labels plus a map-side-combined min
    * aggregate — the standard large-graph CC shape (GraphX/Pregel's
    * HashMin). `localCheckpoint` truncates the lineage each round so the
    * plan does not grow with iterations, and the driver-side loop reads
    * only a changed-row COUNT per round (an aggregate, never data).
    * Dedup graphs converge fast: near-dup components are shallow
    * (duplicates of one source document), so rounds ≈ 2-4 in practice.
    *
    * Returns (id, component) with component = min node id reachable.
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()

    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val fromNeighbours = sym
        .join(labels.withColumnRenamed("id", "b"), "b")
        .select(col("a").as("id"), col("component"))
      val next = labels.unionByName(fromNeighbours)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      changed = next
        .join(labels.withColumnRenamed("component", "prev"), "id")
        .filter(col("component") < col("prev"))
        .count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
