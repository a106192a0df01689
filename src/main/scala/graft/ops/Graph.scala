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
    val sc = edges.sparkSession.sparkContext
    val e = edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()

    // Each round's labels are localCheckpoint'ed (lineage truncation);
    // the PREVIOUS round's checkpoint blocks are freed explicitly once
    // the convergence count has read them — otherwise a deep graph
    // accumulates O(rounds × |V|) dead cache blocks until driver GC.
    // localCheckpoint is eager, so diffing the persistent-RDD registry
    // around the call captures exactly this round's blocks.
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

    var (labels, labelBlocks) = checkpointTracked(
      sym.select(col("a").as("id")).distinct().withColumn("component", col("id")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val fromNeighbours = sym
        .join(labels.withColumnRenamed("id", "b"), "b")
        .select(col("a").as("id"), col("component"))
      val (next, nextBlocks) = checkpointTracked(
        labels.unionByName(fromNeighbours)
          .groupBy("id").agg(min("component").as("component")))
      changed = next
        .join(labels.withColumnRenamed("component", "prev"), "id")
        .filter(col("component") < col("prev"))
        .count()
      free(labelBlocks) // previous round fully consumed by the count above
      labels = next
      labelBlocks = nextBlocks
      iter += 1
    }
    sym.unpersist()
    // A truncated run would silently report one component as several —
    // exactly the under-deletion this module exists to prevent. Dedup
    // graphs are shallow; hitting this bound means the input is not one.
    require(changed == 0,
      s"connectedComponents did not converge within $maxIter rounds " +
        "(component diameter exceeds maxIter); raise maxIter")
    labels
  }
}
