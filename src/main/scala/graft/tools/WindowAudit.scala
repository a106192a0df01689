// Unpartitioned-window scale audit.
//
// A Window with an empty partitionSpec moves its whole input to ONE
// partition (WindowExec warns "No Partition Defined"). That is fine over
// a dim-bounded rollup (sources, days, buckets, k centroids) and fatal
// over anything document-grained at 100 TB. Static inspection cannot
// tell those apart — the grouping key's cardinality class is data, not
// plan — so this tool MEASURES: run every registered query at two scale
// factors with AQE off, find each WindowExec whose partitionSpec is
// empty in the executed plan, read the rows that actually flowed into
// it, and flag windows whose input grows with the scale factor.
//
//   sbt -batch 'runMain graft.tools.WindowAudit'            # all queries
//   sbt -batch 'runMain graft.tools.WindowAudit q131 q324'  # subset
//
// Output: one line per (query, window) with rows at both SFs, the
// growth ratio, and a verdict. `grep DATA-GRAINED` is the gate; rows
// that stay flat (ratio ~1) are bounded by construction.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec

object WindowAudit {
  private def rowsInto(p: SparkPlan): Long = {
    // Nearest descendant metric that counts the window's input. A plain
    // numOutputRows walk would skate past metric-less Sort/Exchange/
    // TakeOrdered nodes down to the scan and misattribute corpus-sized
    // inputs to windows that sit above a LIMIT — so stop at the single-
    // partition exchange (its records-written IS the window input) and
    // at limit operators (their output is bounded by construction).
    def find(x: SparkPlan): Option[Long] = x match {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.metrics.get("numOutputRows").map(_.value)
          .orElse(e.metrics.get("shuffleRecordsWritten").map(_.value))
          .orElse(e.children.headOption.flatMap(find))
      case l: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
        Some(math.min(l.limit.toLong,
          l.children.headOption.flatMap(find).getOrElse(l.limit.toLong)))
      case g: org.apache.spark.sql.execution.GlobalLimitExec =>
        Some(g.limit.toLong)
      case _ =>
        x.metrics.get("numOutputRows").map(_.value)
          .orElse(x.children.headOption.flatMap(find))
    }
    find(p).getOrElse(-1L)
  }

  private def unpartitionedWindows(p: SparkPlan): Seq[WindowExec] =
    p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE off so the executed plan (and its metrics) is the static
      // tree — the audit reads per-operator metrics, not wall time.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // sf0.01 → sf0.1 is the informative pair: EVERY table grows 10×
    // there (documents/embeddings are flat between sf0.001 and sf0.01,
    // which would blind the ratio test for document-grained windows).
    val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) {
        val known = graft.Queries.queries.keySet
        args.toSeq.map(a => known.find(_.startsWith(a)).getOrElse(
          sys.error(s"no registered query starts with '$a'")))
      } else graft.Queries.queries.keys.toSeq.sorted

    var flagged = 0
    names.foreach { n =>
      try {
        // rows into each unpartitioned window, per SF, in plan order
        val perSf: Seq[Seq[Long]] = sfs.map { sf =>
          val df = graft.Queries.queries(n)(spark, sf)
          // Materialize THIS queryExecution's plan (df.write would build a
          // fresh execution whose metrics this tree never sees).
          val plan = df.queryExecution.executedPlan
          plan.execute().count()
          unpartitionedWindows(plan).map(rowsInto)
        }
        spark.catalog.clearCache()
        val (small, big) = (perSf.head, perSf.last)
        big.indices.foreach { i =>
          val a = if (i < small.length) small(i) else -1L
          val b = big(i)
          val ratio = if (a > 0) b.toDouble / a else Double.NaN
          // Grown with the corpus (and past rollup size) = data-grained.
          val verdict =
            if (a >= 0 && b > 3 * math.max(a, 1L) && b > 200) "DATA-GRAINED"
            else "bounded"
          if (verdict != "bounded") flagged += 1
          println(f"[windows] $n%-28s w$i rows(lo)=$a%-8d rows(hi)=$b%-8d ratio=$ratio%.1f $verdict")
        }
        if (big.isEmpty) println(f"[windows] $n%-28s none")
      } catch {
        case e: Throwable =>
          println(s"[windows] $n ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"[windows] flagged: $flagged")
    spark.stop()
  }
}
