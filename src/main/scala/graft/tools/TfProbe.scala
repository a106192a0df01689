package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Straggler probe for q85's per-document term-frequency stage (VERDICT
  * r8 #3): times the retired O(L·D) form (explode distinct + recount the
  * whole array per term) against the sorted run-length form on synthetic
  * LONG documents — the shape where the quadratic term turns one task
  * into a straggler (100k tokens × ~30k distinct ≈ 3×10⁹ comparisons in
  * one row). Usage: TfProbe [docTokens] [distinct] [docs] [reps]
  */
object TfProbe {
  def main(args: Array[String]): Unit = {
    val docTokens = args.headOption.map(_.toInt).getOrElse(100000)
    val distinct = if (args.length > 1) args(1).toInt else 30000
    val nDocs = if (args.length > 2) args(2).toInt else 8
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Zipf-ish long docs: token t_i drawn as (j*j + doc) % distinct so
    // every doc has ~`distinct` distinct terms and deterministic content
    val docs = (1 to nDocs).map { d =>
      val toks = Array.tabulate(docTokens)(j => "t" + (((j.toLong * j) + d) % distinct))
      (d.toLong, toks)
    }.toDF("doc_id", "toks").persist()
    docs.count()

    def time(label: String, tfs: DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = tfs.agg(count(lit(1)), sum(col("tf"))).collect()(0)
        println(f"[tfprobe] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
          s"(rows=${n.getLong(0)}, sum_tf=${n.getLong(1)})")
      }

    // retired form: O(L·D) per row
    val quad = docs
      .select(col("doc_id"), col("toks"),
        explode(array_distinct(col("toks"))).as("tok"))
      .select(col("doc_id"), col("tok"),
        size(filter(col("toks"), x => x === col("tok"))).cast("long").as("tf"))

    // current form: staged sorted run-length, O(L log L) per row
    val srtCol = array_sort(col("toks"))
    val startsCol = when(size(col("srt")) === 0, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(1), size(col("srt"))), i =>
        i === 1 || element_at(col("srt"), i) =!=
          element_at(col("srt"), greatest(i - 1, lit(1)))))
    val endsCol = when(size(col("starts")) === 0, array().cast("array<int>"))
      .otherwise(concat(
        slice(col("starts"), lit(2), greatest(size(col("starts")) - 1, lit(0))),
        array(size(col("srt")) + 1)))
    val runLen = docs
      .select(col("doc_id"), srtCol.as("srt"))
      .select(col("doc_id"), col("srt"), startsCol.as("starts"))
      .select(col("doc_id"), col("srt"), col("starts"), endsCol.as("ends"))
      .select(col("doc_id"),
        explode(zip_with(col("starts"), col("ends"), (s0, e0) =>
          struct(element_at(col("srt"), s0).as("tok"),
            (e0 - s0).cast("long").as("tf")))).as("r"))
      .select(col("doc_id"), col("r.tok").as("tok"), col("r.tf").as("tf"))

    println(s"[tfprobe] $nDocs docs x $docTokens tokens, ~$distinct distinct")
    time("runlength", runLen)
    time("quadratic", quad)
    spark.stop()
  }
}
