package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Demonstrates the interpreted-filter cliff behind the round-9 q108/q81
  * fixes: HOFs are CodegenFallback, so a HOF chain inside a Filter
  * CONDITION runs interpreted, and an interpreted lambda body that
  * references a COMPUTED SUBTREE (the old shingles did element_at(toks,
  * i+j) per position) re-evaluates that subtree per element — one
  * tokenize became ~positions × k tokenizes per row (filter alone: 10 s
  * at sf0.1 for 5000 docs vs 1.6 s for the whole chain in codegen).
  * Fixed at BOTH levels: shingles is now a zip of k shifted slices
  * (lambdas touch only lambda variables — bounded toks references in any
  * mode; this probe's filter leg dropped 10 s → 1.4 s), and the
  * governance queries still filter on cheap predicates of MATERIALIZED
  * columns rather than HOF chains. Usage: HofFilterProbe [sfDir]
  */
object HofFilterProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[hofprobe] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("source"), col("doc_id"), col("text"))
    time("warmup")(docs.select(sum(length(md5(col("text"))))).collect()(0).getLong(0))

    val chained = docs
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("sh", TF.shingles(col("toks"), 3))

    // the antipattern: HOF chain in the filter condition -> interpreted
    time("filter(size(sh) > 0) [interpreted]")(
      chained.filter(size(col("sh")) > 0).count())

    // the fix: same chain fully inside codegen'd projection, filter on
    // the materialized signature's null marker afterwards
    val sig = chained
      .withColumn("hashes", array_distinct(TF.shingleHashes(col("sh"))))
      .withColumn("sig", TF.minhashSignature(col("hashes"), 12))
      .select("source", "doc_id", "sig").persist()
    time("full sig frame via codegen project + persist")(sig.count())
    time("null-marker filter on cached sig")(
      sig.filter(element_at(col("sig"), 1).isNotNull).count())
    sig.unpersist(true)
    spark.stop()
  }
}
