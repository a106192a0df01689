package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: compare md5 vs xxhash64 minhash-LSH candidate-pair
  * and verified-pair counts on a scaled corpus (explains b45 vs q45 cost).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(
      docs.select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text")))
    Seq(false, true).foreach { fast =>
      val hashed = corpus
        .withColumn("toks", tokens(col("text")))
        .withColumn("sh", shingles(col("toks"), 3))
        .withColumn("hashes", array_distinct(shingleHashes(col("sh"), fast)))
        .select("doc_id", "hashes")
        .persist()
      val banded = hashed
        .withColumn("sig", minhashSignature(col("hashes"), 12))
        .withColumn("band", explode(lshBands(col("sig"), 4, 3)))
        .select("doc_id", "band")
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val nCand = cand.count()
      val nBandKeys = banded.select("band").distinct().count()
      val big = banded.groupBy("band").count().orderBy(desc("count")).limit(5).collect()
      big.foreach(r => println(s"[probe] fast=$fast bigBand=${r.getString(0)} size=${r.getLong(1)}"))
      println(s"[probe] fast=$fast candidates=$nCand distinctBands=$nBandKeys")
      // sample docs from the largest bucket: how long are they, do they share shingles?
      val top = big.head.getString(0)
      val sample = banded.filter(col("band") === top).limit(5)
        .join(hashed, "doc_id")
        .select(col("doc_id"), size(col("hashes")).as("n_hashes"))
        .collect()
      sample.foreach(r => println(s"[probe] fast=$fast topBandDoc=${r.getLong(0)} nHashes=${r.getInt(1)}"))
      hashed.unpersist()
    }
    spark.stop()
  }
}
