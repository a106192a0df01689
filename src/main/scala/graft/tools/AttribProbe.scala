package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Scratch probe for the stream-stream attribution join: prints each
  * micro-batch's emitted pairs and the query's event-time watermarks to
  * locate where a pair is lost. Not part of the engine surface.
  */
object AttribProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val cIn = MemoryStream[(Long, Timestamp, Long)]
    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val out = graft.streaming.AttributionStream.pairs(
      cIn.toDF().toDF("user_id", "c_ts", "channel"),
      pIn.toDF().toDF("user_id", "p_ts", "cents"), horizonSec = 3600L)
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    cIn.addData(Seq((1L, ts(0L), 1L), (1L, ts(1800L), 2L),
      (1L, ts(7200L), 3L), (2L, ts(100L), 4L)))
    pIn.addData(Seq((1L, ts(1800L), 500L)))
    q.processAllAvailable()
    println("after batch1: " + spark.table("attrib").collect().toSeq)
    println("progress1: " + Option(q.lastProgress).map(_.eventTime))
    pIn.addData(Seq((1L, ts(7300L), 700L), (2L, ts(5000L), 900L)))
    q.processAllAvailable()
    println("after batch2: " + spark.table("attrib").collect().toSeq)
    println("progress2: " + Option(q.lastProgress).map(_.eventTime))
    q.stop()
    spark.stop()
  }
}

/** One-off SQL expression probe: prints `SELECT <args>` through the same
  * session config the engine runs under (ANSI off, UTC). */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT " + args.mkString(" ")).show(false)
    spark.stop()
  }
}

/** Per-round timing probe for the greedy coverage loop (q250). */
object CoverProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    def tok = graft.functions.TextFunctions.tokens(col("text"))
    val sh = graft.ops.Par.ensure(docs, "doc_id").withColumn("toks", tok)
      .withColumn("shingles", when(size(col("toks")) >= 3,
        expr("transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
      .select(col("doc_id"), explode(col("shingles")).as("sng"))
      .select(col("doc_id"), graft.functions.TextFunctions.hash32(col("sng")).as("h"))
      .distinct().persist()
    var t0 = System.nanoTime
    val stage1 = graft.ops.Par.ensure(docs, "doc_id").withColumn("toks", tok)
    println(s"[probe] tokens: ${stage1.select(sum(size(col("toks")))).collect()(0)} (${(System.nanoTime - t0) / 1e9} s)")
    t0 = System.nanoTime
    val stage2 = stage1.withColumn("shingles", when(size(col("toks")) >= 3,
        expr("transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
      .select(col("doc_id"), explode(col("shingles")).as("sng"))
    println(s"[probe] explode: ${stage2.count()} (${(System.nanoTime - t0) / 1e9} s)")
    t0 = System.nanoTime
    val stage3 = stage2.select(col("doc_id"), graft.functions.TextFunctions.hash32(col("sng")).as("h"))
    println(s"[probe] hashed: ${stage3.select(sum(col("h"))).collect()(0)} (${(System.nanoTime - t0) / 1e9} s)")
    t0 = System.nanoTime
    println(s"[probe] sh rows = ${sh.count()}  (${(System.nanoTime - t0) / 1e9} s)")
    var covered: org.apache.spark.sql.DataFrame = null
    var chosen = Seq.empty[Long]
    for (r <- 1 to 5) {
      t0 = System.nanoTime
      val remaining = if (chosen.isEmpty) sh else sh.filter(!col("doc_id").isin(chosen: _*))
      val uncov = if (covered == null) remaining
        // bcast-ok: shingles of the ≤5 chosen docs — bounded by the round cap
        else remaining.join(broadcast(covered), Seq("h"), "left_anti")
      val win = uncov.groupBy("doc_id").agg(count(lit(1)).as("gain"))
        .orderBy(desc("gain"), asc("doc_id")).limit(1).collect()(0)
      val tArg = (System.nanoTime - t0) / 1e9
      t0 = System.nanoTime
      chosen :+= win.getLong(0)
      val newCov = sh.filter(col("doc_id") === win.getLong(0)).select("h")
      covered = (if (covered == null) newCov else covered.unionByName(newCov))
        .distinct().persist()
      covered.count()
      val tCov = (System.nanoTime - t0) / 1e9
      println(f"[probe] round $r: argmax $tArg%.2f s, cover $tCov%.2f s, winner ${win.getLong(0)} gain ${win.getLong(1)}")
    }
    spark.stop()
  }
}
