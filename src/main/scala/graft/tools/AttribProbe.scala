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
