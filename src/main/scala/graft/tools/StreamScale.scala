package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming state-bound soak (VERDICT r13 #3): every streaming twin
  * claims bounded state (counted eviction, one-row-per-key, fixed
  * per-key payloads), but until round 14 those claims were spec-pinned
  * at toy fixture sizes only. This harness drives the heaviest stateful
  * operators over the SAME K-copy scaled corpus the batch soak uses
  * ([[Scale.materialize]]), replayed as a file-source stream in
  * micro-batches, and records the state-store totals the claims are
  * about — rows, bytes, updated/removed per batch — straight from each
  * micro-batch's StreamingQueryProgress (the numbers the Spark UI's
  * streaming tab shows).
  *
  * What "bounded" means per operator (the contract under test):
  *  - `DedupStream.detect` — state is one row per POPULATED BAND KEY,
  *    each capped at maxPerBand signatures with counted eviction: total
  *    rows grow ~linearly with distinct content (keys), BYTES PER KEY
  *    stay fixed. The soak shows rows/input tracking ~K while
  *    bytes-per-row stays flat.
  *  - `Sessions.gapSessions` — one OpenSession row per user INSIDE the
  *    watermark horizon; the event-time timeout evicts closed sessions,
  *    so rows track active users, not the stream.
  *  - `Windowed.driftMonitor` — a streaming agg keyed by (source,
  *    bucket): |sources| × 10 rows, growing only with the source
  *    catalog (horizontal K scaling grows sources K×, so rows ≈ K × 10
  *    × |base sources| — still never the document count).
  *
  * Usage: sbt 'runMain graft.tools.StreamScale <K> [ops...]'
  * (ops default: dedup_detect gap_sessions drift_monitor). Emits one
  * `[stream-scale]` JSON line per micro-batch and one `[stream-total]`
  * summary per (op, K).
  */
object StreamScale {
  private def jmap(m: Seq[(String, Any)]): String =
    m.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")

  /** Drain a streaming query over a finite file source, then report one
    * line per micro-batch from recentProgress. */
  private def drain(name: String, k: Int, q: StreamingQuery,
      inputRows: Long): Unit = {
    q.processAllAvailable()
    q.stop()
    // keep zero-input batches whose state operator still did work: the
    // event-time-timeout eviction the gap-session contract names can
    // fire on a no-data micro-batch, and dropping it would hide the
    // rows_removed evidence (review r14)
    val progs = q.recentProgress.toSeq.filter(p =>
      p.numInputRows > 0 || p.stateOperators.exists(so =>
        so.numRowsRemoved > 0 || so.numRowsUpdated > 0))
    var maxRows = 0L
    var maxBytes = 0L
    progs.foreach { p =>
      val so = p.stateOperators.headOption
      val rows = so.map(_.numRowsTotal).getOrElse(-1L)
      val bytes = so.map(_.memoryUsedBytes).getOrElse(-1L)
      maxRows = math.max(maxRows, rows)
      maxBytes = math.max(maxBytes, bytes)
      println("[stream-scale] " + jmap(Seq(
        "op" -> name, "k" -> k, "batch" -> p.batchId,
        "input_rows" -> p.numInputRows,
        "state_rows" -> rows,
        "state_bytes" -> bytes,
        "rows_updated" -> so.map(_.numRowsUpdated).getOrElse(-1L),
        "rows_removed" -> so.map(_.numRowsRemoved).getOrElse(-1L))))
    }
    println("[stream-total] " + jmap(Seq(
      "op" -> name, "k" -> k, "batches" -> progs.size,
      "input_rows" -> inputRows,
      "peak_state_rows" -> maxRows,
      "peak_state_bytes" -> maxBytes,
      "bytes_per_row" -> (if (maxRows > 0) maxBytes / maxRows else -1L))))
  }

  private val KnownOps = Set("dedup_detect", "gap_sessions", "drift_monitor")

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val ops = if (args.length > 1) args.drop(1).toSet else KnownOps
    // a typo'd op name must fail loudly, not produce a vacuously
    // "passing" soak that ran nothing (review r14; the Bench tier
    // handling precedent)
    require((ops -- KnownOps).isEmpty,
      s"unknown ops: ${(ops -- KnownOps).toSeq.sorted.mkString(",")} " +
        s"(known: ${KnownOps.toSeq.sorted.mkString(",")})")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the soak only streams documents + events; skip the relational tables
    val dir = Scale.materialize(spark, sfDir, copies,
      only = Set("documents", "events"))
    def ck(op: String): String = {
      val p = java.nio.file.Paths.get(s"target/stream-scale$copies/ck-$op")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
      p.toString
    }
    // replay each table as a finite stream: 32 writer partitions → 32
    // files → `files/trigger` micro-batches, so the per-batch progress
    // rows trace state growth ACROSS the replay, not one giant batch
    def stream(table: String, filesPerTrigger: Int): DataFrame = {
      val sch = spark.read.parquet(s"$dir/$table.parquet").schema
      spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", filesPerTrigger)
        .parquet(s"$dir/$table.parquet")
    }

    if (ops("dedup_detect")) {
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val q = graft.streaming.DedupStream.detect(
          stream("documents", 4), shingleK = 3, numHashes = 12, bands = 4)
        .writeStream.format("noop")
        .option("checkpointLocation", ck("dedup"))
        .start()
      drain("dedup_detect", copies, q, nDocs)
    }

    if (ops("gap_sessions")) {
      // replay in EVENT-TIME order (range-repartition by ts, one ascending
      // time slice per file): an unordered replay advances the watermark
      // past most of the corpus after the first batches and the soak
      // would measure late-drop filtering, not session-state tracking —
      // ordered arrival is also what a real ingest feed looks like.
      // FileStreamSource orders files by MODIFICATION TIME, which for a
      // parallel write is task-finish order, uncorrelated with the ts
      // range (review r14) — so after writing, stamp ascending mtimes in
      // part-file order (range partition i = the i-th ts slice, and part
      // file names are partition-ordered), making source order = event
      // time order deterministically.
      val ordered = s"$dir/events-ordered.parquet"
      spark.read.parquet(s"$dir/events.parquet")
        .repartitionByRange(32, col("ts"))
        .write.mode("overwrite").parquet(ordered)
      val listing = java.nio.file.Files.list(java.nio.file.Paths.get(ordered))
      val sortedParts = try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-"))
          .toSeq.sortBy(_.getFileName.toString)
      } finally listing.close()
      sortedParts.zipWithIndex.foreach { case (p, i) =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      }
      val nEv = spark.read.parquet(ordered).count()
      val sch = spark.read.parquet(ordered).schema
      // the driver has shipped events.ts both as TIMESTAMP(MICROS)
      // (reads as a timestamp type) and TIMESTAMP(NANOS) (reads as an
      // epoch-ns LONG under the nanosAsLong flag this session sets);
      // cast(long -> timestamp) would interpret ns as SECONDS, so branch
      // on the physical schema like Queries.eventsNs does (review r14)
      val tsExpr = sch("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          (col("ts") / lit(1000000000L)).cast("timestamp")
        case _ => col("ts").cast("timestamp")
      }
      val ev = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 4)
        .parquet(ordered)
        .select(tsExpr.as("ts"), col("user_id"))
      val q = graft.streaming.Sessions.gapSessions(
          ev, "ts", "user_id", gapNs = 3600L * 1000000000L,
          lateness = "1 hour")
        .writeStream.format("noop")
        .option("checkpointLocation", ck("gap"))
        .start()
      drain("gap_sessions", copies, q, nEv)
    }

    if (ops("drift_monitor")) {
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      // reference histogram from the UNSCALED base corpus — the standing
      // catalog a drift monitor compares against in deployment
      val ref = graft.streaming.Windowed.referenceHistogram(
        spark.read.parquet(s"$sfDir/documents.parquet"))
      val q = graft.streaming.Windowed.driftMonitor(
          stream("documents", 4), ref)
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", ck("drift"))
        .start()
      drain("drift_monitor", copies, q, nDocs)
    }

    spark.stop()
  }
}
