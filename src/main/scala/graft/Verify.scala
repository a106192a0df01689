package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // classic (non-ANSI) eval: div-by-zero/log(0) -> null inside guarded
      // when-branches, matching the reference's IEEE float semantics
      .config("spark.sql.ansi.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
      // default; read as long (ns since epoch) — ordering semantics intact
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec warning census (VERDICT r15 #4): a full run emits ~1.4k
    // "No Partition Defined" warnings, every one from the known bounded
    // ≤`parts`-row class (ops/Ranks.scala offsets pass + catalog-sized
    // frames — ScaleAudit's measured sweep: 0 data-grained). Saturated,
    // the channel detects nothing: a NEW data-grained global window
    // would drown invisibly. So count them — PER QUERY: the raw line
    // count is nondeterministic (±1.5% run-to-run: planning calls
    // requiredChildDistribution a variable number of times), but whether
    // a given query plans ANY unpartitioned window is a plan-shape
    // boolean. The per-query census (names + count) prints at the end of
    // every run and dumps to outDir/window_census.txt; when
    // SPARK_GRAFT_WINDOW_CENSUS=<nQueries> is set (the recertification
    // ritual) a drift from the expected query count FAILS the run,
    // making the warning log a detector again without touching hundreds
    // of benign bounded-window sites.
    val windowWarnings = new java.util.concurrent.atomic.AtomicLong
    locally {
      import org.apache.logging.log4j.{Level, LogManager}
      import org.apache.logging.log4j.core.LoggerContext
      import org.apache.logging.log4j.core.config.Property
      val app = new org.apache.logging.log4j.core.appender.AbstractAppender(
          "graftWindowCensus", null, null, true, Property.EMPTY_ARRAY) {
        override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
          if (e.getMessage.getFormattedMessage.contains("No Partition Defined"))
            windowWarnings.incrementAndGet()
      }
      app.start()
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      ctx.getConfiguration.getRootLogger.addAppender(app, Level.WARN, null)
      ctx.updateLoggers()
    }
    new java.io.File(outDir).mkdirs()
    // optional comma-separated subset for local iteration (same contract as
    // Bench); the driver never sets it, so the full dump is unaffected
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // optional tier filter for local iteration (SPARK_GRAFT_TIER=core runs
    // the core tier, count in QUERIES.md); the driver never sets it
    val tier = sys.env.get("SPARK_GRAFT_TIER").map {
      case "core" => Queries.coreTier
      case other => sys.error(s"unknown SPARK_GRAFT_TIER '$other' (known: core)")
    }
    val windowQueries = scala.collection.mutable.TreeMap[String, Long]()
    SparkEntry.queries
      .filter { case (name, _) =>
        only.forall(_.contains(name)) && tier.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val before = windowWarnings.get()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally {
        spark.catalog.clearCache()
        // free checkpoint blocks clearCache does not cover (Graph CC)
        graft.ops.Caches.release()
        val d = windowWarnings.get() - before
        if (d > 0) windowQueries(name) = d
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // keep the oracle dump consistent with the dumped subset: a tier/only
    // run would otherwise hand check.py 252 oracles with no parquet to
    // compare against (the driver's full run is unaffected — no filters)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) =>
        only.forall(_.contains(k)) && tier.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    println(s"[verify] window_warnings=${windowWarnings.get()} " +
      s"window_queries=${windowQueries.size}")
    // census file only for FULL runs (the Bench artifact-gating rule): a
    // subset iteration would clobber the list the drift message says to
    // diff against (review r16)
    if (only.isEmpty && tier.isEmpty)
      Files.writeString(Paths.get(s"$outDir/window_census.txt"),
        windowQueries.map { case (n, d) => s"$n $d" }.mkString("", "\n", "\n"))
    sys.env.get("SPARK_GRAFT_WINDOW_CENSUS").foreach { raw =>
      // an unparseable value must not silently disable the gate (review
      // r16; the StreamScale unknown-op / Bench unknown-tier precedent)
      val expected = raw.toIntOption.getOrElse(sys.error(
        s"SPARK_GRAFT_WINDOW_CENSUS must be an integer query count, got '$raw'"))
      require(windowQueries.size == expected,
        s"window-warning census drift: ${windowQueries.size} queries " +
          s"emitted the warning, expected $expected — a new " +
          "unpartitioned window entered (or left) some query's plan; " +
          s"diff $outDir/window_census.txt against tools/window_census.txt " +
          "(ScaleAudit flags data-grained ones), then re-stamp")
      // the count alone would pass a SWAP (one query loses its bounded
      // window while another gains a data-grained one — exactly the event
      // the detector exists for); when the stamped name list is present,
      // require set equality and report the names (review r16)
      val stamped = Paths.get("tools/window_census.txt")
      if (Files.exists(stamped)) {
        import scala.jdk.CollectionConverters._
        val want = Files.readAllLines(stamped).asScala
          .map(_.trim).filter(_.nonEmpty).toSet
        val got = windowQueries.keySet.toSet
        require(got == want,
          "window-warning census drift (same count, different queries): " +
            s"gained ${(got -- want).toSeq.sorted.mkString(",")} " +
            s"lost ${(want -- got).toSeq.sorted.mkString(",")} — " +
            "audit the gained ones, then re-stamp tools/window_census.txt")
      }
    }
  }
}
