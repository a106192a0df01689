package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Census-file parse: FIRST whitespace-delimited token per line, so a
    * verbatim copy of the per-run dump re-stamps cleanly even if the dump
    * ever carries trailing fields again (ADVICE r16: the r16 dump wrote
    * `name count` lines while the gate compared whole lines — a copy
    * re-stamp made every query report as both gained and lost). */
  private[graft] def censusNames(lines: Seq[String]): Set[String] =
    lines.map(_.trim).filter(_.nonEmpty).map(_.split("\\s+")(0)).toSet

  /** Name-set drift between the run's census and the stamped one; None =
    * in sync, Some(msg) = the gained/lost detail for the gate message. */
  private[graft] def censusDrift(got: Set[String],
      stamped: Set[String]): Option[String] =
    if (got == stamped) None
    else Some(s"gained ${(got -- stamped).toSeq.sorted.mkString(",")} " +
      s"lost ${(stamped -- got).toSeq.sorted.mkString(",")}")

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
    // boolean. The per-query census (names) prints at the end of
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
    // diff against (review r16). NAMES ONLY — same format as the stamped
    // file, so `diff` is meaningful and a drift re-stamp is a verbatim
    // copy (ADVICE r16: the r16 `name count` dump diffed 100% against the
    // names-only stamp); per-query counts wobble ±1.5% run-to-run anyway
    // and the gate is the plan-shape boolean, not the count
    if (only.isEmpty && tier.isEmpty)
      Files.writeString(Paths.get(s"$outDir/window_census.txt"),
        windowQueries.keys.mkString("", "\n", "\n"))
    sys.env.get("SPARK_GRAFT_WINDOW_CENSUS").foreach { raw =>
      // an unparseable value must not silently disable the gate (review
      // r16; the StreamScale unknown-op / Bench unknown-tier precedent)
      val expected = raw.toIntOption.getOrElse(sys.error(
        s"SPARK_GRAFT_WINDOW_CENSUS must be an integer query count, got '$raw'"))
      // a subset run never emits the full census — gating one would fail
      // spuriously and point at a census file the run deliberately did
      // not write (ADVICE r16); fail the COMBINATION loudly rather than
      // silently skipping the gate the operator asked for
      if (only.nonEmpty || tier.nonEmpty) sys.error(
        "SPARK_GRAFT_WINDOW_CENSUS is a full-run gate — unset it or drop " +
          "SPARK_GRAFT_ONLY/SPARK_GRAFT_TIER (a subset never emits all " +
          s"$expected census queries)")
      require(windowQueries.size == expected,
        s"window-warning census drift: ${windowQueries.size} queries " +
          s"emitted the warning, expected $expected — a new " +
          "unpartitioned window entered (or left) some query's plan; " +
          s"diff $outDir/window_census.txt against tools/window_census.txt " +
          "(ScaleAudit flags data-grained ones), then re-stamp")
      // the count alone would pass a SWAP (one query loses its bounded
      // window while another gains a data-grained one — exactly the event
      // the detector exists for); require set equality against the
      // stamped name list and report the names (review r16)
      val stamped = sys.env.get("SPARK_GRAFT_CENSUS_FILE")
        .map(Paths.get(_)).getOrElse(Paths.get("tools/window_census.txt"))
      // a missing stamp must FAIL a gated run, not silently skip the
      // swap-detecting half — run from a non-root cwd the relative path
      // never exists, which was exactly the blind spot (ADVICE r16)
      if (!Files.exists(stamped)) sys.error(
        s"SPARK_GRAFT_WINDOW_CENSUS is set but the stamped census " +
          s"'$stamped' is missing — run from the repo root or point " +
          "SPARK_GRAFT_CENSUS_FILE at tools/window_census.txt")
      locally {
        import scala.jdk.CollectionConverters._
        val want = censusNames(Files.readAllLines(stamped).asScala.toSeq)
        censusDrift(windowQueries.keySet.toSet, want).foreach(d => sys.error(
          "window-warning census drift (same count, different queries): " +
            s"$d — audit the gained ones, then re-stamp " +
            s"tools/window_census.txt (cp $outDir/window_census.txt)"))
      }
    }
  }
}
