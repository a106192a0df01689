package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure probe (VERDICT r7 #5): run registered queries under a
  * deliberately constricted execution-memory budget and record spill +
  * peak-execution-memory totals per run — the datapoint that separates
  * "spills gracefully" from "OOMs" for the persist-heavy pipelines. All
  * other scaling so far measured TIME in a roomy 128 GiB sandbox where
  * nothing ever spills; cutting `spark.memory.fraction` (the unified
  * execution+storage pool share) forces the sort/aggregate/join operators
  * through their spill paths at small corpus sizes, which is exactly what
  * a 100 TB run relies on when a partition misestimates.
  *
  * Usage: MemProbe <memoryFraction> <reps> <query...>
  * (corpus dir from SPARK_GRAFT_SF_DIR, default sf0.1; pass a
  * target/scaleK dir for the K× corpora the Scale harness writes)
  */
object MemProbe {
  def main(args: Array[String]): Unit = {
    val frac = args.headOption.getOrElse("0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q45_dedup_minhash", "q98_incremental_dedup", "q100_curation_v2")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.fraction", frac)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpilled = new LongAdder
    val diskSpilled = new LongAdder
    val spilledTasks = new LongAdder
    val peakTaskMem = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          memSpilled.add(m.memoryBytesSpilled)
          diskSpilled.add(m.diskBytesSpilled)
          if (m.memoryBytesSpilled > 0 || m.diskBytesSpilled > 0) spilledTasks.add(1)
          peakTaskMem.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
        }
      }
    })

    names.foreach { name =>
      val fn = graft.Queries.queries.get(name)
        .orElse(graft.Queries.benchOnly.toMap.get(name))
        .getOrElse(sys.error(s"unknown query $name"))
      (1 to reps).foreach { i =>
        memSpilled.reset(); diskSpilled.reset(); spilledTasks.reset()
        peakTaskMem.set(0L)
        val t0 = System.nanoTime()
        val outcome =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); "ok" }
          catch { case e: Throwable => s"FAILED ${e.getClass.getSimpleName}: ${e.getMessage}" }
        val secs = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; poll until the counters
        // hold still across two consecutive reads (ADVICE r8 — a fixed
        // sleep under-reported late TaskEnd events on task-heavy runs and
        // let them bleed into the next rep's window after the reset).
        // listenerBus.waitUntilEmpty is private[spark]; counter
        // stabilization observes the same quiescence from outside.
        def snap() = (memSpilled.sum(), diskSpilled.sum(),
          spilledTasks.sum(), peakTaskMem.get())
        var prev = snap()
        var stable = false
        var waited = 0
        while (!stable && waited < 10000) {
          Thread.sleep(200); waited += 200
          val cur = snap()
          stable = cur == prev
          prev = cur
        }
        println(f"[memprobe] frac=$frac $name run $i: $secs%.3f s  " +
          f"spill_mem=${memSpilled.sum() / 1048576}%d MiB  " +
          f"spill_disk=${diskSpilled.sum() / 1048576}%d MiB  " +
          f"spilled_tasks=${spilledTasks.sum()}%d  " +
          f"peak_task_mem=${peakTaskMem.get() / 1048576}%d MiB  $outcome")
        spark.catalog.clearCache()
        graft.ops.Caches.release()
        System.gc()
      }
    }
    spark.stop()
  }
}
