package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Caches, Ranks}

/** Pins Ranks.globalOrder (range-partitioned two-pass) bit-equal to the
  * naive single-partition global window it replaces, across sizes,
  * orders, partition counts, and edge shapes.
  */
class RanksSpec extends SparkSpec {

  private def data(n: Int, seed: Long): DataFrame = {
    import spark.implicits._
    // deterministic pseudo-random values; key (k1, id) is TOTAL (id unique)
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, rnd.nextInt(n / 4 + 1).toLong, rnd.nextInt(1000).toLong)
    }.toDF("id", "k1", "v")
  }

  private def naive(df: DataFrame): DataFrame = {
    val w = Window.orderBy(col("k1"), col("id"))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def twoPass(df: DataFrame, parts: Int): DataFrame =
    Ranks.globalOrder(df, Seq(col("k1"), col("id")),
      rowNum = Some("rn"), sums = Seq((col("v"), "cum")), parts = parts)

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] =
    df.select("id", "k1", "v", "rn", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)

  test("two-pass equals the naive global window across seeds and parts") {
    Caches.scoped {
      for (seed <- Seq(1L, 7L, 42L); parts <- Seq(1, 3, 8, 64)) {
        val df = data(200, seed)
        assert(rows(twoPass(df, parts)) === rows(naive(df)),
          s"mismatch at seed=$seed parts=$parts")
      }
    }
  }

  test("edge shapes: single row, empty, parts exceeding rows") {
    Caches.scoped {
      val one = data(1, 5L)
      assert(rows(twoPass(one, 16)) === rows(naive(one)))
      val empty = data(0, 5L)
      assert(twoPass(empty, 8).count() === 0L)
    }
  }

  test("descending composite order matches naive (the q314 shape)") {
    Caches.scoped {
      val df = data(150, 11L)
      val order = Seq(desc("v"), asc("id")) // total: id breaks ties
      val w = Window.orderBy(order: _*)
      val expected = df.withColumn("cum", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sortBy(_._1)
      val got = Ranks.globalOrder(df, order, sums = Seq((col("v"), "cum")),
          parts = 8)
        .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sortBy(_._1)
      assert(got === expected)
    }
  }

  test("row-number-only call (the q214 sample-rank shape)") {
    Caches.scoped {
      val df = data(120, 3L)
      val got = Ranks.globalOrder(df, Seq(col("k1"), col("id")),
          rowNum = Some("rn"), parts = 8)
        .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sortBy(_._1)
      val expected = df.withColumn("rn",
          row_number().over(Window.orderBy(col("k1"), col("id"))).cast("long"))
        .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sortBy(_._1)
      assert(got === expected)
    }
  }

  test("plan shape: no unpartitioned data-sized window survives") {
    Caches.scoped {
      val df = data(200, 9L)
      val out = twoPass(df, 8)
      out.collect()
      import org.apache.spark.sql.execution.window.WindowExec
      val wins = out.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      // the ONLY unpartitioned window left is the ≤parts-row offsets frame
      // (it may sit inside the broadcast query stage and not surface in
      // this traversal at all — hence ≤ 1, never the data-sized window)
      assert(wins.size <= 1, s"expected ≤1 bounded offsets window, got ${wins.size}")
    }
  }

  test("default parts is estimate-derived and clamped to [1, conf]") {
    Caches.scoped {
      val df = data(200, 13L)
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      val prevBytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        // a ~few-KB local frame under the default 128 MB per-partition
        // budget: the tiny-histogram callers' shape — NOT the conf-wide
        // range exchange (ADVICE r13), and value-identical either way
        val out = Ranks.globalOrder(df, Seq(col("k1"), col("id")),
          rowNum = Some("rn"), sums = Seq((col("v"), "cum")))
        assert(rows(out) === rows(naive(df)))
        assert(out.rdd.getNumPartitions < 7,
          s"expected estimate-derived small fan-out, got ${out.rdd.getNumPartitions}")
        // force the per-partition budget below the frame's estimate: the
        // derived count grows past the conf and must CLAMP to it (the
        // corpus-grained callers' shape — full conf-wide parallelism)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128")
        val wide = Ranks.globalOrder(df, Seq(col("k1"), col("id")),
          rowNum = Some("rn"), sums = Seq((col("v"), "cum")))
        assert(rows(wide) === rows(naive(df)))
        assert(wide.rdd.getNumPartitions === 7,
          s"expected conf clamp at 7, got ${wide.rdd.getNumPartitions}")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set("spark.sql.files.maxPartitionBytes", prevBytes)
      }
    }
  }
}
