package graft

/** Registry consistency: the driver contract depends on these invariants. */
class QueriesSpec extends SparkSpec {

  test("every oracleSql key has a matching query") {
    val missing = Queries.oracleSql.keySet -- Queries.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("registry names are unique and non-empty") {
    val names = Queries.all.map(_._1)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.nonEmpty))
  }

  test("every registered query executes at sf0.001") {
    val failures = Queries.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, "/root/testdata/sf0.001").collect(); None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry() runs and returns rows with (name, score) schema") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length == 10)
    assert(df.columns.toSeq == Seq("name", "score"))
    // scores sorted descending
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sortBy(-_))
  }
}
