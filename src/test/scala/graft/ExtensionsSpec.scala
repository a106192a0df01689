package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions registers the native kernels into a session's function
  * registry — SQL-addressable next to the Column API.
  */
class ExtensionsSpec extends SparkSpec {

  test("kernels are callable from SQL via spark.sql.extensions") {
    val base = spark // ensure shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // config("spark.sql.extensions", "graft.GraftExtensions") is the
      // spark-submit path (static conf, read at SparkContext creation);
      // here the context already exists, so inject programmatically.
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
      val r = ext.sql(
        """SELECT cosine01(array(1.0D, 2.0D), array(1.0D, 2.0D)) AS c,
          |       euclidian01(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS e,
          |       manhattan01(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS m,
          |       pearson_sim(array(1.0D, 1.0D), array(1.0D, 2.0D)) AS p,
          |       l2sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l
          |""".stripMargin).collect()(0)
      assert(approx(r.getDouble(0), 1.0))
      assert(approx(r.getDouble(1), 1.0 / 6.0))
      assert(approx(r.getDouble(2), 1.0 / 8.0))
      assert(r.getDouble(3) == 0.0) // constant input -> den 0 -> 0
      assert(approx(r.getDouble(4), 25.0))

      val r2 = ext.sql(
        """SELECT ws_token_count(' a  b   c ') AS n,
          |       unicode_normalize('café', 'nfc') AS nfc,
          |       unicode_normalize('café', 'strip') AS st
          |""".stripMargin).collect()(0)
      assert(r2.getInt(0) == 3)
      assert(r2.getString(1) == "café")
      assert(r2.getString(2) == "cafe")

      // wrong arity from SQL -> clean AnalysisException naming the
      // function, not an IndexOutOfBoundsException from the builder
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        ext.sql("SELECT cosine01(array(1.0D))").collect()
      }
      assert(e.getMessage.contains("cosine01"))
      assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")

      // a non-literal mode must fail analysis cleanly, not at runtime
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        ext.sql("SELECT unicode_normalize('x', concat('nf', 'c'))").collect()
      }
      assert(e2.getMessage.contains("unicode_normalize"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
