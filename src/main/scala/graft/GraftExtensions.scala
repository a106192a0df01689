package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session extension registering the native similarity kernels as SQL
  * functions, so `spark.sql("... cosine01(a, b) ...")` works next to the
  * Column API. Enable with:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, usage: String, arity: Int = 2)(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        // arity-checked: a wrong argument count from SQL must surface as a
        // clean AnalysisException, not an IndexOutOfBoundsException
        es => {
          if (es.length != arity)
            throw new org.apache.spark.sql.AnalysisException(
              "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              Map(
                "functionName" -> s"`$name`",
                "expectedNum" -> arity.toString,
                "actualNum" -> es.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"),
              None)
          builder(es)
        }))

    reg("cosine01", "cosine similarity remapped to [0,1]") {
      es => CosineSim01(es(0), es(1))
    }
    reg("euclidian01", "1/(1+euclidean distance)") {
      es => EuclidianSim01(es(0), es(1))
    }
    reg("manhattan01", "1/(1+manhattan distance)") {
      es => ManhattanSim01(es(0), es(1))
    }
    reg("pearson_sim", "pearson correlation, zero denominator -> 0") {
      es => PearsonSim(es(0), es(1))
    }
    reg("l2sq", "squared L2 distance") {
      es => L2Sq(es(0), es(1))
    }
    reg("ws_token_count", "whitespace token count (zero-allocation byte scan)", arity = 1) {
      es => WsTokenCount(es(0))
    }
    reg("unicode_normalize", "unicode normalization: mode 'nfc' | 'nfkc' | 'strip'") {
      es =>
        val mode = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
            v.toString
          case other => throw new org.apache.spark.sql.AnalysisException(
            "INVALID_PARAMETER_VALUE.NULL",
            Map("parameter" -> "`mode`", "functionName" -> "`unicode_normalize`",
              "expected" -> "a string literal 'nfc', 'nfkc' or 'strip'"),
            None)
        }
        UnicodeNormalize(es(0), mode)
    }
  }
}
