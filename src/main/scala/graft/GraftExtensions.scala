package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session extension registering the native kernels as SQL functions, so
  * `spark.sql("... cosine01(a, b) ...")` works next to the Column API —
  * similarity kernels, text kernels, and (VERDICT r7 #7) the sketch/dedup
  * kernels that were previously Column-API-only: `minhash_sig`,
  * `winnow_fps`, `token_stats`. Enable with:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Fold a required-foldable argument down to its literal value at
    * registration time. Distinct failure conditions (ADVICE r7: a
    * non-literal argument used to surface as INVALID_PARAMETER_VALUE.NULL
    * even when provably non-null): a non-foldable expression →
    * NON_FOLDABLE_ARGUMENT; a foldable-but-null one →
    * INVALID_PARAMETER_VALUE.NULL. Foldable non-literals (e.g.
    * `concat('nf','c')`) are EVALUATED, not rejected.
    */
  private def foldArg(e: Expression, fnName: String, param: String,
                      paramType: String): Any = {
    if (!e.foldable)
      throw new AnalysisException(
        "NON_FOLDABLE_ARGUMENT",
        Map(
          "funcName" -> s"`$fnName`",
          "paramName" -> s"`$param`",
          "paramType" -> s""""$paramType""""),
        None)
    val v = e.eval(InternalRow.empty)
    if (v == null)
      throw new AnalysisException(
        "INVALID_PARAMETER_VALUE.NULL",
        Map("parameter" -> s"`$param`", "functionName" -> s"`$fnName`"),
        None)
    v
  }

  private def foldInt(e: Expression, fnName: String, param: String): Int =
    foldArg(e, fnName, param, "INT") match {
      // integral check: 4.9 silently truncating to 4 would be a wrong
      // sketch width with no error — reject non-integral numerics
      case n: Number if n.doubleValue() == n.intValue().toDouble => n.intValue()
      case other => throw new AnalysisException(
        "INVALID_PARAMETER_VALUE.INTEGER",
        Map(
          "parameter" -> s"`$param`",
          "functionName" -> s"`$fnName`",
          "invalidValue" -> s"'$other'"),
        None)
    }

  /** Range-check a folded int at analysis time — the whole point of the
    * foldArg machinery is that a bad parameter fails with a clean
    * AnalysisException naming the function, never a mid-query runtime
    * error (negative slice length) or silent garbage (window 0 → [null]).
    */
  private def foldIntIn(e: Expression, fnName: String, param: String,
                        lo: Int, hi: Int): Int = {
    val v = foldInt(e, fnName, param)
    if (v < lo || v > hi)
      throw new AnalysisException(
        "INVALID_PARAMETER_VALUE.PATTERN",
        Map(
          "parameter" -> s"`$param`",
          "functionName" -> s"`$fnName`",
          "value" -> s"'$v' (expected an integer in [$lo, $hi])"),
        None)
    v
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, usage: String, arity: Int = 2)(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage,
          "", "", "", "", "", "", "built-in"),
        // arity-checked: a wrong argument count from SQL must surface as a
        // clean AnalysisException, not an IndexOutOfBoundsException
        es => {
          if (es.length != arity)
            throw new AnalysisException(
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
      es => UnicodeNormalize(es(0),
        foldArg(es(1), "unicode_normalize", "mode", "STRING").toString)
    }
    reg("minhash_sig",
      "minhash_sig(baseHashes array<bigint>, numHashes) - one-pass MinHash signature") {
      es => MinhashSig(es(0),
        foldIntIn(es(1), "minhash_sig", "numHashes", 1, 64))
    }
    reg("token_stats",
      "token_stats(text) - struct(n_tokens, sum_tlen, fingerprint, simhash) in one byte scan",
      arity = 1) {
      es => TokenStats(es(0))
    }
    reg("winnow_fps",
      "winnow_fps(gramHashes array<bigint>, window) - winnowing fingerprint selection; " +
        "pass a materialized column, not a computed expression (re-evaluated per window otherwise)") {
      es => winnowExpr(es(0),
        foldIntIn(es(1), "winnow_fps", "window", 1, 1 << 20))
    }
    reg("phash64",
      "phash64(hx string) - 64-bit blockhash perceptual fingerprint over a " +
        "hex-encoded payload (pass hex(content)); pass a materialized column, " +
        "not a computed expression",
      arity = 1) {
      es => phashExpr(es(0))
    }
  }

  /** [[graft.functions.TextFunctions.winnowFps]] rebuilt from raw Catalyst
    * nodes: a Column tree composed at injectFunction time never passes
    * through the analyzer's column-node resolution (Spark 4 keeps Column
    * and Expression as separate IRs), so the bridge form dies at codegen
    * as an Unevaluable ColumnNodeExpression. ExtensionsSpec pins value
    * equality between this and the Column form.
    */
  private def winnowExpr(h: Expression, w: Int): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val j = UnresolvedNamedLambdaVariable(Seq("j"))
    val mins = ArrayTransform(
      Sequence(Literal(1), Subtract(Size(h), Literal(w - 1)), None),
      LambdaFunction(ArrayMin(Slice(h, j, Literal(w))), Seq(j)))
    CaseWhen(
      Seq(
        (EqualTo(Size(h), Literal(0)),
          Cast(CreateArray(Seq.empty), ArrayType(LongType))),
        (LessThan(Size(h), Literal(w)), CreateArray(Seq(ArrayMin(h))))),
      Some(ArrayDistinct(mins)))
  }

  /** [[graft.multimodal.Multimodal.pHash64]] rebuilt from raw Catalyst
    * nodes (same Column-vs-Expression IR reason as [[winnowExpr]]).
    * ExtensionsSpec pins value equality with the Column form.
    */
  private def phashExpr(hx: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}
    val i = UnresolvedNamedLambdaVariable(Seq("i"))
    val nb = IntegralDivide(Cast(Length(hx), LongType), Literal(2L))
    val lo = IntegralDivide(Multiply(i, nb), Literal(64L))
    val hi = IntegralDivide(Multiply(Add(i, Literal(1L)), nb), Literal(64L))
    val chunk = Substring(hx,
      Cast(Add(Multiply(Literal(2L), lo), Literal(1L)), IntegerType),
      Cast(Multiply(Literal(2L), Subtract(hi, lo)), IntegerType))
    val pixel = Remainder(
      Cast(Conv(Substring(Md5(Cast(chunk, BinaryType)), Literal(1), Literal(8)),
        Literal(16), Literal(10)), LongType),
      Literal(256L))
    val bit = If(GreaterThanOrEqual(pixel, Literal(128L)),
      ShiftLeft(Literal(1L), Cast(i, IntegerType)), Literal(0L))
    val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    val id = UnresolvedNamedLambdaVariable(Seq("id"))
    ArrayAggregate(
      ArrayTransform(
        Sequence(Literal(0L), Literal(63L), None),
        LambdaFunction(bit, Seq(i))),
      Literal(0L),
      LambdaFunction(BitwiseOr(acc, x), Seq(acc, x)),
      LambdaFunction(id, Seq(id)))
  }
}
