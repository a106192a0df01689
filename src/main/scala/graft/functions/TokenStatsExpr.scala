package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared one-pass kernel for [[TokenStats]]: tokenize (Java-regex-`\s`
  * whitespace, same predicate as [[WsTokenCount]]), md5 each token, and
  * fold all four per-document statistics in a single traversal of the
  * UTF-8 bytes. A Scala `object` so the generated Java calls the static
  * forwarder directly.
  */
object TokenStatsKernel {

  private val Mod = 2147483647L // 2^31 - 1, matches TextFunctions.fingerprint

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val outBufs = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Returns [n_tokens, sum_tlen (code points), fingerprint, simhash]. */
  def compute(s: UTF8String): Array[Long] = {
    // one copy of the row's bytes (the md5 API needs a byte[]); the
    // explode form copied every token separately
    val bytes = s.getBytes
    val md = digests.get()
    val out = outBufs.get()
    val counters = new Array[Int](32)
    var nTok = 0L
    var sumTlen = 0L
    var fpSum = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      if (!ws) {
        val start = i
        var chars = 0L
        while (i < n && {
          val c = bytes(i)
          !(c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r')
        }) {
          // code points, not bytes: count non-continuation bytes, the same
          // value Spark's length() reports per token
          if ((bytes(i) & 0xC0) != 0x80) chars += 1
          i += 1
        }
        nTok += 1
        sumTlen += chars
        md.reset()
        md.update(bytes, start, i - start)
        md.digest(out, 0, 16)
        // hash32 = first 8 hex chars of md5 = first 4 bytes, big-endian
        // unsigned (bit-identical to TextFunctions.hash32)
        val h = ((out(0) & 0xFFL) << 24) | ((out(1) & 0xFFL) << 16) |
          ((out(2) & 0xFFL) << 8) | (out(3) & 0xFFL)
        // position-sensitive fingerprint term, 1-based position,
        // mod-per-term (terms < 2^31, so the running sum of < 2^31 of
        // them stays inside long)
        fpSum += java.lang.Math.floorMod(h * nTok, Mod)
        var bit = 0
        while (bit < 32) {
          counters(bit) += (if (((h >>> bit) & 1L) == 1L) 1 else -1)
          bit += 1
        }
      } else i += 1
    }
    var simhash = 0L
    var bit = 0
    while (bit < 32) {
      if (counters(bit) > 0) simhash |= 1L << bit
      bit += 1
    }
    Array(nTok, sumTlen, java.lang.Math.floorMod(fpSum, Mod), simhash)
  }
}

/** Fused per-document token statistics: `struct(n_tokens, sum_tlen,
  * fingerprint, simhash)` in ONE pass over the text bytes — no token
  * array, no explode, no shuffle. The previous shape (posexplode to one
  * row per token, md5 in codegen, 32 signed bit-counter sums in a
  * HashAggregate, left-join the zero-token docs back) pushed
  * tokens-per-doc × corpus rows through an exchange to compute what is a
  * per-row fold; at 100 TB the explode/shuffle dwarfs the md5 work
  * itself. Values are bit-identical to the HOF/aggregate forms
  * (PropertySpec pins all four fields; the q41/q46 DuckDB oracles pin
  * them end-to-end):
  *
  *  - n_tokens = `size(TextFunctions.tokens(text))`
  *  - sum_tlen = sum of `length(token)` (code points)
  *  - fingerprint = `TextFunctions.fingerprint(tokens)` (1-based
  *    position-weighted hash32 sum, mod-per-term, mod 2^31-1)
  *  - simhash = `TextFunctions.simhash(tokens)` (32-bit, ±1 counters)
  *
  * Zero-token (empty or all-whitespace) text → all-zero struct, the same
  * values the aggregate path's left join produced. Null text → null.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_tlen", LongType, nullable = false),
    StructField("fingerprint", LongType, nullable = false),
    StructField("simhash", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val r = TokenStatsKernel.compute(input.asInstanceOf[UTF8String])
    new GenericInternalRow(Array[Any](r(0), r(1), r(2), r(3)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val r = ctx.freshName("r")
      s"""
         |final long[] $r = graft.functions.TokenStatsKernel.compute($s);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$r[0], $r[1], $r[2], $r[3]});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
