package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Zero-allocation whitespace token counter: one pass over the UTF-8
  * bytes counting maximal non-whitespace runs. Value-identical to
  * `size(filter(split(text, "\\s+"), t => length(t) > 0))` (the
  * [[TextFunctions.tokens]] form, pinned by PropertySpec), which
  * materializes the full token ARRAY per row just to take its length —
  * on the packing/stats paths (q48/q50/q63/q66/q69/q71) the count is all
  * that's needed, and at corpus scale the array allocation and substring
  * copies are the dominant cost of the stage.
  *
  * Whitespace here is exactly Java regex `\s` = [ \t\n\x0B\f\r] — NOT
  * `Character.isWhitespace` (which also accepts - and file
  * separators) and NOT Unicode spaces (NBSP is a token byte, as it is
  * for `split("\\s+")`). All six separators are single ASCII bytes, so
  * the byte scan needs no UTF-8 decoding: multi-byte sequences can never
  * contain them.
  */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def prettyName: String = "ws_token_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    // getByte(i), NOT getBytes(): the latter copies into a fresh array
    // whenever the UTF8String doesn't exactly span its backing buffer —
    // i.e. for every value sliced out of an UnsafeRow/parquet page
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var count = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      if (!ws && !inTok) { count += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val ws = ctx.freshName("ws")
      val inTok = ctx.freshName("inTok")
      val n = ctx.freshName("n")
      // getByte(i), not getBytes(): no per-row copy of the backing buffer.
      // NB: no generated line may START with "||" — the codegen Block
      // interpolator applies stripMargin('|') to the final class source,
      // which would eat the operator's first pipe and break the Java.
      s"""
         |final int $len = $s.numBytes();
         |int $n = 0;
         |boolean $inTok = false;
         |for (int $i = 0; $i < $len; $i++) {
         |  final byte $b = $s.getByte($i);
         |  final boolean $ws = $b == ' ' || $b == '\\t' || $b == '\\n' || $b == 0x0B || $b == '\\f' || $b == '\\r';
         |  if (!$ws && !$inTok) { $n++; $inTok = true; }
         |  else if ($ws) { $inTok = false; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
