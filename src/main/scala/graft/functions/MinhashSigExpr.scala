package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass MinHash signature kernel: all `numHashes` affine-permutation
  * minima (h·multₖ + addₖ mod 2³²) in a SINGLE traversal of the base-hash
  * array with zero intermediate allocation. The HOF form
  * (`array_min(transform(...))` × numHashes) walks the array once per
  * permutation and allocates a permuted copy each time — numHashes× the
  * memory traffic of the sketch itself; at 100 TB the signature stage is
  * pure per-row compute, so the fused loop is the shape that scales.
  *
  * Value semantics are IDENTICAL to the HOF form (the q45 DuckDB oracle
  * pins them): constants from [[TextFunctions.minhashConsts]], null
  * elements skipped (as `array_min` skips them), empty/all-null input →
  * an all-null signature (which [[TextFunctions.lshBands]] turns into
  * zero band keys). MinHash sketch per Broder '97; one-hash affine
  * rederivation is the standard many-permutations trick.
  */
case class MinhashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 64, "numHashes must be in [1, 64]")

  private val consts: IndexedSeq[(Long, Long)] =
    (0 until numHashes).map(TextFunctions.minhashConsts)

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> base hashes, got ${other.simpleString}")
  }

  private def isIntElem: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = if (isIntElem) arr.getInt(i).toLong else arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          val (m, a) = consts(k)
          // floorMod, not %: the HOF reference uses pmod, and the type
          // check admits signed inputs (e.g. murmur3 hash()) whose affine
          // image can be negative
          val p = java.lang.Math.floorMod(h * m + a, 4294967296L)
          if (p < mins(k)) mins(k) = p
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(v =>
      if (v == Long.MaxValue) null else Long.box(v)): Array[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      val getElem = if (isIntElem) s"(long) $arr.getInt($i)" else s"$arr.getLong($i)"
      val perK = consts.zipWithIndex.map { case ((m, a), k) =>
        s"$p = java.lang.Math.floorMod($h * ${m}L + ${a}L, 4294967296L); " +
          s"if ($p < $mins[$k]) $mins[$k] = $p;"
      }.mkString("\n")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |long $p;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  final long $h = $getElem;
         |  $perK
         |}
         |final Object[] $out = new Object[$numHashes];
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  $out[$i] = $mins[$i] == Long.MAX_VALUE ? null : (Object) (Long) $mins[$i];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
