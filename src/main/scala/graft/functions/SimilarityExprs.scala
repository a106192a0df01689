package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native, whole-stage-codegen similarity kernels over numeric array
  * columns — the hot path of every scoring join (q30-q38, q60). The HOF
  * forms in [[VectorFunctions]] (`zip_with` + `aggregate`) are evaluated
  * interpreted (HigherOrderFunction has no `doGenCode`), allocate an
  * intermediate array per row, and walk the vector once per aggregate;
  * these kernels fuse dot/norm/diff accumulation into ONE branch-free
  * generated loop with zero allocation.
  *
  * Value semantics are IDENTICAL to the HOF forms (the DuckDB oracle
  * pins them): per-element cast to double, sequential left-to-right
  * accumulation, Spark's null-on-zero-divisor division, null result for
  * null inputs / mismatched lengths / null elements.
  *
  * Reference formulas: `src/Server/SimilarityMethods.cs:55-113`.
  */
abstract class SimilarityKernel extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Accumulator names and the Java statement run per element (x, y are
    * double element values); `finish` computes ev.value / ev.isNull from
    * the accumulators.
    */
  protected def accumulators: Seq[String] // java double accumulator names
  protected def perElement(x: String, y: String): String
  protected def finish(ev: ExprCode, n: String): String
  protected def computeResult(accs: Array[Double], n: Int): Option[Double]

  private def elemGet(arr: String, et: DataType, i: String): String = et match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lt = elemType(left); val rt = elemType(right)
    val accs = new Array[Double](accumulators.length)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = lt match {
        case FloatType => x.getFloat(i).toDouble
        case DoubleType => x.getDouble(i)
        case IntegerType => x.getInt(i).toDouble
        case LongType => x.getLong(i).toDouble
      }
      val yv = rt match {
        case FloatType => y.getFloat(i).toDouble
        case DoubleType => y.getDouble(i)
        case IntegerType => y.getInt(i).toDouble
        case LongType => y.getLong(i).toDouble
      }
      accumulate(accs, xv, yv)
      i += 1
    }
    computeResult(accs, n).map(Double.box).orNull
  }

  protected def accumulate(accs: Array[Double], x: Double, y: Double): Unit

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val decls = accumulators.map(acc => s"double $acc = 0.0;").mkString("\n")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  $decls
         |  boolean _anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { _anyNull = true; break; }
         |    final double $x = ${elemGet(a, elemType(left), i)};
         |    final double $y = ${elemGet(b, elemType(right), i)};
         |    ${perElement(x, y)}
         |  }
         |  if (_anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${finish(ev, n)}
         |  }
         |}
       """.stripMargin
    })
}

/** Reference Cosine remapped to [0,1]: (dot/(|a||b|) + 1)/2; zero norm →
  * null (Spark's zero-divisor semantics, matching the HOF form).
  */
case class CosineSim01(left: Expression, right: Expression) extends SimilarityKernel {
  override def prettyName: String = "cosine01"
  protected val accumulators = Seq("_dot", "_na", "_nb")
  protected def perElement(x: String, y: String): String =
    s"_dot += $x * $y; _na += $x * $x; _nb += $y * $y;"
  protected def finish(ev: ExprCode, n: String): String =
    s"""final double _den = java.lang.Math.sqrt(_na) * java.lang.Math.sqrt(_nb);
       |if (_den == 0.0) { ${ev.isNull} = true; }
       |else { ${ev.value} = (_dot / _den + 1.0) / 2.0; }""".stripMargin
  protected def accumulate(accs: Array[Double], x: Double, y: Double): Unit = {
    accs(0) += x * y; accs(1) += x * x; accs(2) += y * y
  }
  protected def computeResult(accs: Array[Double], n: Int): Option[Double] = {
    val den = math.sqrt(accs(1)) * math.sqrt(accs(2))
    if (den == 0.0) None else Some((accs(0) / den + 1.0) / 2.0)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance (raw). */
case class L2Sq(left: Expression, right: Expression) extends SimilarityKernel {
  override def prettyName: String = "l2sq"
  protected val accumulators = Seq("_ss")
  protected def perElement(x: String, y: String): String =
    s"final double _d = $x - $y; _ss += _d * _d;"
  protected def finish(ev: ExprCode, n: String): String = s"${ev.value} = _ss;"
  protected def accumulate(accs: Array[Double], x: Double, y: Double): Unit = {
    val d = x - y; accs(0) += d * d
  }
  protected def computeResult(accs: Array[Double], n: Int): Option[Double] = Some(accs(0))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Reference Euclidian (sic): 1/(1 + sqrt(Σ(aᵢ-bᵢ)²)). */
case class EuclidianSim01(left: Expression, right: Expression) extends SimilarityKernel {
  override def prettyName: String = "euclidian01"
  protected val accumulators = Seq("_ss")
  protected def perElement(x: String, y: String): String =
    s"final double _d = $x - $y; _ss += _d * _d;"
  protected def finish(ev: ExprCode, n: String): String =
    s"${ev.value} = 1.0 / (1.0 + java.lang.Math.sqrt(_ss));"
  protected def accumulate(accs: Array[Double], x: Double, y: Double): Unit = {
    val d = x - y; accs(0) += d * d
  }
  protected def computeResult(accs: Array[Double], n: Int): Option[Double] =
    Some(1.0 / (1.0 + math.sqrt(accs(0))))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Reference Manhattan: 1/(1 + Σ|aᵢ-bᵢ|). */
case class ManhattanSim01(left: Expression, right: Expression) extends SimilarityKernel {
  override def prettyName: String = "manhattan01"
  protected val accumulators = Seq("_sa")
  protected def perElement(x: String, y: String): String =
    s"_sa += java.lang.Math.abs($x - $y);"
  protected def finish(ev: ExprCode, n: String): String =
    s"${ev.value} = 1.0 / (1.0 + _sa);"
  protected def accumulate(accs: Array[Double], x: Double, y: Double): Unit =
    accs(0) += math.abs(x - y)
  protected def computeResult(accs: Array[Double], n: Int): Option[Double] =
    Some(1.0 / (1.0 + accs(0)))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Reference Pearson: textbook correlation, range [-1,1] (NOT remapped);
  * zero denominator → 0; empty input → null (0/0 under Spark division).
  */
case class PearsonSim(left: Expression, right: Expression) extends SimilarityKernel {
  override def prettyName: String = "pearson"
  protected val accumulators = Seq("_s1", "_s2", "_q1", "_q2", "_p")
  protected def perElement(x: String, y: String): String =
    s"_s1 += $x; _s2 += $y; _q1 += $x * $x; _q2 += $y * $y; _p += $x * $y;"
  protected def finish(ev: ExprCode, n: String): String =
    s"""if ($n == 0) { ${ev.isNull} = true; }
       |else {
       |  final double _nd = (double) $n;
       |  final double _den = java.lang.Math.sqrt((_q1 - _s1 * _s1 / _nd) * (_q2 - _s2 * _s2 / _nd));
       |  ${ev.value} = (_den == 0.0) ? 0.0 : (_p - _s1 * _s2 / _nd) / _den;
       |}""".stripMargin
  protected def accumulate(accs: Array[Double], x: Double, y: Double): Unit = {
    accs(0) += x; accs(1) += y; accs(2) += x * x; accs(3) += y * y; accs(4) += x * y
  }
  protected def computeResult(accs: Array[Double], n: Int): Option[Double] = {
    if (n == 0) None
    else {
      val nd = n.toDouble
      val den = math.sqrt((accs(2) - accs(0) * accs(0) / nd) * (accs(3) - accs(1) * accs(1) / nd))
      Some(if (den == 0.0) 0.0 else (accs(4) - accs(0) * accs(1) / nd) / den)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
