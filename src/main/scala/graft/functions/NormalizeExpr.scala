package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the canonicalization pass a multilingual
  * corpus pipeline runs before tokenization/hashing: the same visible
  * string can arrive precomposed (NFC, "é" = U+00E9) or decomposed
  * (NFD, "e" + U+0301) depending on the source, and every downstream
  * content hash, dedup shingle, and equality join treats the two as
  * DIFFERENT documents unless normalized first. Spark has no built-in
  * for this (DuckDB ships `nfc_normalize`/`strip_accents` — the oracle
  * side), so it is a custom codegen'd Expression per SURVEY §7.3's
  * preference order.
  *
  * Modes: `nfc` (canonical compose), `nfkc` (compatibility compose —
  * also folds ligatures/width variants), `strip` (NFD + drop combining
  * marks: accent removal, the `strip_accents` shape).
  *
  * Perf contract: the common case at corpus scale is ASCII/already-NFC
  * text; `Normalizer.isNormalized` is a cheap scan that skips the
  * allocating normalize call entirely for such rows (`strip` fast-paths
  * pure-ASCII the same way). The expression stays inside whole-stage
  * codegen via a static kernel call, so it rides the scan like the
  * other text kernels.
  */
case class UnicodeNormalize(child: Expression, mode: String) extends UnaryExpression {

  override def prettyName: String = s"unicode_normalize_$mode"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if NormalizeKernel.modes.contains(mode) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unknown normalization mode '$mode' (expected one of ${NormalizeKernel.modes.mkString(", ")})")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeKernel.normalize(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.NormalizeKernel.normalize($s, "$mode");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernel behind [[UnicodeNormalize]] (codegen calls it by name). */
object NormalizeKernel {
  val modes: Set[String] = Set("nfc", "nfkc", "strip")

  private val marks = "\\p{M}+".r

  def normalize(s: UTF8String, mode: String): UTF8String = {
    val str = s.toString
    mode match {
      case "nfc" =>
        if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
        else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
      case "nfkc" =>
        if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
        else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFKC))
      case "strip" =>
        // ASCII can carry no combining marks; skip the NFD round-trip
        if (isAscii(s)) s
        else UTF8String.fromString(
          marks.replaceAllIn(Normalizer.normalize(str, Normalizer.Form.NFD), ""))
    }
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}
