package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Per-document token statistics (token count, mean token length,
  * position-sensitive fingerprint, 32-bit SimHash) computed in ONE
  * posexplode pass + one codegen HashAggregate.
  *
  * The per-row HOF forms in [[graft.functions.TextFunctions]] (`simhash`,
  * `fingerprint`) are interpreted expressions — O(tokens × 32) with an
  * array allocation per token. Exploding to (doc, token-hash) rows and
  * summing 32 signed bit-counters keeps the whole pipeline inside
  * whole-stage codegen; sums commute, so the values are identical.
  * Zero-token documents survive via the left join (n_tokens 0, mean 0.0,
  * fingerprint 0, simhash 0 — same as the HOF forms).
  */
object TextStats {

  def perDoc(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = Par.ensure(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), "doc_id")

    val tokRows = base
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos"),
        length(col("col")).cast("long").as("tlen"),
        hash32(col("col")).as("h"))

    val counterAggs = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"c$b")
    }
    val statAggs = Seq(
      count(lit(1)).as("n_toks"),
      sum(col("tlen")).as("sum_tlen"),
      // 1-based position weight, matching TextFunctions.fingerprint.
      // Mod-per-term BEFORE the sum: a raw long sum of h×position wraps
      // around ~65k tokens (diverging from the oracle's 128-bit
      // list_sum), while Σ(tᵢ mod M) mod M ≡ Σtᵢ mod M stays exact in
      // long for ~2^32 tokens — no decimal slowdown.
      sum(pmod(col("h") * (col("pos") + 1L), lit(2147483647L))).as("fp_raw"))
    val allAggs = statAggs ++ counterAggs

    val simhashCol = (0 until 32).map { b =>
      when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

    val agg = tokRows
      .groupBy("doc_id")
      .agg(allAggs.head, allAggs.tail: _*)
      .select(col("doc_id"), col("n_toks"), col("sum_tlen"), col("fp_raw"),
        simhashCol.as("sh"))

    base.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_tokens"),
        round(when(col("n_toks").isNull, 0.0)
          .otherwise(col("sum_tlen").cast("double") / col("n_toks").cast("double")), 6)
          .as("mean_tok_len"),
        coalesce(pmod(col("fp_raw"), lit(2147483647L)), lit(0L)).as("fingerprint"),
        coalesce(col("sh"), lit(0L)).as("simhash"))
  }
}
