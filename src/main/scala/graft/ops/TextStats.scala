package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Per-document token statistics (token count, mean token length,
  * position-sensitive fingerprint, 32-bit SimHash) — ONE narrow
  * projection over the corpus via the fused byte-scan kernel
  * ([[graft.functions.TokenStats]]).
  *
  * History of this shape: the per-row HOF forms in
  * [[graft.functions.TextFunctions]] are interpreted (O(tokens × 32),
  * an array allocation per token); round 2 replaced them with posexplode
  * + a 32-bit-counter codegen HashAggregate, which kept codegen but
  * pushed tokens-per-doc × corpus rows through a shuffle. The fused
  * kernel computes the same four values per ROW — no explode, no
  * exchange, nothing but the parquet scan and a map. Values are
  * identical (kernel Scaladoc; q41's DuckDB oracle pins them
  * end-to-end).
  */
object TextStats {

  def perDoc(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.ensure(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), "doc_id")
      .select(col("doc_id"), tokenStats(col("text")).as("st"))
      .select(
        col("doc_id"),
        // null text → null struct → the same zeros the old left join gave
        coalesce(col("st.n_tokens"), lit(0L)).as("n_tokens"),
        round(when(coalesce(col("st.n_tokens"), lit(0L)) === 0L, 0.0)
          .otherwise(col("st.sum_tlen").cast("double") / col("st.n_tokens").cast("double")), 6)
          .as("mean_tok_len"),
        coalesce(col("st.fingerprint"), lit(0L)).as("fingerprint"),
        coalesce(col("st.simhash"), lit(0L)).as("simhash"))
}
