package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join handles most cases
  * at runtime; explicit salting remains the tool for EXTREME single-key
  * skew (one entity with millions of embeddings would pin one reducer
  * regardless of AQE's split heuristics, because AQE can only split a
  * partition, not a key).
  *
  * `saltedJoin(left, right, keys, n)`: the large/skewed side gets a
  * deterministic salt in [0, n) hashed from its whole row; the smaller
  * side is replicated n times (one copy per salt). The join key becomes
  * (keys..., salt), so a hot key's rows spread across n reducers. Output
  * equals the plain equi-join exactly; cost is n× the small side's
  * shuffle volume — choose n ≈ (hot-key rows / target partition rows).
  */
object Skew {

  private val SafeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  private def isHashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => isHashable(f.dataType))
      case a: ArrayType => isHashable(a.elementType)
      case _ => true
    }
  }

  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit an unmatched small-side row once PER
    // SALT COPY (salts-fold duplication) — only left-preserving types are
    // result-identical to the plain equi-join
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports left-preserving join types only, got $joinType")
    // Salt only from hashable columns (hash() on MapType fails analysis —
    // e.g. the entities table's attributes map); the join keys are always
    // hashable in an equi-join, so the salt source is never empty.
    val hashableCols = skewed.schema.fields
      .filter(f => isHashable(f.dataType)).map(f => col(f.name)).toSeq
    val saltSource = if (hashableCols.nonEmpty) hashableCols else keys.map(col)
    val saltedLeft = skewed.withColumn("__salt",
      pmod(xxhash64(saltSource: _*), lit(salts.toLong)).cast("int"))
    val replicatedRight = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType).drop("__salt")
  }
}
