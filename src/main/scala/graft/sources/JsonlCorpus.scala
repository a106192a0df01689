package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL corpus source — the de-facto interchange format of LLM training
  * corpora (one JSON document per line). The reference ingests via
  * scripts (`src/Indexer/Scripts/example.py:52-66` walks a directory);
  * at 100 TB the corpus arrives as JSONL shards instead, and the
  * load must be schema-enforced and QUARANTINE-not-crash on malformed
  * lines: a single bad record must neither kill a billion-line job nor
  * silently vanish.
  *
  * Spark mapping: a text scan + `from_json` in PERMISSIVE mode with an
  * explicit schema (no inference pass over 100 TB) and a corrupt-record
  * column; [[read]] returns the valid rows, [[quarantine]] the raw
  * malformed lines for the dead-letter sink. Both sides are the SAME
  * parsed frame filtered on the SAME criterion (`_corrupt_record`), so
  * every non-blank line lands in exactly one of them — a line that is
  * valid JSON but fails the schema (`{"doc_id": "abc"}`) is quarantined,
  * not dropped. Deliberately NOT the native json datasource: that
  * reader refuses any query whose pruned schema is only the corrupt
  * column (`read(..).count()` threw QUERY_ONLY_CORRUPT_RECORD_COLUMN),
  * and its quarantine criterion can't be reproduced externally —
  * `try_parse_json` misses schema-coercion failures. `from_json` marks
  * corrupt records identically (verified against the datasource) and
  * carries no such restriction.
  */
object JsonlCorpus {

  /** The documents-table contract (TESTDATA.md): doc_id, text, lang,
    * source — the schema [[read]] enforces by default.
    */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  private val CorruptCol = "_corrupt_record"

  /** One non-blank line per row, parsed once: `value` (the raw line) and
    * `doc` (the struct; its [[CorruptCol]] field is non-null iff the line
    * failed to parse OR to coerce to the schema). Both public views
    * filter this frame, so their union is exactly the non-blank input —
    * blank lines are skipped like the json datasource skips them.
    */
  private def parsed(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        col("value"),
        from_json(
          col("value"),
          schema.add(StructField(CorruptCol, StringType)),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("doc"))

  /** Valid documents only: lines that parse AND coerce to the schema. */
  def read(spark: SparkSession, path: String,
      schema: StructType = DocumentSchema): DataFrame = {
    val fields = schema.fieldNames.map(f => col("doc")(f).as(f))
    parsed(spark, path, schema)
      .filter(col("doc")(CorruptCol).isNull)
      .select(fields.toIndexedSeq: _*)
  }

  /** The dead-letter side: raw text of every line [[read]] rejects —
    * the exact complement (same parse, negated filter), so nothing can
    * vanish between the two views. Catches malformed JSON, non-object
    * lines, and schema-coercion failures alike.
    */
  def quarantine(spark: SparkSession, path: String,
      schema: StructType = DocumentSchema): DataFrame =
    parsed(spark, path, schema)
      .filter(col("doc")(CorruptCol).isNotNull)
      .select(col("value").as("raw_line"))
}
