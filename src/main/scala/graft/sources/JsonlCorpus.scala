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
  * Spark mapping: the native json reader in PERMISSIVE mode with an
  * explicit schema (no inference pass over 100 TB) and a corrupt-record
  * column; [[read]] returns the valid rows, [[quarantine]] the raw
  * malformed lines for the dead-letter sink. Both come from ONE cached
  * scan when the caller persists the parsed frame.
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

  /** Parse a JSONL directory/file against `schema`, keeping malformed
    * lines in the corrupt column instead of failing (PERMISSIVE).
    */
  def parse(spark: SparkSession, path: String,
      schema: StructType = DocumentSchema): DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Valid documents only (schema columns, corrupt lines dropped). */
  def read(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The dead-letter side: raw text of every malformed line. (Spark
    * quirk: a corrupt-record-only projection is disallowed, so the
    * filter runs before the projection.)
    */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
}
