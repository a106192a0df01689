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

  /** Valid documents only: PERMISSIVE parse against the explicit schema
    * (no inference pass over the corpus), corrupt lines dropped. The
    * required schema here includes the data columns, so Spark's
    * corrupt-record-column restriction never applies.
    */
  def read(spark: SparkSession, path: String,
      schema: StructType = DocumentSchema): DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .filter(col(CorruptCol).isNull)
      .drop(CorruptCol)

  /** The dead-letter side: raw text of every malformed line. Read as
    * TEXT and probed with `try_parse_json` (null iff the line is not
    * valid JSON — the same criterion the reader's corrupt column uses)
    * rather than via the corrupt-record column: Spark 4 REFUSES a query
    * whose required schema is only the corrupt column (the naive
    * `filter(corrupt.isNotNull)` shape throws
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN unless the parsed frame happens to
    * be cached). One extra text scan of the shards; the dead-letter path
    * is exceptional and offline.
    */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .filter(try_parse_json(col("value")).isNull)
      .select(col("value").as("raw_line"))
}
