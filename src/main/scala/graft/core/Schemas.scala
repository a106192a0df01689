package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine storage model (SURVEY.md §1.3): the reference's 5 MySQL tables
  * re-expressed as Parquet-backed DataFrames partitioned by `searchdomain`
  * (replacing the `id_searchdomain` covering indexes with partition pruning —
  * `src/Server/Migrations/DatabaseMigrations.cs:83-155`).
  *
  * entities:    searchdomain, entity_id, name, probmethod, attributes map<string,string>
  * datapoints:  searchdomain, entity_id, datapoint_id, name, probmethod,
  *              similaritymethod, hash (base64 SHA-256 of text, 44 chars)
  * embeddings:  searchdomain, entity_id, datapoint_id, model, embedding array<float>
  * query_cache: searchdomain, query, results array<struct<score,name>>,
  *              access_times array<timestamp>, last_access
  * embedding_cache: cache_key, model_key, embedding, idx (LRU position)
  */
final case class Domain(
    entities: DataFrame,
    datapoints: DataFrame,
    embeddings: DataFrame) {

  def persisted(): Domain =
    Domain(entities.cache(), datapoints.cache(), embeddings.cache())
}

object Tables {
  /** Load one driver-generated testdata table. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def writeDomain(domain: Domain, baseDir: String): Unit = {
    domain.entities.write.mode("overwrite")
      .partitionBy("searchdomain").parquet(s"$baseDir/entities")
    domain.datapoints.write.mode("overwrite")
      .partitionBy("searchdomain").parquet(s"$baseDir/datapoints")
    domain.embeddings.write.mode("overwrite")
      .partitionBy("searchdomain").parquet(s"$baseDir/embeddings")
  }

  def readDomain(spark: SparkSession, baseDir: String): Domain = Domain(
    spark.read.parquet(s"$baseDir/entities"),
    spark.read.parquet(s"$baseDir/datapoints"),
    spark.read.parquet(s"$baseDir/embeddings"))
}
