package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Domain, StubEmbedder}
import graft.functions.TextFunctions
import graft.ops.Upsert
import graft.search.SearchEngine

/** Batch equivalents of the reference's REST surface (SURVEY.md §2.12;
  * controllers at `src/Server/Controllers/`) — the library face a user of
  * the reference would call. Every method is a pure DataFrame transform
  * over [[graft.core.Domain]] tables; nothing collects to the driver.
  *
  * | reference endpoint                           | here                 |
  * |----------------------------------------------|----------------------|
  * | `POST /Searchdomain/Query`                   | [[query]]            |
  * | `GET /Entities` (3 verbosity levels)         | [[listEntities]]     |
  * | `PUT /Entities` (upsert, diff-driven embed)  | [[upsertEntities]]   |
  * | `PUT /Entities?sessionComplete=true` finalize| [[sessionFinalize]]  |
  * | `DELETE /Entity`                             | [[deleteEntity]]     |
  * | `PATCH /Searchdomain/Query` (result override)| [[patchQueryCache]]  |
  * | `GET /Server/Stats`, `Database/Size`         | [[stats]]            |
  */
object EngineApi {

  /** Release ALL pipeline-scratch caches accumulated by query/dedup/
    * curation dataflows since the last release (VERDICT r7 #6) — the
    * serving-session cache-hygiene hook. Scoped to pipeline scratch:
    * domain-level caches (`Domain.cache()`) and user caching are
    * untouched, unlike `spark.catalog.clearCache()`. Call after each
    * query cycle's results are materialized; ApiSpec pins that a cycle
    * leaves no orphan blocks behind it.
    *
    * CONCURRENCY CONTRACT (ADVICE r8): this is the global drain — it
    * frees EVERY in-flight pipeline's scratch, including results backed
    * by connectedComponents checkpoint blocks, whose later actions would
    * then fail with missing-checkpoint-block errors (not just recompute).
    * Do NOT call it while any other query cycle is in flight. Concurrent
    * sessions should wrap each cycle in [[scopedCycle]] and release that
    * cycle's handle instead.
    */
  def releaseCaches(): Unit = graft.ops.Caches.release()

  /** Run one query cycle with its pipeline scratch captured into a
    * private scope; returns (result, handle). `handle.release()` frees
    * exactly this cycle's persists and checkpoint blocks — safe while
    * other cycles are in flight (ApiSpec pins the isolation).
    */
  def scopedCycle[T](body: => T): (T, graft.ops.Caches.Scope) =
    graft.ops.Caches.scoped(body)

  /** `POST /Searchdomain/Query?searchdomain&query&topN&returnAttributes`
    * (`SearchdomainController.cs:158-171`): embed the query under every
    * model in use, run the two-level scored search, optionally attach the
    * entity attribute map (P3, applied AFTER the top-k cut so the join
    * touches topN rows, not the corpus).
    *
    * Like the endpoint, a query is normally per searchdomain: scope a
    * shared table set first with `Tables.readDomain(spark, dir, name)`
    * (partition-pruned). Every scoring join/grouping is keyed by
    * (searchdomain, id), so on a multi-domain Domain the domains score
    * independently (no cross-domain fan-out) and the top-N is taken
    * across them.
    */
  def query(
      spark: SparkSession,
      domain: Domain,
      queryText: String,
      topN: Int,
      dim: Int,
      returnAttributes: Boolean = false): DataFrame = {
    val qEmb = SearchEngine.queryEmbeddings(spark, domain, queryText, dim)
    if (!returnAttributes) SearchEngine.search(domain, qEmb, topN)
    else
      // joined on (searchdomain, name), not name alone: domains may reuse
      // entity names, and a name-only join would fan the top-N out
      // against every same-named entity of every domain
      SearchEngine.searchWithDomain(domain, qEmb, topN)
        .join(domain.entities.select(
          col("searchdomain"), col("name"), col("attributes")),
          Seq("searchdomain", "name"), "left_outer")
        .select(col("name"), col("score"), col("attributes"))
        .orderBy(desc("score"), asc("name"))
  }

  /** The endpoint's full cache flow (`Searchdomain.cs:183-208` + C1):
    * probe the query cache by the query STRING alone (not topN — the
    * reference quirk), return the stored already-truncated list on a hit;
    * on a miss run the search and store the fresh list truncated to topN.
    * Returns (result, updated cache). The hit probe is one filter on the
    * cache table — partition/predicate-pruned at scale; the branch itself
    * is request-level control flow, exactly as in the reference.
    */
  def queryCached(
      spark: SparkSession,
      domain: Domain,
      cache: DataFrame,
      queryText: String,
      topN: Int,
      dim: Int): (DataFrame, DataFrame) = {
    val stored = cache.filter(col("query") === queryText)
    if (!stored.isEmpty) {
      (stored.orderBy("rank").select(col("name"), col("score")), cache)
    } else {
      // materialize the ranked top-N locally — it IS the response payload
      // (bounded by topN, exactly what the endpoint returns over HTTP) —
      // so the corpus-sized search runs ONCE, later probes of the
      // returned cache read local rows instead of replaying the search
      // lineage, and nothing is left persisted in executor storage. The
      // caller owns the cache's durability (write it between requests,
      // as the reference's in-memory QueryCache lives across them).
      val ranked = query(spark, domain, queryText, topN, dim)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("score"), asc("name"))).cast("long"))
        .withColumn("query", lit(queryText))
      val rows = ranked.collect()
      val local = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), ranked.schema)
      (local.orderBy("rank").select(col("name"), col("score")),
        cache.unionByName(local.select(cache.columns.map(col).toIndexedSeq: _*)))
    }
  }

  /** `GET /Entities?searchdomain&returnModels&returnEmbeddings`
    * (`EntityController.cs:42-86`): the three verbosity levels — names
    * only / models with empty vectors / full vectors. The heavy embedding
    * column is never scanned unless asked for (column pruning reaches the
    * parquet reader).
    */
  def listEntities(
      domain: Domain,
      returnModels: Boolean = false,
      returnEmbeddings: Boolean = false): DataFrame = {
    // joined/grouped by (searchdomain, entity_id) so multi-domain Domains
    // with reused ids don't cross-attach models; output schema unchanged
    val base = domain.entities.select(
      col("searchdomain"), col("entity_id"), col("name"), col("attributes"))
    if (!returnModels) base.drop("searchdomain")
    else {
      val embs =
        if (returnEmbeddings)
          domain.embeddings.select(
            col("searchdomain"), col("entity_id"), col("model"), col("embedding"))
        else
          domain.embeddings.select(col("searchdomain"), col("entity_id"), col("model"),
            array().cast("array<float>").as("embedding"))
      base.join(
        embs.groupBy("searchdomain", "entity_id")
          .agg(collect_list(struct(col("model"), col("embedding"))).as("models")),
        Seq("searchdomain", "entity_id"), "left_outer")
        .drop("searchdomain")
    }
  }

  /** `PUT /Entities` (`EntityController.cs:105-161` →
    * `SearchdomainHelper.cs:208-343`): diff-driven incremental index. The
    * content-hash diff classifies incoming datapoints; ONLY created or
    * text-changed datapoints are embedded (dedup-before-embed P7 applies
    * inside the batched inference source), everything unchanged keeps its
    * stored vectors. Returns the merged Domain.
    *
    * `incoming` carries (entity_id, datapoint_id, name, probmethod,
    * similaritymethod, text); `entities` the matching entity rows.
    */
  def upsertEntities(
      spark: SparkSession,
      domain: Domain,
      entities: DataFrame,
      incoming: DataFrame,
      models: Seq[String],
      dim: Int,
      settings: graft.core.DomainSettings = graft.core.DomainSettings()): Domain = {
    // Every merge key includes `searchdomain`: a Domain may legitimately
    // hold several domains side by side (the catalog operators below work
    // on that shape), and two domains reusing entity_id/datapoint_id
    // values must never cross-contaminate.
    val dpKey = Seq("searchdomain", "datapoint_id")
    val entKey = Seq("searchdomain", "entity_id")
    val hashed = incoming.withColumn("hash", TextFunctions.contentHash(col("text")))
    val d = Upsert.diff(
      domain.datapoints.select((dpKey :+ "hash").map(col): _*),
      hashed.select((dpKey :+ "hash").map(col): _*),
      dpKey, "hash")

    val needEmbed = hashed.join(
      d.filter(col("bucket").isin("created", "changed")).select(dpKey.map(col): _*),
      dpKey, "left_semi")
    val keepIds = d.filter(col("bucket") === "unchanged").select(dpKey.map(col): _*)

    // P7/U2 + S4: embed each distinct changed text once per model, batched.
    // ParallelEmbeddingsPrefetch routes the batch placement
    // (`SearchdomainHelper.cs:61-93`): per-model-sequential when off,
    // every model's batches concurrent when on.
    val pairs = needEmbed.select(col("text")).distinct()
      .crossJoin(spark.createDataFrame(models.map(Tuple1(_))).toDF("model"))
    val fresh = needEmbed
      .join(StubEmbedder.embedBatched(spark, pairs, dim,
        parallelPrefetch = settings.parallelEmbeddingsPrefetch), "text")
      .select(col("searchdomain"), col("entity_id"), col("datapoint_id"),
        col("model"), col("embedding"))

    // The diff has PUT semantics per UPLOADED entity only (reference
    // `SearchdomainHelper.cs:208-343` diffs the datapoints of each entity
    // in the payload): entities absent from the batch keep everything;
    // within an uploaded entity, datapoints missing from the payload are
    // the `deleted` bucket and drop out. ALL incoming datapoint rows of
    // touched entities land as-is — hash-unchanged ones thereby take the
    // INCOMING metadata (probmethod/similaritymethod/name, the reference's
    // `updatedDatapointsNonText` path) while keeping stored embeddings.
    val touched = entities.select(entKey.map(col): _*).distinct()
    val mergedDatapoints = domain.datapoints
      .join(touched, entKey, "left_anti")
      .unionByName(hashed.select(domain.datapoints.columns.map(col).toIndexedSeq: _*))
    val mergedEmbeddings = domain.embeddings
      .join(touched, entKey, "left_anti")
      .unionByName(domain.embeddings.join(keepIds, dpKey, "left_semi"))
      .unionByName(fresh.select(domain.embeddings.columns.map(col).toIndexedSeq: _*))
    val mergedEntities = domain.entities
      .join(touched, entKey, "left_anti")
      .unionByName(entities.select(domain.entities.columns.map(col).toIndexedSeq: _*))
    Domain(mergedEntities, mergedDatapoints, mergedEmbeddings)
  }

  /** Session finalize (`PUT /Entities?sessionComplete=true` — the call is
    * per searchdomain, `EntityController.cs:163-199`): delete every entity
    * of THAT domain not in the accumulated session set; sibling domains
    * are untouched.
    */
  def sessionFinalize(domain: Domain, accumulatedNames: DataFrame,
      searchdomain: String): Domain = {
    val doomed = Upsert.sessionFinalize(
      domain.entities.filter(col("searchdomain") === searchdomain)
        .select(col("searchdomain"), col("entity_id"), col("name")),
      accumulatedNames, Seq("name"))
      .select("searchdomain", "entity_id")
    dropEntities(domain, doomed)
  }

  /** `DELETE /Entity?searchdomain&entityName` (`EntityController.cs:206-229`):
    * FK-cascade rewrite of all three tables (J9/S7), scoped to the named
    * domain exactly as the endpoint is.
    */
  def deleteEntity(domain: Domain, searchdomain: String, entityName: String): Domain =
    dropEntities(domain,
      domain.entities.filter(
        col("searchdomain") === searchdomain && col("name") === entityName)
        .select("searchdomain", "entity_id"))

  private def dropEntities(domain: Domain, victims: DataFrame): Domain = {
    val cascaded = Upsert.deleteCascadeKeys(
      Seq(
        ("entities", domain.entities),
        ("datapoints", domain.datapoints),
        ("embeddings", domain.embeddings)),
      victims, Seq("searchdomain", "entity_id")).toMap
    Domain(cascaded("entities"), cascaded("datapoints"), cascaded("embeddings"))
  }

  /** `PATCH /Searchdomain/Query` (`SearchdomainController.cs:141-214`):
    * manual override of one cached result list — the stored rows for that
    * query are replaced wholesale by the supplied (rank, name, score) rows.
    */
  def patchQueryCache(cache: DataFrame, queryText: String, replacement: DataFrame): DataFrame =
    cache.filter(col("query") =!= queryText)
      .unionByName(replacement.withColumn("query", lit(queryText))
        .select(cache.columns.map(col).toIndexedSeq: _*))

  /** `GET /Searchdomains` (`SearchdomainController.cs:31-46`): the domain
    * catalog — distinct names with entity counts (partition-pruned read
    * of one column under the partitioned layout).
    */
  def listDomains(entities: DataFrame): DataFrame =
    entities.groupBy("searchdomain")
      .agg(count(lit(1)).as("n_entities"))
      .orderBy("searchdomain")

  /** `POST /Searchdomain` (`SearchdomainController.cs:53-69`): a fresh
    * domain is three empty, correctly-typed tables plus normalized
    * settings (QueryCacheSize <= 0 -> the reference's 1M default).
    */
  def createDomain(spark: SparkSession,
      settings: graft.core.DomainSettings = graft.core.DomainSettings())
      : (Domain, graft.core.DomainSettings) =
    (graft.core.DomainSchemas.emptyDomain(spark), settings.normalized)

  /** `DELETE /Searchdomain` (`SearchdomainController.cs:75-104`): drop a
    * whole domain from all three tables — pure partition pruning under
    * the partitioned layout (nothing else is rewritten).
    */
  def dropDomain(domain: Domain, name: String): Domain = Domain(
    domain.entities.filter(col("searchdomain") =!= name),
    domain.datapoints.filter(col("searchdomain") =!= name),
    domain.embeddings.filter(col("searchdomain") =!= name))

  /** `PUT /Searchdomain` rename (`SearchdomainController.cs:111-140`). */
  def renameDomain(domain: Domain, from: String, to: String): Domain = {
    def r(df: DataFrame) = df.withColumn("searchdomain",
      when(col("searchdomain") === from, to).otherwise(col("searchdomain")))
    Domain(r(domain.entities), r(domain.datapoints), r(domain.embeddings))
  }

  /** `DELETE /Searchdomain/Query` (`SearchdomainController.cs:178-197`):
    * drop ONE query's cached result rows.
    */
  def deleteQueryCacheEntry(cache: DataFrame, queryText: String): DataFrame =
    cache.filter(col("query") =!= queryText)

  /** `GET /Searchdomain/QueryCache/Size` (`SearchdomainController.cs:254-270`):
    * cached-query count, byte estimate of the stored rows, configured max.
    */
  def queryCacheSize(cache: DataFrame, settings: graft.core.DomainSettings): DataFrame =
    cache.agg(
      countDistinct(col("query")).as("element_count"),
      coalesce(sum((length(col("name")) + length(col("query")) + lit(16)).cast("long")),
        lit(0L)).as("size_bytes"))
      .withColumn("element_max_count", lit(settings.normalized.queryCacheSize.toLong))

  /** `GET /Searchdomain/Queries` (`SearchdomainController.cs:141-157`):
    * introspection listing of the query cache — one row per cached query
    * with its stored-result count, best score and best name. The counts
    * are a primitive-buffer HashAggregate; the best NAME comes from a
    * join with the rank-1 rows rather than `min_by(name, rank)` — any
    * string-valued aggregate needs a string buffer, which demotes the
    * whole aggregate to SortAggregate over the full cache table.
    */
  def listQueryCache(cache: DataFrame): DataFrame = {
    // best name = the MIN-rank row per query (PATCH stores caller rows
    // verbatim, so rank 1 may be absent or duplicated); ties broken by
    // name via a window over the LISTING-sized candidate set (≈ one row
    // per query), never the cache table
    // bcast-ok: one row per cached query — the query cache is LRU-capped
    // (C1), never corpus-grained
    val minRank = cache.groupBy(col("query")).agg(min(col("rank")).as("__top_rank"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query")).orderBy(col("name"))
    val top = cache.join(broadcast(minRank), Seq("query"))
      .filter(col("rank") === col("__top_rank"))
      .withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") === 1)
      .select(col("query"), col("name").as("top_name"))
    cache.groupBy(col("query"))
      .agg(
        count(lit(1)).as("n_results"),
        max(col("score")).as("top_score"))
      .join(top, Seq("query"), "left_outer")
  }

  /** `GET /Server/Models` with the allow/deny filter (P5,
    * `ServerController.cs:36-57`, `AIProvider.cs:196-216`): distinct
    * models in use (U1), regex allowlist ∧ ¬denylist.
    */
  def models(domain: Domain, allow: String = ".*", deny: String = "^$"): DataFrame =
    domain.embeddings.select(col("model")).distinct()
      .filter(regexp_like(col("model"), lit(allow)) &&
        !regexp_like(col("model"), lit(deny)))

  /** `GET /Server/Stats` + `Database/Size` (`ServerController.cs:36-119`,
    * `DatabaseHelper.cs:291-397`): row counts and byte-size estimates per
    * table (C5) — one aggregate per table, unioned.
    */
  def stats(domain: Domain): DataFrame = {
    def one(name: String, df: DataFrame, sizeExpr: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("rows"), coalesce(sum(sizeExpr), lit(0L)).as("approx_bytes"))
        .withColumn("table_name", lit(name))
    one("entities", domain.entities,
      (length(col("name")) + aggregate(map_values(col("attributes")),
        lit(0), (a, v) => a + length(v))).cast("long"))
      .unionByName(one("datapoints", domain.datapoints,
        (length(col("name")) + length(col("hash"))).cast("long")))
      .unionByName(one("embeddings", domain.embeddings,
        (size(col("embedding")) * 4 + length(col("model"))).cast("long")))
      .select("table_name", "rows", "approx_bytes")
  }
}
