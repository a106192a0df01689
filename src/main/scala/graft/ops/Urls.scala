package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/metadata-level curation — the pre-filter stage web-scale pipelines
  * (RefinedWeb/FineWeb/C4) run BEFORE any content is fetched or scored:
  * canonicalize each record's URL, drop URL-level duplicates, and apply
  * domain allow/deny lists. The reference's per-model regex filter
  * (`AIProvider.cs:196-216`, q12) is the same allow ∧ ¬deny shape one
  * level down; here it runs over crawl metadata.
  *
  * Everything is narrow per-row regex/string work (codegen'd built-ins,
  * no UDF) — it rides the scan; the only exchange in [[dedupByUrl]] is
  * the canonical-URL hash partition whose groups are duplicate sets
  * (tiny at any corpus size).
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://.*$"
  private val AuthRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$"
  private val RestRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"
  private val TrackParam = "(utm_[A-Za-z]+|fbclid|gclid)"

  /** Canonical form of an absolute URL, the standard crawl-dedup key:
    * scheme and host lowercased, `www.` prefix and default ports
    * (`:443`/`:80`) stripped, fragment removed, tracking query
    * parameters (`utm_*`, `fbclid`, `gclid`) removed (other parameters
    * are KEPT — they can be load-bearing), empty leftover `?` and
    * trailing slashes stripped. Two fetches of the same page via
    * tracking links, mixed-case hosts, or explicit default ports
    * canonicalize to one key. Simplifications vs a full RFC 3986
    * normalizer (documented, oracle-matched): default-port stripping is
    * scheme-blind, and percent-encoding is left untouched.
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val auth = regexp_replace(
      regexp_replace(lower(regexp_extract(url, AuthRe, 1)), "^www\\.", ""),
      ":(443|80)$", "")
    val rest0 = regexp_extract(url, RestRe, 1)
    val noFrag = regexp_replace(rest0, "#.*$", "")
    // tracking params: first every non-final `p=v&`, then a final `?p=v`/`&p=v`
    val noTrk = regexp_replace(
      regexp_replace(noFrag, TrackParam + "=[^&#]*&", ""),
      "[?&]" + TrackParam + "=[^&#]*$", "")
    val clean = regexp_replace(regexp_replace(noTrk, "\\?$", ""), "/+$", "")
    concat(scheme, lit("://"), auth, clean)
  }

  /** Host of a [[canonicalize]]d URL (port, path, query stripped). */
  def host(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z0-9+.-]+://([^/?#:]*)", 1)

  /** URL-level exact dedup: attach `canon_url` and `is_url_keeper`
    * (1 for the lowest-id row per canonical URL — the q44/q78 keeper
    * convention). One hash exchange on the canonical key; groups are
    * duplicate sets, so the window partition is bounded by duplication
    * depth, never corpus size.
    */
  def dedupByUrl(docs: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy("canon_url")
    docs.withColumn("canon_url", canonicalize(col(urlCol)))
      .withColumn("is_url_keeper",
        when(col(idCol) === min(col(idCol)).over(w), 1L).otherwise(0L))
  }

  /** Domain allow/deny filter (q12's regex pair over crawl hosts):
    * attaches `host` and `allowed` = 1 iff the host matches `allow` and
    * not `deny`. Pure per-row regex — rides the scan.
    */
  def domainFilter(docs: DataFrame, urlCol: String,
      allow: String, deny: String): DataFrame =
    docs.withColumn("host", host(canonicalize(col(urlCol))))
      .withColumn("allowed",
        when(regexp_like(col("host"), lit(allow)) &&
          !regexp_like(col("host"), lit(deny)), 1L).otherwise(0L))
}
