package graft

import org.apache.spark.sql.functions._

import graft.ops.Urls

/** URL canonicalization / dedup / domain-filter pins: the canonical key
  * must collapse exactly the equivalence classes the crawl-dedup stage
  * relies on, and must NOT collapse distinct pages.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalize collapses case, www, default ports, tracking, slash, fragment") {
    val variants = Seq(
      "https://www.Example.COM:443/a/b/?utm_source=x&utm_medium=y#frag",
      "HTTPS://EXAMPLE.com/a/b",
      "https://example.com/a/b/",
      "https://www.example.com/a/b#sec2")
    assert(canon(variants: _*).toSet == Set("https://example.com/a/b"))
  }

  test("canonicalize keeps load-bearing differences") {
    val distinct = Seq(
      "https://example.com/a?page=2",        // non-tracking param kept
      "https://example.com/a",
      "http://example.com/a",                // scheme is part of the key
      "https://example.com:8080/a",          // non-default port kept
      "https://sub.example.com/a")           // host is part of the key
    assert(canon(distinct: _*).distinct.size == distinct.size)
    // tracking params drop even when mixed with kept ones, either order
    assert(canon("https://example.com/a?utm_source=x&page=2") ==
      Seq("https://example.com/a?page=2"))
    assert(canon("https://example.com/a?page=2&utm_source=x") ==
      Seq("https://example.com/a?page=2"))
  }

  test("dedupByUrl keeps the lowest id per canonical key") {
    val docs = Seq(
      (1L, "https://example.com/x"),
      (2L, "https://WWW.example.com/x/"),
      (3L, "https://example.com/y")).toDF("doc_id", "url")
    val out = Urls.dedupByUrl(docs, "url", "doc_id")
      .select("doc_id", "is_url_keeper").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("domainFilter applies allow AND NOT deny over the canonical host") {
    val docs = Seq(
      (1L, "https://www.good.com/a"),
      (2L, "https://bad.com/a"),
      (3L, "https://other.org/a")).toDF("doc_id", "url")
    val out = Urls.domainFilter(docs, "url",
        allow = "\\.com$", deny = "^bad\\.")
      .select("doc_id", "allowed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }
}
