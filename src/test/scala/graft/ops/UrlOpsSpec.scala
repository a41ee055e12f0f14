package graft.ops

import org.apache.spark.sql.{functions => F}

import graft.spark.SparkTestBase

/** URL canonicalization over hand-computed cases. */
class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlOps.canonicalizeUrl(F.col("url")))
      .collect().map(_.getString(0)).toSeq

  test("equivalent fetches collapse to one canonical form") {
    val out = canon(
      "https://www.example.com/path/7?a=1&b=2",
      "HTTPS://EXAMPLE.COM:443/path/7?b=2&a=1",
      "https://example.com/path/7/?a=1&b=2&utm_source=feed",
      "https://www.example.com/path/7?b=2&a=1#section")
    assert(out.distinct === Seq("https://example.com/path/7?a=1&b=2"))
  }

  test("default ports are dropped, explicit ports are kept") {
    assert(canon("http://host.com:80/x") === Seq("http://host.com/x"))
    assert(canon("https://host.com:443/x") === Seq("https://host.com/x"))
    assert(canon("http://host.com:8080/x") === Seq("http://host.com:8080/x"))
    // 443 is NOT http's default
    assert(canon("http://host.com:443/x") === Seq("http://host.com:443/x"))
  }

  test("path and query edge cases") {
    // empty path becomes /, root slash is preserved
    assert(canon("https://a.com") === Seq("https://a.com/"))
    assert(canon("https://a.com/") === Seq("https://a.com/"))
    // trailing slash dropped from non-root paths only
    assert(canon("https://a.com/b/") === Seq("https://a.com/b"))
    // empty query and dangling ? disappear
    assert(canon("https://a.com/b?") === Seq("https://a.com/b"))
    // all-tracking query disappears entirely
    assert(canon("https://a.com/b?utm_source=x&utm_medium=y&gclid=z&fbclid=w") ===
      Seq("https://a.com/b"))
    // tracking names are matched as whole parameter names
    assert(canon("https://a.com/b?refresh=1&pref=2") ===
      Seq("https://a.com/b?pref=2&refresh=1"))
  }

  test("query without path keeps the root slash") {
    assert(canon("https://a.com?b=2&a=1") === Seq("https://a.com/?a=1&b=2"))
  }

  test("stripWww=false preserves the www host") {
    val out = Seq("https://WWW.Example.com/x").toDF("url")
      .select(UrlOps.canonicalizeUrl(F.col("url"), stripWww = false))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("https://www.example.com/x"))
  }

  test("canonicalization is a pure projection — no exchange") {
    val plan = spark.range(100).toDF("id")
      .select(UrlOps.canonicalizeUrl(
        F.concat(F.lit("https://e.com/"), F.col("id").cast("string"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
