package graft.ops

import org.apache.spark.sql.{Column, functions => F}

/** URL canonicalization for provenance dedup — the Common-Crawl-style
  * normalization every web-corpus pipeline applies before grouping by
  * source: case-fold scheme/host, strip fragments and default ports,
  * drop tracking parameters, sort the query string, normalize the
  * path's trailing slash. Two fetches of the "same" page then collapse
  * to one canonical key.
  *
  * Everything is a composed chain of built-in string expressions — a
  * pure per-row projection with no shuffle, no UDF, no driver state;
  * the only non-codegen pieces are the tiny per-URL query-param array
  * ops. Expects absolute `scheme://...` URLs; components that do not
  * parse degrade to empty strings rather than erroring (regexp_extract
  * returns '' on no-match in both Spark and the oracle engine, which
  * is what keeps the two canonicalizations aligned).
  */
object UrlOps {

  /** Query parameters dropped during canonicalization (anchored regex
    * alternatives matched against `name=`). */
  val DefaultTracking: Seq[String] = Seq("utm_[^=]*", "fbclid", "gclid", "ref")

  /** Canonical form of `url`:
    *  - scheme and host lowercased, fragment removed
    *  - `www.` host prefix dropped (when `stripWww`)
    *  - default ports removed (http:80, https:443); others kept
    *  - empty path becomes `/`; a trailing slash is dropped from any
    *    non-root path
    *  - tracking parameters removed, remaining parameters sorted
    */
  def canonicalizeUrl(url: Column, stripWww: Boolean = true,
      tracking: Seq[String] = DefaultTracking): Column = {
    val noFrag = F.regexp_replace(url, "#.*$", "")
    val scheme = F.lower(F.regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = F.lower(
      F.regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val host0 = F.regexp_extract(hostport, "^([^:]*)", 1)
    val host = if (stripWww) F.regexp_replace(host0, "^www\\.", "") else host0
    val port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = F.when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), F.lit(""))
      .otherwise(F.concat(F.lit(":"), port))
    val rawPath =
      F.regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    val path = F.regexp_replace(
      F.when(rawPath === "", F.lit("/")).otherwise(rawPath), "(.)/$", "$1")
    val rawQ = F.regexp_extract(noFrag, "\\?(.*)$", 1)
    val trackRe = "^(" + tracking.mkString("|") + ")="
    val params = F.array_sort(F.filter(F.split(rawQ, "&"),
      p => p =!= "" && !p.rlike(trackRe)))
    val q = F.array_join(params, "&")
    F.concat(scheme, F.lit("://"), host, portPart, path,
      F.when(q === "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
  }
}
