package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain extraction — the FIRST dedup key of every
  * web-corpus pipeline: crawls see the same page as `HTTP://WWW.Site.com/a/`
  * and `http://site.com/a?utm_source=x`, and URL-level dedup before any
  * content hashing removes the bulk of exact refetches for the price of a
  * map-side expression.
  *
  * All pure codegen'd regexp/string expressions (RE2-compatible patterns,
  * no backreferences), so the same chain replays in any SQL engine for
  * verification and the scan stays inside whole-stage codegen — zero
  * shuffle, zero UDF.
  */
object Urls {

  /** Query parameters dropped during canonicalization (click-tracking junk
    * that changes per fetch without changing the page). */
  val TrackingParamPattern = "(?:utm_[A-Za-z0-9_]*|gclid|fbclid|ref)"

  private def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def authority(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)

  /** Lowercased host with any `www.` prefix and port stripped. */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_replace(authority(url), ":[0-9]+$", "")),
      "^www\\.", "")

  private def port(url: Column): Column =
    regexp_extract(authority(url), ":([0-9]+)$", 1)

  private def path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  private def query(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Canonical form: lowercase scheme + host, `www.` and default ports
    * (http:80 / https:443) stripped, fragment dropped, tracking query
    * params removed, trailing path slashes trimmed (a bare root path
    * canonicalizes to no path at all). Non-tracking query params keep
    * their original ORDER — reordering would need a split/sort pass and
    * legitimate servers are order-sensitive in principle. */
  def canonicalizeUrl(url: Column): Column = {
    val s = scheme(url)
    val h = host(url)
    val p = port(url)
    val keepPort = p =!= "" &&
      !(s === "https" && p === "443") && !(s === "http" && p === "80")
    // tracking params: interior `&k=v` first, then a leading `k=v&`/`k=v`
    // (two passes instead of one backreferenced pattern — replacement
    // backreference syntax is engine-specific, so the oracle could not
    // replay it)
    val q1 = regexp_replace(query(url), "&" + TrackingParamPattern + "=[^&]*", "")
    val q2 = regexp_replace(q1, "^" + TrackingParamPattern + "=[^&]*&?", "")
    val cleanPath = regexp_replace(path(url), "/+$", "")
    concat(
      s, lit("://"), h,
      when(keepPort, concat(lit(":"), p)).otherwise(lit("")),
      cleanPath,
      when(q2 =!= "", concat(lit("?"), q2)).otherwise(lit("")))
  }

  /** Registrable-domain heuristic: the last two host labels
    * (`news.example.com` → `example.com`). A full answer needs the public
    * suffix list (`example.co.uk` would want three labels); the two-label
    * form is the deterministic, list-free approximation that groups the
    * overwhelming majority of crawl hosts correctly. Single-label hosts
    * (e.g. `localhost`) pass through unchanged. */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    when(h.contains("."), regexp_extract(h, "([^.]+\\.[^.]+)$", 1)).otherwise(h)
  }
}
