package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup (SURVEY.md §2 B-10) — the crawl
  * pipeline's first dedup pass: the same page is typically fetched under
  * many surface forms (case-varied hosts, explicit default ports, tracking
  * parameters, shuffled query order, fragments), and canonicalizing before
  * content dedup removes the bulk of re-fetches for the cost of a string
  * projection — no shuffle at all until the keyed window.
  *
  * The canonical form: lowercase scheme+host, `:443` default port dropped,
  * trailing path slash dropped, `utm_*`/`ref` tracking parameters removed,
  * surviving query parameters SORTED (param order never distinguishes
  * resources in practice), fragment dropped.
  *
  * Every step is a regex/array built-in with identical semantics in DuckDB
  * (`regexp_extract`/`list_filter`/`list_sort`), so the whole
  * canonicalization is oracle-checkable — unlike `java.net.URI`-style
  * library parsing, which bakes one engine's quirks into the key.
  */
object UrlOps {

  /** Canonical URL form of an https URL column (see object doc for the
    * normalization steps). Non-https / malformed inputs pass through
    * UNCHANGED: an unparseable URL must stay its own dedup key — mapping
    * every piece of garbage to one canonical string would silently merge
    * distinct pages into a single "duplicate" group. */
  def canonicalize(url: Column): Column = {
    // (:443)+ not :443: a host ending in a REPEATED default-port suffix
    // must reach its fixpoint in one pass, same idempotence argument as
    // the trailing-slash strip below
    val host = regexp_replace(
      lower(regexp_extract(url, "^[Hh][Tt][Tt][Pp][Ss]://([^/?#]+)", 1)),
      "(:443)+$", "")
    // ALL trailing slashes (not just one): '/p//' must reach '/p' in a
    // single pass or canonicalization is not idempotent
    val path = regexp_replace(
      regexp_extract(url, "^[Hh][Tt][Tt][Pp][Ss]://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    // query = between the first '?' BEFORE any '#' and the fragment: the
    // leading [^#]* anchor keeps a legal '?' inside the fragment from
    // being promoted into the canonical query string
    val params = filter(
      split(regexp_extract(url, "^[^#]*?\\?([^#]*)", 1), "&"),
      p => !(p.rlike("^(utm_[^=]*|ref)=") || p === ""))
    val qs = concat_ws("&", sort_array(params))
    when(host === "", url) // not https / no host: pass through verbatim
      .otherwise(concat(lit("https://"), host, path,
        when(qs =!= "", concat(lit("?"), qs)).otherwise(lit(""))))
  }

  /** URL-keyed dedup: one row per input row with its canonical URL and a
    * keeper flag (lowest id per canonical URL wins — same keeper rule as
    * `Dedup.exact`). The window keys on the canonical string; at 100 TB
    * that is one hash-partitioned shuffle of (url-key, id) pairs, and the
    * canonicalization itself adds zero shuffles. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy("canon_url").orderBy(col(idCol))
    df.withColumn("canon_url", canonicalize(col(urlCol)))
      .withColumn("rn", row_number().over(w))
      .withColumn("is_canonical", col("rn") === 1)
      .drop("rn")
  }
}
