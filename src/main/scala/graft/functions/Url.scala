package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL query-string parameter extraction replaying the reference's
  * contract (reference: presto-main/src/main/java/com/facebook/presto/
  * operator/scalar/UrlFunctions.java:124, url.rst:27): parse the URL as
  * a java.net.URI (a URISyntaxException yields NULL), take the DECODED
  * query (`URI.getQuery()` percent-decodes before anything else), split
  * it on `&`, split each argument on the FIRST `=` only, return the
  * value of the FIRST argument whose key equals `name`; a matching key
  * with no `=` yields the empty string; no matching key yields NULL.
  *
  * Full URI parity (r8 — the PORTABLE SUBSET carve-out is gone):
  *  - MALFORMED → NULL. The validity gate is the RFC 3986 character
  *    discipline — which is precisely what URISyntaxException enforces
  *    on hierarchical http(s) URLs: no excluded ASCII anywhere (space,
  *    controls, `"<>\^`{|}`, DEL), every `%` opening a two-hex-digit
  *    escape, and `[`/`]` only inside the authority (IPv6 literals).
  *  - DECODE BEFORE SPLIT. The query is percent-decoded first, so an
  *    encoded `%26`/`%3D` BECOMES a separator, exactly as the
  *    reference's `URI.getQuery()` makes it one. Literal `+` stays `+`
  *    (URI decoding is not x-www-form-urlencoded): it is masked as
  *    `%2B` before Spark's url_decode and so round-trips.
  *
  * The 600-case fuzz in UrlParamSpec runs against java.net.URI itself
  * (the reference's own delegate) including encoded separators, invalid
  * escapes, and illegal characters.
  *
  * Spark's built-in `parse_url(url, 'QUERY', key)` is regex-based,
  * returns NULL for a present-but-valueless key, and never decodes —
  * so the contract is composed from codegen'd built-ins instead
  * (url_decode is a codegen'd static call) — still zero UDFs, still
  * inside WholeStageCodegen.
  */
object Url {

  /** The raw query string: everything between the first `?` that occurs
    * BEFORE any `#` and the `#` (or end). A `?` inside the fragment is
    * not a query marker (URI semantics — the reference parses with
    * java.net.URI, whose getQuery() is null for `http://h/p#a?b`).
    */
  def extractQuery(url: Column): Column =
    regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)

  /** TRUE iff the URL has a query part at all — `?` before any `#`.
    * Distinct from an EMPTY query (`http://h/p?`): no query → NULL from
    * extractParameter for every name, while an empty query still splits
    * to one empty argument (Splitter keeps empty strings), which an
    * empty `name` probe matches.
    */
  private def hasQuery(url: Column): Column = url.rlike("^[^#]*\\?")

  /** RFC 3986 character validity — the conditions URISyntaxException
    * checks on hierarchical http(s) URLs. Three rules, each a single
    * codegen'd regex:
    *  (1) no excluded ASCII anywhere;
    *  (2) every `%` begins a valid two-hex-digit escape;
    *  (3) `[` / `]` appear only in the authority (IPv6 literals) —
    *      i.e. never after the authority is stripped.
    */
  private def isValidUri(url: Column): Column = {
    val noIllegal = !url.rlike("[\\x00-\\x20\"<>\\\\^`{|}\\x7f]")
    val validEscapes = !url.rlike("%(?![0-9A-Fa-f]{2})")
    val noStrayBrackets =
      !regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*", "")
        .rlike("[\\[\\]]")
    noIllegal && validEscapes && noStrayBrackets
  }

  /** The DECODED query, as URI.getQuery() returns it: percent-escapes
    * resolved (UTF-8), literal `+` preserved (masked to `%2B` so
    * url_decode's form-decoding cannot turn it into a space). Only ever
    * evaluated behind [[isValidUri]], so url_decode never sees an
    * invalid escape.
    */
  private def decodedQuery(url: Column): Column =
    url_decode(regexp_replace(extractQuery(url), "\\+", "%2B"))

  /** First query argument (`k`, `k=`, or `k=v`) whose key equals `name`,
    * or NULL. Key = text before the first `=` of the DECODED argument
    * (Splitter.on('=').limit(2) semantics).
    */
  private def firstArg(url: Column, name: Column): Column =
    try_element_at(
      filter(split(decodedQuery(url), "&", -1),
        a => element_at(split(a, "=", 2), 1) === name),
      lit(1))

  /** TRUE iff the URL is an OPAQUE URI: a scheme whose scheme-specific
    * part does NOT start with `/` (`mailto:a@b?k=v`, `http:?k=v`).
    * java.net.URI never parses a query out of an opaque part —
    * `URI.getQuery()` is null — so the reference returns NULL for every
    * parameter even though a literal `?` is present (r8 ADVICE: the
    * hasQuery gate alone would wrongly see it). A SINGLE slash is
    * hierarchical (`http:/p?k=v` parses a query — RFC 2396 abs_path),
    * as are scheme-less relative references (`/p?k=v`, `//h/p?k=v`).
    */
  private def isOpaque(url: Column): Column =
    url.rlike("^[a-zA-Z][a-zA-Z0-9+.\\-]*:") &&
      !url.rlike("^[a-zA-Z][a-zA-Z0-9+.\\-]*:/")

  /** url_extract_parameter(url, name) — see object doc for the contract. */
  def extractParameter(url: Column, name: Column): Column = {
    val m = firstArg(url, name)
    when(!isValidUri(url), lit(null).cast("string"))
      .when(isOpaque(url), lit(null).cast("string"))
      .when(!hasQuery(url), lit(null).cast("string"))
      .when(m.isNull, lit(null).cast("string"))
      .when(instr(m, "=") > 0, m.substr(instr(m, "=") + 1, length(m)))
      .otherwise(lit(""))
  }
}
