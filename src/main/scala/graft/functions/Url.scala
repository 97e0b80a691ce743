package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL query-string parameter extraction replaying the reference's
  * contract (reference: presto-main/src/main/java/com/facebook/presto/
  * operator/scalar/UrlFunctions.java:124, url.rst:27): split the query
  * on `&`, split each argument on the FIRST `=` only, return the value
  * of the FIRST argument whose key equals `name`; a matching key with no
  * `=` yields the empty string; no matching key yields NULL.
  *
  * PORTABLE SUBSET (the repo convention for library-coupled edges): the
  * contract above is replayed exactly for well-formed, percent-UNENCODED
  * URLs. The reference routes through `java.net.URI`, which adds two
  * behaviors this regex path deliberately does not copy: a URL that
  * throws URISyntaxException (spaces, illegal chars) yields NULL there
  * but is still string-split here, and `URI.getQuery()` percent-DECODES
  * before splitting, so an encoded `%26`/`%3D` becomes a separator there
  * but stays literal text here. Replaying those two quirks would couple
  * this function to the JDK parser's error taxonomy; pipelines with
  * encoded or malformed URLs should pre-normalize (url_decode / a
  * validity filter) before calling.
  *
  * Spark's built-in `parse_url(url, 'QUERY', key)` is regex-based and
  * returns NULL for a present-but-valueless key, so the contract is
  * composed from codegen'd split/filter/substring instead — still zero
  * UDFs, still inside WholeStageCodegen.
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

  /** First query argument (`k`, `k=`, or `k=v`) whose key equals `name`,
    * or NULL. Key = text before the first `=` (Splitter.on('=').limit(2)
    * semantics).
    */
  private def firstArg(url: Column, name: Column): Column =
    try_element_at(
      filter(split(extractQuery(url), "&", -1),
        a => element_at(split(a, "=", 2), 1) === name),
      lit(1))

  /** url_extract_parameter(url, name) — see object doc for the contract. */
  def extractParameter(url: Column, name: Column): Column = {
    val m = firstArg(url, name)
    when(!hasQuery(url), lit(null).cast("string"))
      .when(m.isNull, lit(null).cast("string"))
      .when(instr(m, "=") > 0, m.substr(instr(m, "=") + 1, length(m)))
      .otherwise(lit(""))
  }
}
