package graft

import org.apache.spark.sql.functions._

import graft.functions.Url

/** Url.extractParameter must replay the reference's Splitter contract
  * (UrlFunctions.java:124) byte-for-byte — the edge shapes Spark's own
  * parse_url(QUERY, key) gets wrong are the point of the helper.
  */
class UrlParamSpec extends SparkSpec {

  private def param(url: String, name: String): Option[String] = {
    import spark.implicits._
    Seq(url).toDF("url")
      .select(Url.extractParameter(col("url"), lit(name)).as("v"))
      .collect().head match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getString(0))
      }
  }

  test("first match wins on duplicate keys") {
    assert(param("http://h/p?a=1&b=2&a=3", "a") == Some("1"))
  }

  test("valueless key yields empty string (parse_url returns null here)") {
    assert(param("http://h/p?flag&b=2", "flag") == Some(""))
  }

  test("empty value yields empty string") {
    assert(param("http://h/p?e=&b=2", "e") == Some(""))
  }

  test("absent key yields NULL") {
    assert(param("http://h/p?a=1", "zzz") == None)
  }

  test("no query string yields NULL") {
    assert(param("http://h/p", "a") == None)
  }

  test("fragment is not part of the query") {
    assert(param("http://h/p?a=1#b=9", "b") == None)
    assert(param("http://h/p?a=1#b=9", "a") == Some("1"))
  }

  test("value keeps everything after the FIRST = (Splitter limit 2)") {
    assert(param("http://h/p?k=a=b=c", "k") == Some("a=b=c"))
  }

  test("key match is exact, not prefix") {
    assert(param("http://h/p?size2=9&size=1", "size") == Some("1"))
  }
}
