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

  /** Independent in-JVM reimplementation of the reference contract
    * (UrlFunctions.java:124): Splitter.on('&') over the query,
    * Splitter.on('=').limit(2) per arg, first key match wins.
    */
  private def reference(url: String, name: String): Option[String] = {
    // URI semantics: the query starts at the first '?' BEFORE any '#'
    val hash = url.indexOf('#')
    val end = if (hash < 0) url.length else hash
    val qStart = url.indexOf('?')
    if (qStart < 0 || qStart >= end) return None
    val query = url.substring(qStart + 1, end)
    query.split("&", -1).iterator
      .map { arg =>
        val i = arg.indexOf('=')
        if (i < 0) (arg, None) else (arg.substring(0, i), Some(arg.substring(i + 1)))
      }
      .collectFirst { case (k, v) if k == name => v.getOrElse("") }
  }

  test("randomized parity with the independent reference implementation") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val keys = Vector("a", "b", "ab", "x1", "k", "")
    def arg(): String = {
      val k = keys(rnd.nextInt(keys.size))
      rnd.nextInt(3) match {
        case 0 => k                          // valueless
        case 1 => s"$k="                     // empty value
        case _ => s"$k=${rnd.alphanumeric.take(rnd.nextInt(5)).mkString}" +
          (if (rnd.nextBoolean()) "=extra" else "") // embedded '='
      }
    }
    val cases = (1 to 600).map { _ =>
      val nArgs = rnd.nextInt(5)
      val q = rnd.nextInt(8) match {
        case 0 => ""                                   // no query at all
        case 1 => "?"                                  // EMPTY query ('' arg)
        case _ => "?" + Seq.fill(nArgs)(arg()).mkString("&")
      }
      val frag = rnd.nextInt(4) match {
        case 0 => "#z=9"
        case 1 => "#z?k=1"                             // '?' inside fragment
        case _ => ""
      }
      val probe = keys(rnd.nextInt(keys.size))
      (s"http://h/p$q$frag", probe)
    }
    val got = cases.toDF("url", "name")
      .select(Url.extractParameter(col("url"), col("name")).as("v"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    val expected = cases.map { case (u, n) => reference(u, n) }
    val diffs = cases.lazyZip(got).lazyZip(expected).collect {
      case (c, g, e) if g != e => s"$c: spark=$g ref=$e"
    }
    assert(diffs.isEmpty, diffs.take(5).mkString("; "))
  }
}
