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

  /** The reference contract run through the reference's OWN delegate:
    * java.net.URI (UrlFunctions.java parseUrl → URISyntaxException →
    * NULL; URI.getQuery() percent-decodes), then Splitter.on('&') /
    * Splitter.on('=').limit(2) over the decoded query, first key match
    * wins.
    */
  private def reference(url: String, name: String): Option[String] = {
    val uri =
      try new java.net.URI(url)
      catch { case _: java.net.URISyntaxException => return None }
    Option(uri.getQuery).flatMap { query =>
      query.split("&", -1).iterator
        .map { arg =>
          val i = arg.indexOf('=')
          if (i < 0) (arg, None) else (arg.substring(0, i), Some(arg.substring(i + 1)))
        }
        .collectFirst { case (k, v) if k == name => v.getOrElse("") }
    }
  }

  test("encoded separators decode BEFORE the split, as URI.getQuery does") {
    assert(param("http://h/p?a=1%262", "a") == Some("1"))  // %26 → '&' separator
    assert(param("http://h/p?a=1%262", "2") == Some(""))   // '2' is a valueless arg…
    assert(param("http://h/p?a=1%262&2=x", "2") == Some("")) // …that shadows a later 2=x
    assert(param("http://h/p?a%3Db=c", "a") == Some("b=c")) // %3D → '=' splits the key
    assert(param("http://h/p?k=%41%25", "k") == Some("A%")) // plain + self escapes
    assert(param("http://h/p?k=a+b", "k") == Some("a+b"))   // '+' is NOT form-decoded
    assert(param("http://h/p?k=%2B", "k") == Some("+"))
  }

  test("malformed URIs yield NULL, as the reference's URISyntaxException path does") {
    assert(param("http://h/p?k=a b", "k") == None)   // space
    assert(param("http://h/p?k=%zz", "k") == None)   // invalid escape
    assert(param("http://h/p?k=%2", "k") == None)    // truncated escape
    assert(param("http://h/p?a[]=1", "a[]") == None) // brackets outside authority
    assert(param("http://h/p?k=\"v\"", "k") == None)
    assert(param("http://[::1]/p?k=v", "k") == Some("v")) // IPv6 brackets ARE legal
  }

  test("opaque URIs yield NULL even with a literal '?' (URI.getQuery is null)") {
    assert(param("mailto:a@b?k=v", "k") == None)        // classic opaque
    assert(param("http:?k=v", "k") == None)             // empty-ssp shape
    assert(param("news:comp.lang.java?k=v", "k") == None)
    assert(param("a:b/c?k=v", "k") == None)             // ssp starts non-slash
    assert(param("http:/p?k=v", "k") == Some("v"))      // single slash IS hierarchical
    assert(param("x:/?k=v", "k") == Some("v"))
    assert(param("//h/p?k=v", "k") == Some("v"))        // scheme-less net_path
    assert(param("p?k=v", "k") == Some("v"))            // relative path
    assert(param("a/b:c?k=v", "k") == Some("v"))        // ':' after '/' is no scheme
  }

  test("randomized parity with java.net.URI across 600 cases incl. escapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val keys = Vector("a", "b", "ab", "x1", "k", "")
    def token(): String = rnd.nextInt(10) match {
      case 0 => "%26"            // encoded separator
      case 1 => "%3D"            // encoded '='
      case 2 => "%41"            // encoded 'A'
      case 3 => "%25"            // encoded '%'
      case 4 => "%2B"            // encoded '+'
      case 5 => "+"              // literal plus — must NOT become a space
      case 6 => " "              // ILLEGAL: space → whole URI malformed
      case 7 => "%z"             // ILLEGAL: invalid escape
      case _ => rnd.alphanumeric.take(rnd.nextInt(4)).mkString
    }
    def arg(): String = {
      val k = keys(rnd.nextInt(keys.size))
      rnd.nextInt(4) match {
        case 0 => k                          // valueless
        case 1 => s"$k="                     // empty value
        case 2 => s"$k=${token()}${token()}"
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
      // vary the base across hierarchical, relative, and OPAQUE shapes
      // (r8 ADVICE: the old fuzz only exercised http:// bases, leaving
      // the opaque getQuery()=null divergence untested)
      val base = rnd.nextInt(10) match {
        case 0 => "mailto:a@b"
        case 1 => "http:"
        case 2 => "news:comp.lang.java"
        case 3 => "http:/p"
        case 4 => "//h/p"
        case 5 => "/p"
        case 6 => "a:b/c"
        case _ => "http://h/p"
      }
      (s"$base$q$frag", probe)
    }
    val got = cases.toDF("url", "name")
      .select(Url.extractParameter(col("url"), col("name")).as("v"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    val expected = cases.map { case (u, n) => reference(u, n) }
    val diffs = cases.lazyZip(got).lazyZip(expected).collect {
      case (c, g, e) if g != e => s"$c: spark=$g ref=$e"
    }
    assert(diffs.isEmpty, s"${diffs.size} diffs; " + diffs.take(5).mkString("; "))
  }
}
