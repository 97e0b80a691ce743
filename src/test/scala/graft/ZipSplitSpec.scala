package graft

/** The reference's own documented examples for the ARRAY zip family and
  * regexp_split (q173) evaluate identically on Spark's native
  * arrays_zip / zip_with / split — including the three load-bearing
  * edge contracts: NULL fill on uneven zip, null-extension of the
  * shorter zip_with array, and trailing empty strings preserved by
  * regexp_split (reference array.rst:384/:392, regexp.rst:112).
  */
class ZipSplitSpec extends SparkSpec {

  private def one(sql: String): Any = spark.sql(s"SELECT $sql AS v").head().get(0)

  test("zip fills uneven lengths with NULL (array.rst:384 example)") {
    // SELECT zip(ARRAY[1, 2], ARRAY['1b', null, '3b']);
    //   -- [ROW(1, '1b'), ROW(2, null), ROW(null, '3b')]
    val got = one(
      "transform(arrays_zip(array(1, 2), array('1b', cast(null as string), '3b')), " +
        "s -> concat(coalesce(cast(s.`0` as string), 'N'), ':', coalesce(s.`1`, 'N')))")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got.toSeq == Seq("1:1b", "2:N", "N:3b"))
  }

  test("zip_with null-extends the shorter array (array.rst:392 examples)") {
    // SELECT zip_with(ARRAY[1, 2], ARRAY[3, 4], (x, y) -> x + y); -- [4, 6]
    assert(one("zip_with(array(1, 2), array(3, 4), (x, y) -> x + y)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(4, 6))
    // SELECT zip_with(ARRAY['a', 'b', 'c'], ARRAY['d', 'e', 'f'],
    //   (x, y) -> concat(x, y)); -- ['ad', 'be', 'cf']
    assert(one("zip_with(array('a', 'b', 'c'), array('d', 'e', 'f'), " +
      "(x, y) -> concat(x, y))")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("ad", "be", "cf"))
    // SELECT zip_with(ARRAY['a'], ARRAY['d', null, 'f'],
    //   (x, y) -> coalesce(x, y)); -- ['a', null, 'f']
    val coal = one("zip_with(array('a'), array('d', cast(null as string), 'f'), " +
      "(x, y) -> coalesce(x, y))").asInstanceOf[scala.collection.Seq[String]]
    assert(coal.toSeq == Seq("a", null, "f"))
    // SELECT zip_with(ARRAY[1, 3, 5], ARRAY['a', 'b', 'c'],
    //   (x, y) -> (y, x)); -- [ROW('a', 1), ROW('b', 3), ROW('c', 5)]
    val rows = one("transform(zip_with(array(1, 3, 5), array('a', 'b', 'c'), " +
      "(x, y) -> struct(y, x)), s -> concat(s.y, ':', cast(s.x as string)))")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(rows.toSeq == Seq("a:1", "b:3", "c:5"))
  }

  test("regexp_split preserves trailing empty strings (regexp.rst:112 example)") {
    // SELECT regexp_split('1a 2b 14m', '\s*[a-z]+\s*'); -- [1, 2, 14, ]
    val got = one("""split('1a 2b 14m', '\\s*[a-z]+\\s*')""")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got.toSeq == Seq("1", "2", "14", ""))
  }
}
