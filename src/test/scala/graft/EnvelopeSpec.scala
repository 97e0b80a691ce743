package graft

import org.apache.spark.sql.functions._

import graft.functions.{Envelope => E}

/** Envelope algebra laws (functions/Envelope, q154): the rectilinear
  * geometry identities hold over a deterministic pseudo-random box set
  * — the invariants any geometry kernel must satisfy, checked
  * distributed so the codegen'd min/max forms are what's exercised.
  */
class EnvelopeSpec extends SparkSpec {

  // 200 deterministic boxes from hashed ids (xmin<=xmax, ymin<=ymax by
  // construction), paired all-with-all (bounded: 200x200)
  private def boxes = {
    import spark.implicits._
    (1 to 200).toDF("id")
      .select(col("id"),
        (pmod(xxhash64(col("id"), lit(1)), lit(1000)) / 10.0 - 50.0).as("x0"),
        (pmod(xxhash64(col("id"), lit(2)), lit(1000)) / 10.0 - 50.0).as("y0"),
        (pmod(xxhash64(col("id"), lit(3)), lit(300)) / 10.0).as("w"),
        (pmod(xxhash64(col("id"), lit(4)), lit(300)) / 10.0).as("h"))
      .select(col("id"),
        E.make(col("x0"), col("y0"), col("x0") + col("w"), col("y0") + col("h")).as("box"))
  }

  private def pairs = boxes.select(col("id").as("ia"), col("box").as("a"))
    .crossJoin(boxes.select(col("id").as("ib"), col("box").as("b")))

  test("intersection is contained in both operands and commutes") {
    val p = pairs
      .withColumn("i1", E.intersection(col("a"), col("b")))
      .withColumn("i2", E.intersection(col("b"), col("a")))
    // commutative (null-safe equality covers the empty case)
    assert(p.filter(not(col("i1") <=> col("i2"))).count() === 0)
    // contained in both when non-empty
    val bad = p.filter(col("i1").isNotNull)
      .filter(!E.contains(col("a"), col("i1")) || !E.contains(col("b"), col("i1")))
    assert(bad.count() === 0)
  }

  test("intersection is non-empty iff intersects; empty means disjoint") {
    val p = pairs.withColumn("i", E.intersection(col("a"), col("b")))
    assert(p.filter(col("i").isNotNull =!= E.intersects(col("a"), col("b"))).count() === 0)
  }

  test("buffer contains the original and grows area monotonically") {
    val b = boxes
      .withColumn("b1", E.buffer(col("box"), lit(0.5)))
      .withColumn("b2", E.buffer(col("box"), lit(2.0)))
    assert(b.filter(!E.contains(col("b1"), col("box"))).count() === 0)
    assert(b.filter(!E.contains(col("b2"), col("b1"))).count() === 0)
    assert(b.filter(E.area(col("b2")) < E.area(col("b1")) ||
      E.area(col("b1")) < E.area(col("box"))).count() === 0)
  }

  test("union envelope contains both operands; area >= each operand's") {
    val p = pairs.withColumn("u", E.unionEnvelope(col("a"), col("b")))
    val bad = p.filter(!E.contains(col("u"), col("a")) || !E.contains(col("u"), col("b")) ||
      E.area(col("u")) < E.area(col("a")) || E.area(col("u")) < E.area(col("b")))
    assert(bad.count() === 0)
  }

  test("contains implies intersects and intersection == contained box") {
    val p = pairs.filter(E.contains(col("a"), col("b")))
    assert(p.filter(!E.intersects(col("a"), col("b"))).count() === 0)
    assert(p.filter(not(E.intersection(col("a"), col("b")) <=> col("b"))).count() === 0)
  }

  test("intersection is idempotent and never grows area") {
    val self = boxes.withColumn("i", E.intersection(col("box"), col("box")))
    assert(self.filter(not(col("i") <=> col("box"))).count() === 0)
    val p = pairs.withColumn("i", E.intersection(col("a"), col("b")))
      .filter(col("i").isNotNull)
      .filter(E.area(col("i")) > E.area(col("a")) || E.area(col("i")) > E.area(col("b")))
    assert(p.count() === 0)
  }
}
