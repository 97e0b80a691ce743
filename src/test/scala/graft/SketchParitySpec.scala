package graft

import org.apache.spark.sql.functions._

import graft.functions.{Sketches, Text}
import graft.operators.Ann

/** The native codegen kernels (graft.plans.VectorExprs) must be
  * bit-identical to their HOF formulations — same hash chain, same fold
  * order — so swapping them in changes nothing but speed.
  */
class SketchParitySpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir).limit(200)
    .select(col("doc_id"), Text.words(col("text")).as("w"))

  test("native minhash signature == HOF minhash signature") {
    val mismatches = docs
      .select(Sketches.minhashSignature("w").as("native"),
        Sketches.minhashSignatureHof("w").as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatches === 0)
  }

  test("native simhash == HOF simhash") {
    val mismatches = docs
      .select(Sketches.simhash("w").as("native"),
        Sketches.simhashHof("w").as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatches === 0)
  }

  test("native md5-60 hashes == HOF conv(substr(md5)) chain, plain and mod P") {
    val mismatches = docs
      .select(Sketches.md5Hashes("w").as("n1"), Sketches.md5HashesHof("w").as("h1"),
        Sketches.md5HashesModP("w").as("n2"), Sketches.md5HashesModPHof("w").as("h2"))
      .filter(not(col("n1") <=> col("h1")) || not(col("n2") <=> col("h2")))
      .count()
    assert(mismatches === 0)
  }

  test("fused shingle hashes == hash of concat_ws shingle strings (md5 and xx64)") {
    import graft.plans.NativeFunctions
    val mismatches = docs
      .select(
        NativeFunctions.shingleHashes(col("w"), 3, "md5", graft.plans.Affine.P).as("n1"),
        expr(s"transform(${Text.shinglesSql("w", 3)}, x -> " +
          s"cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint) % ${graft.plans.Affine.P}L)").as("h1"),
        NativeFunctions.shingleHashes(col("w"), 3, "xx").as("n2"),
        expr(s"transform(${Text.shinglesSql("w", 3)}, x -> xxhash64(x))").as("h2"))
      .filter(not(col("n1") <=> col("h1")) || not(col("n2") <=> col("h2")))
      .count()
    assert(mismatches === 0)
  }

  test("native slot agreement and hyperplane bucket == their HOF formulations") {
    import graft.plans.NativeFunctions
    val sigs = docs
      .select(col("doc_id"), graft.plans.NativeFunctions
        .shingleHashes(col("w"), 3, "md5", graft.plans.Affine.P).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), Sketches.minhashAffine("hs", 32).as("sig"))
    val a = sigs.select(col("doc_id").as("ia"), col("sig").as("sa"))
    val b = sigs.select(col("doc_id").as("ib"), col("sig").as("sb"))
    val sigMismatch = a.join(b, col("ia") < col("ib")).limit(3000)
      .select((NativeFunctions.slotAgree(col("sa"), col("sb")) / 32.0d).as("native"),
        Sketches.estJaccardHof("sa", "sb", 32).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(sigMismatch === 0)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>").as("emb"))
    val hpMismatch = e
      .select(Sketches.affineHyperplaneBucket("emb", 4, 64).as("native"),
        Sketches.affineHyperplaneBucketHof("emb", 4, 64).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(hpMismatch === 0)
  }

  test("native cosine == HOF cosine (exact double equality)") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val a = e.select(col("vec_id").as("ia"), col("emb").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("emb").as("eb"))
    val mismatches = a.join(b, col("ia") < col("ib")).limit(5000)
      .select(Ann.cosine("ea", "eb").as("native"),
        Ann.cosineHof("ea", "eb").as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatches === 0)
  }

  test("graft_cosine is registered as a SQL function via extensions") {
    import spark.implicits._
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("native l2sq == HOF l2sq (exact double equality, incl. dim-mismatch null)") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val a = e.select(col("vec_id").as("ia"), col("emb").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("emb").as("eb"))
    val mismatches = a.join(b, col("ia") < col("ib")).limit(5000)
      .select(Ann.l2sq("ea", "eb").as("native"),
        Ann.l2sqHof("ea", "eb").as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatches === 0)
    // dimension mismatch → null on both forms (zip_with null padding)
    val cut = a.join(b, col("ia") < col("ib")).limit(10)
      .select(Ann.l2sq("ea", "eb").as("full"),
        expr("slice(ea, 1, 32)").as("ea32"))
      .select(graft.plans.NativeFunctions.l2Sq(col("ea32"), lit(null).cast("array<double>")).as("nullside"),
        graft.plans.NativeFunctions.l2Sq(col("ea32"), col("ea32")).as("self"))
    assert(cut.filter(col("nullside").isNotNull).count() === 0)
    assert(cut.filter(col("self") =!= 0.0).count() === 0)
  }

  test("graft_l2sq is registered as a SQL function via extensions") {
    import spark.implicits._
    val r = spark.sql(
      "SELECT graft_l2sq(array(1.0D, 2.0D), array(3.0D, 0.0D)) AS c")
      .as[Double].head()
    assert(math.abs(r - 8.0) < 1e-12)
    // mismatched dimensions null out, matching the HOF contract
    assert(spark.sql(
      "SELECT graft_l2sq(array(1.0D), array(1.0D, 2.0D)) AS c").head().isNullAt(0))
  }

  test("sql minhash/simhash functions evaluate") {
    import spark.implicits._
    val sig = spark.sql(
      "SELECT graft_minhash(array('a', 'b', 'c'), 8) AS s").as[Seq[Long]].head()
    assert(sig.length === 8)
    val sh = spark.sql(
      "SELECT graft_simhash(array('a', 'b', 'c')) AS s").as[Long].head()
    val shAgain = spark.sql(
      "SELECT graft_simhash(array('a', 'b', 'c')) AS s").as[Long].head()
    assert(sh === shAgain)
  }
}
