package graft

import org.apache.spark.sql.functions._

import graft.operators.Winnow

/** Laws of the winnowing span-dedup operator (operators/Winnow.scala —
  * Schleimer/Wilkerson/Aiken SIGMOD 2003):
  *  - detection guarantee: a shared token span of ≥ w+k−1 tokens is
  *    ALWAYS detected, at any relative offset in the two documents;
  *  - density: ~2/(w+1) of k-gram positions become fingerprints;
  *  - scale shape: fingerprint selection runs without a shuffle.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5
  private val W = 8
  private val GuaranteeLen = W + K - 1 // 12 tokens

  /** Random token vocabulary wide enough that chance k-gram collisions
    * are impossible across the tiny test corpora.
    */
  private def randWords(rnd: scala.util.Random, n: Int): Seq[String] =
    Seq.fill(n)(s"t${rnd.nextInt(1000000)}x${rnd.nextInt(1000000)}")

  test("planted shared span of exactly w+k-1 tokens is detected at ANY alignment") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val span = randWords(rnd, GuaranteeLen)
      // distinct random documents, span embedded at different offsets
      val offA = rnd.nextInt(40)
      val offB = rnd.nextInt(40)
      val docA = (randWords(rnd, offA) ++ span ++ randWords(rnd, 30)).mkString(" ")
      val docB = (randWords(rnd, offB) ++ span ++ randWords(rnd, 30)).mkString(" ")
      val noise = (1 to 6).map(i => (100L + i, randWords(rnd, 60).mkString(" ")))
      val docs = (Seq((1L, docA), (2L, docB)) ++ noise).toDF("doc_id", "text")
      val pairs = Winnow.spanPairs(docs, K, W).collect()
      assert(pairs.exists(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L),
        s"seed=$seed offsets=($offA,$offB): planted span not detected")
      pairs.foreach { r => // no false pairs: only the planted docs share text
        assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
      }
    }
  }

  test("spans shorter than the guarantee may be missed but never crash; empty and short docs are silent") {
    val rnd = new scala.util.Random(7)
    val shortSpan = randWords(rnd, K) // k tokens: one gram, below w+k-1
    val docs = Seq(
      (1L, (randWords(rnd, 20) ++ shortSpan ++ randWords(rnd, 20)).mkString(" ")),
      (2L, (randWords(rnd, 25) ++ shortSpan ++ randWords(rnd, 15)).mkString(" ")),
      (3L, ""), (4L, "a b c")).toDF("doc_id", "text")
    val pairs = Winnow.spanPairs(docs, K, W).collect()
    // every reported pair must genuinely share the gram text (verified join)
    pairs.foreach(r => assert(r.getAs[Long]("n_spans") >= 1L))
  }

  test("fingerprint density is near the paper's 2/(w+1), and every window is covered") {
    val rnd = new scala.util.Random(11)
    val docs = (1 to 40).map(i => (i.toLong, randWords(rnd, 80).mkString(" ")))
      .toDF("doc_id", "text")
    val nPos = docs.select(sum(greatest(size(graft.functions.Text.words(col("text"))) - (K - 1), lit(0))))
      .as[Long].head
    val nFp = Winnow.fingerprints(docs, K, W).count()
    val density = nFp.toDouble / nPos
    // 2/(w+1) = 0.222 for w=8; distinct-selection dedup pulls it a bit lower
    assert(density > 0.12 && density < 0.32, s"density $density out of band")
    // coverage: gap between consecutive selected positions within a doc < w
    // (each window of w consecutive k-grams contributes its min)
    val gaps = Winnow.fingerprints(docs, K, W)
      .withColumn("prev", lag(col("pos"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")))
      .where(col("prev").isNotNull)
      .select(max(col("pos") - col("prev"))).as[Long].head
    assert(gaps <= W, s"max fingerprint gap $gaps exceeds window $W")
  }

  test("spanExtents reports one segment covering a long planted span, inside its bounds") {
    val rnd = new scala.util.Random(3)
    val span = randWords(rnd, 40)
    val offA = 13; val offB = 29
    val docs = Seq(
      (1L, (randWords(rnd, offA) ++ span ++ randWords(rnd, 20)).mkString(" ")),
      (2L, (randWords(rnd, offB) ++ span ++ randWords(rnd, 25)).mkString(" "))
    ).toDF("doc_id", "text")
    val rows = Winnow.spanExtents(docs, K, W).collect()
    assert(rows.length == 1, s"expected one merged segment, got ${rows.toSeq}")
    val r = rows.head
    val (sa, ea) = (r.getAs[Long]("start_a"), r.getAs[Long]("end_a"))
    val (sb, eb) = (r.getAs[Long]("start_b"), r.getAs[Long]("end_b"))
    // extents lie inside the planted span and agree across both docs
    assert(sa >= offA && ea <= offA + span.length - 1, s"a-extent [$sa,$ea] outside span")
    assert(sb >= offB && eb <= offB + span.length - 1, s"b-extent [$sb,$eb] outside span")
    assert(sa - offA == sb - offB && ea - offA == eb - offB, "extents misaligned across docs")
    // winnowing covers all but < w positions at each edge
    assert(ea - sa + 1 >= span.length - 2 * W, s"coverage ${ea - sa + 1} too small")
  }

  test("two shared regions on the SAME diagonal split into two segments across a > w gap") {
    val rnd = new scala.util.Random(9)
    val s1 = randWords(rnd, GuaranteeLen + 4)
    val s2 = randWords(rnd, GuaranteeLen + 4)
    val gapLen = 2 * (W + K) // same length both docs → same diagonal, no shared grams
    val pA = randWords(rnd, 10); val pB = randWords(rnd, 22)
    val docs = Seq(
      (1L, (pA ++ s1 ++ randWords(rnd, gapLen) ++ s2 ++ randWords(rnd, 10)).mkString(" ")),
      (2L, (pB ++ s1 ++ randWords(rnd, gapLen) ++ s2 ++ randWords(rnd, 10)).mkString(" "))
    ).toDF("doc_id", "text")
    val rows = Winnow.spanExtents(docs, K, W).collect().sortBy(_.getAs[Long]("start_a"))
    assert(rows.length == 2, s"expected two segments, got ${rows.toSeq}")
    // first segment inside s1's extent, second inside s2's
    assert(rows(0).getAs[Long]("end_a") < pA.length + s1.length + gapLen)
    assert(rows(1).getAs[Long]("start_a") >= pA.length + s1.length + gapLen)
  }

  test("excision cuts the planted span from the higher-id doc only, exactly the merged extent") {
    for (seed <- 11 to 13) {
      val rnd = new scala.util.Random(seed)
      val span = randWords(rnd, 40)
      val offA = rnd.nextInt(20); val offB = rnd.nextInt(20)
      val aWords = randWords(rnd, offA) ++ span ++ randWords(rnd, 15)
      val bWords = randWords(rnd, offB) ++ span ++ randWords(rnd, 15)
      val noise = (1 to 4).map(i => (100L + i, randWords(rnd, 60).mkString(" ")))
      val docs = (Seq((1L, aWords.mkString(" ")), (2L, bWords.mkString(" "))) ++ noise)
        .toDF("doc_id", "text")
      val out = Winnow.exciseSpans(docs, K, W).collect()
      // keep-earliest: only doc 2 (the higher id of the pair) is touched
      assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L),
        s"seed=$seed: expected only doc 2 affected, got ${out.toSeq}")
      val r = out(0)
      // the cut must equal the q162 extent verbatim: tokens
      // [start_b, end_b] removed, everything else kept in order
      val ext = Winnow.spanExtents(docs, K, W).collect()
        .filter(x => x.getAs[Long]("doc_a") == 1L && x.getAs[Long]("doc_b") == 2L)
      assert(ext.length == 1)
      val (s0, e0) = (ext(0).getAs[Long]("start_b").toInt, ext(0).getAs[Long]("end_b").toInt)
      val expectClean = (bWords.take(s0) ++ bWords.drop(e0 + 1)).mkString(" ")
      assert(r.getAs[Long]("n_spans") == 1L)
      assert(r.getAs[Long]("tokens_cut") == (e0 - s0 + 1).toLong)
      assert(r.getAs[String]("clean_text") == expectClean,
        s"seed=$seed: cleaned text diverges from hand-cut [$s0,$e0]")
    }
  }

  test("overlapping cut intervals from different pairs merge into one span") {
    val rnd = new scala.util.Random(31)
    val shared = randWords(rnd, 30)
    // doc 3 shares shared[0..19] with doc 1 and shared[10..29] with
    // doc 2 — its two cut intervals overlap and must merge into ONE
    val d1 = (randWords(rnd, 8) ++ shared.take(20) ++ randWords(rnd, 12)).mkString(" ")
    val d2 = (randWords(rnd, 5) ++ shared.drop(10) ++ randWords(rnd, 12)).mkString(" ")
    val w3 = randWords(rnd, 6) ++ shared ++ randWords(rnd, 10)
    val docs = Seq((1L, d1), (2L, d2), (3L, w3.mkString(" "))).toDF("doc_id", "text")
    val out = Winnow.exciseSpans(docs, K, W).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.contains(3L), s"doc 3 must be cut, got ${out.keySet}")
    assert(out(3L).getAs[Long]("n_spans") == 1L,
      s"overlapping intervals must merge: ${out(3L)}")
    // the merged cut stays inside the shared block's extent in doc 3
    val cut = out(3L).getAs[Long]("tokens_cut")
    assert(cut > 20 && cut <= shared.length + K - 1, s"cut=$cut")
  }

  test("native winnow selection == the HOF formulation, bit-exactly (seeded random)") {
    // differential parity for plans/WinnowSelect: the O(n) deque kernel
    // against the O(n·w) SQL HOF reference (combine h·2³⁰+pos, min per
    // window, distinct keep-first), including duplicate hash values and
    // arrays shorter than one window
    val rnd = new scala.util.Random(71)
    val rows = (1 to 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong))
    }
    val df = rows.toDF("id", "hs")
    val Shift = 1073741824L
    val kernel = df.select(col("id"),
      graft.plans.NativeFunctions.winnowSelect(col("hs"), W).as("sel"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val hof = df.select(col("id"), expr(
      s"element_at(transform(array(transform(hs, (h, p) -> h * ${Shift}L + p)), " +
        s"cb -> CASE WHEN size(cb) >= $W THEN array_distinct(transform(" +
        s"sequence(0, size(cb) - $W), i -> array_min(slice(cb, i + 1, $W)))) " +
        "ELSE array() END), 1)").as("sel"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(kernel == hof)
  }

  test("fingerprint selection is a zero-shuffle projection") {
    // plain scan (Tables.documents adds its corpus-rebalance repartition,
    // which is input staging, not part of the operator)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Winnow.fingerprints(docs, K, W).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fingerprints must not shuffle:\n$plan")
  }
}
