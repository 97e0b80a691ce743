package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Recall and exactness checks for the similarity-search operators. */
class AnnSpec extends SparkSpec {

  private def embs = Tables.embeddings(spark, sfDir)

  test("hier fit backfills childless supers: encode covers every vector under starved training") {
    // aggressive subsampling leaves fewer training points than super
    // cells — classic empty-cell k-means. Every FINAL super centroid
    // must still carry >= 1 child (backfill: the parent centroid
    // itself), or ivfEncodeHier's parent equi-join silently DROPS any
    // corpus vector that argmaxes to a childless super.
    val n = embs.count()
    val (sup, ch) = Ann.ivfFitHier(embs, cSuper = 16, cChild = 4,
      iters = 2, trainMod = 16)
    assert(sup.map(_._1).toSet.subsetOf(ch.map(_._1).toSet),
      s"childless supers: ${sup.map(_._1).toSet -- ch.map(_._1).toSet}")
    val enc = Ann.ivfEncodeHier(embs, sup, ch, cChild = 4)
    assert(enc.count() == n, "encode must emit exactly one row per corpus vector")
    assert(enc.select("vec_id").distinct().count() == n)
  }

  test("ivfFit centroids are identical across partition layouts (1e-6 quantization)") {
    // r15 (VERDICT r14 item 5): a float mean's last ulp depends on the
    // accumulation order of the partial-state merges, which varies
    // with partition layout — the r14 kmeans-face twin flake. The
    // centroidMean 1e-6 grid must make the fitted model byte-equal
    // however the training set is partitioned.
    val a = Ann.ivfFit(embs.repartition(3), c = 8, iters = 2)
    val b = Ann.ivfFit(embs.repartition(13), c = 8, iters = 2)
    assert(a == b, s"layout-dependent centroids:\n$a\nvs\n$b")
    // and every coordinate sits exactly on the grid
    a.flatMap(_._2).foreach { x =>
      assert(x == math.round(x * 1e6) / 1e6, s"off-grid coordinate $x")
    }
  }

  test("recallAtK: hand-built rankings grade exactly, including zero-hit queries") {
    import spark.implicits._
    // q1: exact {1,2,3}, approx {1,3,9} -> 2/3; q2: exact {4,5}, approx
    // {6,7} -> 0/2; q3: exact {8}, approx {8} -> 1/1. approx rows past
    // rn <= k must be ignored.
    val exact = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3),
      (2L, 4L, 1), (2L, 5L, 2), (3L, 8L, 1)).toDF("qid", "cid", "rn")
    val approx = Seq((1L, 1L, 1), (1L, 3L, 2), (1L, 9L, 3), (1L, 2L, 4),
      (2L, 6L, 1), (2L, 7L, 2), (3L, 8L, 1)).toDF("qid", "cid", "rn")
    val out = Ann.recallAtK(approx, exact, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 2L, 666666L)), out(1L))
    assert(out(2L) == ((2L, 0L, 0L)), out(2L))
    assert(out(3L) == ((1L, 1L, 1000000L)), out(3L))
  }

  test("nnLabelAgreement: hand-built geometry grades per label exactly") {
    import spark.implicits._
    // label 0: 1=(1,0) and 2=(0.9,0.1) are mutual NNs -> both agree;
    // label 1: 3=(0,1) NN is 4=(0.1,0.9) same label -> agree, but
    // 5=(0.6,0.5) sits closer to label-0's cluster -> disagrees
    val corpus = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(0.1f, 0.9f), 1),
      (5L, Seq(0.8f, 0.35f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.nnLabelAgreement(corpus, corpus).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0) == ((2L, 2L, 1000000L)), out(0))
    assert(out(1) == ((3L, 2L, 666666L)), out(1))
  }

  test("nnLabelAgreement: absent label row fails loudly; NULL label aggregates") {
    import spark.implicits._
    // probe 9 is NOT in the corpus -> its label lookup must FAIL the
    // query (loud contract), not silently drop it from the report
    val corpus = Seq(
      (1L, Seq(1f, 0f), Some(0)), (2L, Seq(0.9f, 0.1f), Some(0))
    ).toDF("vec_id", "embedding", "label")
    val stray = Seq((9L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ann.nnLabelAgreement(corpus, stray.withColumn("label", lit(1)))
        .collect()
    }
    assert(e.getMessage != null)
    // a legitimate NULL label is a CLASS, not an absence: both vectors
    // present, one labelled NULL -> two report rows, no failure
    val withNull = Seq(
      (1L, Seq(1f, 0f), Some(0)), (2L, Seq(0.9f, 0.1f), None: Option[Int])
    ).toDF("vec_id", "embedding", "label")
    val rows = Ann.nnLabelAgreement(withNull, withNull).collect()
    assert(rows.length == 2, rows.mkString(";"))
  }

  test("hybridSearch: planted twin wins the fused ranking") {
    import spark.implicits._
    // twin 100 duplicates probe 1's text AND embedding direction: it
    // tops the vector ranking (cos 1.0; the probe excludes itself) and
    // sits right behind the probe lexically -> the RRF fusion puts it
    // at rank 1 ahead of docs strong on only one side
    val docs = Seq(
      (1L, "alpha beta gamma"), (100L, "alpha beta gamma"),
      (2L, "alpha delta epsilon"), (3L, "beta zeta"),
      (4L, "unrelated words here")
    ).toDF("doc_id", "text")
    val embs = Seq(
      (1L, Seq(1f, 0f)), (100L, Seq(2f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(1f, 1f)), (4L, Seq(-1f, 0.3f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Retrieval.hybridSearch(
      docs, embs, Seq("alpha", "beta", "gamma"),
      embs.filter(col("vec_id") === 1L), k = 3, depth = 4)
      .collect().map(r => r.getAs[Int]("rank") ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("fused"))).toMap
    assert(out(1)._1 == 100L, out.toString)
    // fused = vector rank 1 + lexical rank 2 (probe itself wins the
    // lexical tie on doc_id)
    assert(out(1)._2 == 1000000L / 61 + 1000000L / 62, out.toString)
    // every fused value strictly decreases down the ranking
    assert(out(1)._2 > out(2)._2 && out(2)._2 >= out(3)._2, out.toString)
  }

  test("filtered brute knn: allowed twin wins, disallowed candidates never surface, ranks dense") {
    import spark.implicits._
    // twin 100 (allowed) and twin 101 (disallowed) both sit at cos 1.0
    // of the probe; 3 (disallowed) is NEARER than 2 (allowed). The
    // filtered search must return exactly the allowed ranking — the
    // disallowed twin excluded by the predicate, not by tie-break luck,
    // and rn 1..k dense over the allowed set (never a post-filtered
    // k-list with holes).
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val corpus = Seq(
      (1L, v(1, 0), "en"),
      (100L, v(2, 0), "en"),  // allowed twin (cos 1.0)
      (101L, v(3, 0), "de"),  // disallowed twin (cos 1.0)
      (2L, v(1, 0.3), "en"),
      (3L, v(1, 0.1), "de"),  // nearer than 2, but disallowed
      (4L, v(0, 1), "en")
    ).toDF("vec_id", "embedding", "lang")
    val out = Ann.bruteKnnFiltered(corpus, corpus.filter(col("vec_id") === 1L),
      k = 3, pred = col("lang") === "en")
      .collect()
      .map(r => r.getAs[Int]("rn") -> (r.getAs[Long]("cid"), r.getAs[Double]("sim")))
      .toMap
    assert(out(1) == ((100L, 1.0)), out.toString)
    assert(out(2)._1 == 2L && out(3)._1 == 4L, out.toString)
    assert(!out.values.exists(c => c._1 == 101L || c._1 == 3L), out.toString)
  }

  test("ivfSearchFiltered with nprobe = c equals bruteKnnFiltered row-for-row") {
    // the q222 index-face parity law: probing every cell with the
    // predicate pushed into the index makes the filtered IVF search
    // EXACT — identical (qid, cid, sim, rn) rows to the brute face
    val pred = col("label") === 3
    val queries = embs.filter(col("vec_id") < 5)
    val cents = Ann.ivfFit(embs, c = 8, iters = 2)
    val index = Ann.ivfEncode(embs, cents)
      .join(embs.select(col("vec_id"), col("label")), Seq("vec_id"))
    val a = Ann.ivfSearchFiltered(cents, index, queries, k = 5, pred, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val b = Ann.bruteKnnFiltered(embs, queries, k = 5, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a.nonEmpty && a == b, s"filtered IVF != filtered brute: ${a.diff(b)} / ${b.diff(a)}")
  }

  test("pqSearchFiltered: every candidate satisfies the predicate, k-list dense per query") {
    val pred = col("label") === 3
    val queries = embs.filter(col("vec_id") < 5)
    val cents = Ann.pqFit(embs, m = 4, ksub = 16, iters = 1)
    val index = Ann.pqEncode(embs, cents)
      .join(embs.select(col("vec_id"), col("label")), Seq("vec_id"))
    val allowed = embs.filter(pred).select("vec_id").collect().map(_.getLong(0)).toSet
    val rows = Ann.pqSearchFiltered(cents, index, queries, k = 5, pred).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => allowed(r.getAs[Long]("cid"))),
      s"disallowed cid leaked: ${rows.filterNot(r => allowed(r.getAs[Long]("cid"))).mkString(", ")}")
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to rs.length), s"$q rn gap")
    }
  }

  test("hybridSearchRanked over the brute ranking equals hybridSearch (fusion is face-agnostic)") {
    val docs = Tables.documents(spark, sfDir)
    val queries = embs.filter(col("vec_id") < 3)
    val terms = Seq("hash", "join", "vector")
    val a = graft.operators.Retrieval
      .hybridSearch(docs, embs, terms, queries, k = 10, depth = 20)
      .collect().map(_.toSeq).toSet
    val vec = Ann.bruteKnn(embs, queries, k = 20)
      .select(col("qid"), col("cid").as("doc_id"), col("rn").as("rank_vec"))
    val b = graft.operators.Retrieval.hybridSearchRanked(docs, terms,
        queries.select(col("vec_id").as("qid")), vec, k = 10, depth = 20)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b, s"ranked fusion diverged: ${a.diff(b)} / ${b.diff(a)}")
  }

  test("contrastive mining: planted twin is the positive, near-miss leads the negatives") {
    import spark.implicits._
    // hand geometry in 2-d: anchor along x; twin identical (cos 1.0);
    // near-miss at ~0.95 of the threshold band's floor... below 0.9;
    // mid at cos ~0.71; far orthogonal (cos 0)
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val corpus = Seq(
      (1L, v(1, 0)),          // anchor
      (100L, v(2, 0)),        // twin direction (cos 1.0) -> pos
      (2L, v(1, 0.4)),        // cos ~0.93 -> pos (>= 0.9)
      (3L, v(1, 0.75)),       // cos ~0.80 -> hardest negative
      (4L, v(1, 1)),          // cos ~0.71 -> next negative
      (5L, v(0, 1))           // cos 0 -> last negative
    ).toDF("vec_id", "embedding")
    val anchors = corpus.filter(col("vec_id") === 1L)
    val out = Ann.contrastivePairs(corpus, anchors, k = 2, posThreshold = 0.9)
      .collect()
      .map(r => r.getAs[Long]("cid") ->
        (r.getAs[String]("role"), r.getAs[Int]("rn"), r.getAs[Double]("sim")))
      .toMap
    assert(out(100L)._1 == "pos" && out(100L)._2 == 1, out.toString)
    assert(out(2L)._1 == "pos" && out(2L)._2 == 2, out.toString)
    // k = 2 hard negatives: the NEAREST below-threshold candidates, in
    // order; the orthogonal far vector is cut
    assert(out(3L) == ("neg", 1, out(3L)._3) && out(3L)._3 < 0.9, out.toString)
    assert(out(4L)._1 == "neg" && out(4L)._2 == 2, out.toString)
    assert(!out.contains(5L), "easy negative beyond k must be cut")
    assert(!out.contains(1L), "anchor never pairs with itself")
  }

  test("brute-force knn: a vector's nearest neighbour set never contains itself") {
    val res = Ann.bruteKnn(embs, embs.filter(col("vec_id") < 5), k = 3).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("cid")))
    assert(res.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 3))
  }

  test("brute-force knn ranks by descending similarity") {
    val res = Ann.bruteKnn(embs, embs.filter(col("vec_id") === 0), k = 10).collect()
      .sortBy(_.getAs[Int]("rn"))
    val sims = res.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("multi-probe LSH knn reaches ≥30% recall@5 vs brute force") {
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Ann.bruteKnn(embs, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val approx = Ann.lshKnn(embs, queries, k = 5, nBits = 4).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, f"recall@5 = $recall%.2f")
  }

  test("IVF knn reaches ≥50% recall@5 vs brute force and returns k rows per query") {
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Ann.bruteKnn(embs, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val approx = Ann.ivfKnn(embs, queries, k = 5, c = 8, nprobe = 3).collect()
    assert(approx.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 5))
    val approxSet = approx.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val recall = (exact & approxSet).size.toDouble / exact.size
    assert(recall >= 0.5, f"recall@5 = $recall%.2f")
  }

  test("IVF fit returns c centroids of the input dimension") {
    val cents = Ann.ivfFit(embs, c = 4, iters = 1)
    assert(cents.map(_._1) == Seq(0, 1, 2, 3))
    assert(cents.forall(_._2.length == 64))
  }

  test("IVF/PQ fit derive the dimension from the data — non-64-dim corpora train clean") {
    // r8 ADVICE: a hardcoded dim=64 made centroidMean's zip_with
    // null-pad non-64-dim folds, silently nulling the summed centroids.
    import spark.implicits._
    val dim = 8
    val tiny = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(d => ((i * 7 + d * 3) % 11).toFloat - 5.0f))
    }.toDF("vec_id", "embedding")
    val cents = Ann.ivfFit(tiny, c = 3, iters = 2)
    assert(cents.size == 3)
    assert(cents.forall(_._2.length == dim), "centroids must keep the data's dim")
    assert(cents.forall(_._2.forall(v => !v.isNaN)), "no null-padded (NaN) components")
    val knn = Ann.ivfKnn(tiny, tiny.filter(col("vec_id") < 3), k = 2, c = 3, nprobe = 2)
      .collect()
    assert(knn.nonEmpty && knn.forall(!_.isNullAt(2)), "ivfKnn sims must be non-null")
    val pq = Ann.pqFit(tiny, m = 2, ksub = 4, iters = 2, dim = dim)
    assert(pq.forall(_._3.length == dim / 2))
    assert(pq.forall(_._3.forall(v => !v.isNaN)))
  }

  test("cosine dup pairs plan is a bucket equi-join — no nested-loop/cartesian over the corpus") {
    val plan = Ann.cosineDupPairs(embs, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("cosine dup pairs: an identical planted vector scores 1.0") {
    import spark.implicits._
    val v = embs.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val planted = embs.select("vec_id", "embedding", "label")
      .unionAll(Seq((9000L, v, 0)).toDF("vec_id", "embedding", "label"))
    val pairs = Ann.cosineDupPairs(planted, threshold = 0.999)
      .filter(col("vb") === 9000).collect()
    assert(pairs.length == 1 && pairs.head.getAs[Long]("va") == 0L
      && pairs.head.getAs[Double]("sim") == 1.0)
  }

  test("PQ fit returns m×ksub codebooks; codes cover [0, ksub) and every vector gets m codes") {
    val cents = Ann.pqFit(embs, m = 4, ksub = 8, iters = 1)
    assert(cents.map(c => (c._1, c._2)).toSet ==
      (for (s <- 0 until 4; c <- 0 until 8) yield (s, c)).toSet)
    assert(cents.forall(_._3.length == 16)) // 64 / m
    val codes = Ann.pqEncode(embs, cents, m = 4).collect()
    val n = embs.count()
    assert(codes.length == n * 4)
    assert(codes.forall { r =>
      val c = r.getAs[Int]("code"); c >= 0 && c < 8
    })
  }

  test("PQ ADC knn reaches ≥40% recall@5 vs exact L2 and returns k rows per query") {
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Ann.bruteKnnL2(embs, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val approx = Ann.pqKnn(embs, queries, k = 5, m = 32, ksub = 16).collect()
    assert(approx.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 5))
    val approxSet = approx.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val recall = (exact & approxSet).size.toDouble / exact.size
    assert(recall >= 0.4, f"recall@5 = $recall%.2f")
  }

  test("IVF-PQ knn reaches ≥30% recall@5 vs exact L2 with half the cells probed") {
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Ann.bruteKnnL2(embs, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val approx = Ann.ivfPqKnn(embs, queries, k = 5, c = 8, nprobe = 4, m = 16).collect()
    assert(approx.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 5))
    val approxSet = approx.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val recall = (exact & approxSet).size.toDouble / exact.size
    assert(recall >= 0.3, f"recall@5 = $recall%.2f")
  }

  test("sample-trained codebooks (trainMod) hold recall parity vs full training at sf0.1") {
    // the q138/q142 posture: Lloyd rounds over the deterministic 1/4
    // hash band, encoding over every vector — at 100 TB training is
    // sample-sized (the FAISS practice); recall must not collapse
    val big = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val queries = big.filter(col("vec_id") < 20)
    val exact = Ann.bruteKnnL2(big, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    def recallOf(mod: Int): Double = {
      val approx = Ann.pqKnn(big, queries, k = 5, m = 32, ksub = 16, trainMod = mod)
        .collect()
      assert(approx.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 5))
      val s = approx.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & s).size.toDouble / exact.size
    }
    val full = recallOf(1)
    val sampled = recallOf(4)
    assert(sampled >= full - 0.1 && sampled >= 0.4,
      f"sampled recall@5 = $sampled%.2f vs full $full%.2f")
  }

  test("PQ ADC knn plan never joins the raw corpus vectors at query time (code equi-join only)") {
    val plan = Ann.pqKnn(embs, embs.filter(col("vec_id") < 3), k = 3, m = 4, ksub = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("two-level IVF at a c=256 leaf budget: one encode row per vector, global leaf ids") {
    // the 100 TB configuration the flat quantizer cannot afford:
    // 16 supers × 16 children = 256 leaves; routing is n·(16+16)
    // candidate rows, never n·256
    val big = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val (sup, ch) = Ann.ivfFitHier(big, cSuper = 16, cChild = 16, iters = 2, trainMod = 4)
    assert(sup.size == 16 && sup.forall(_._2.length == 64))
    assert(ch.nonEmpty && ch.forall(_._3.length == 64))
    assert(ch.map(c => (c._1, c._2)).distinct.size == ch.size, "duplicate child key")
    assert(ch.forall(c => c._1 >= 0 && c._1 < 16 && c._2 >= 0 && c._2 < 16))
    val index = Ann.ivfEncodeHier(big, sup, ch, cChild = 16)
    assert(index.count() == big.count(), "exactly one encode row per vector")
    val mm = index.agg(min(col("cluster")), max(col("cluster"))).collect()(0)
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 256, "leaf ids global in [0, 256)")
  }

  test("two-level IVF search: a planted twin routes to the same leaf and ranks top-1") {
    import spark.implicits._
    val (sup, ch) = Ann.ivfFitHier(embs, cSuper = 8, cChild = 8, iters = 2)
    val twins = embs.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val index = Ann.ivfEncodeHier(embs.unionByName(twins), sup, ch, cChild = 8)
    // identical vectors land in identical leaves (tie-breaks aligned)
    val leaves = index.filter(col("vec_id") < 10 || col("vec_id") >= 1000000L)
      .select(pmod(col("vec_id"), lit(1000000L)).as("base"), col("cluster"))
      .groupBy("base").agg(countDistinct(col("cluster")).as("nleaf")).collect()
    assert(leaves.forall(_.getAs[Long]("nleaf") == 1L), "twin split across leaves")
    // and the twin is rank-1 at cosine 1.0 through the two-level router
    val res = Ann.ivfSearchHier(sup, ch, Ann.ivfEncodeHier(embs, sup, ch, cChild = 8),
        twins, k = 5, cChild = 8, nprobeSuper = 2, nprobePerSuper = 2,
        excludeSelf = false).collect()
    val top1 = res.filter(_.getAs[Int]("rn") == 1)
    assert(top1.length == 10)
    assert(top1.forall(r => r.getAs[Long]("cid") == r.getAs[Long]("qid") - 1000000L
      && r.getAs[Double]("sim") == 1.0))
  }

  test("two-level IVF at the 1024-leaf design budget: n·2√c routing rows, recall parity") {
    // the design claim is 10⁴–10⁵ leaves at 100 TB; 256 leaves (above)
    // exercises the mechanism, this pins the ≥1024 configuration the
    // claim actually rests on: 32×32 on the sf1 decade (20k vectors).
    // trainMod = 1 per the measured points ≫ cells rule — 20k points
    // for 1024 cells (~20×); at 100 TB the same rule picks the sample.
    val dir = "target/testdata/sf1"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(),
      "sf1 decade missing — run tools/gen_sf1.py first (round-close gate)")
    val big = Tables.embeddings(spark, dir)
    val n = big.count()
    val (sup, ch) = Ann.ivfFitHier(big, cSuper = 32, cChild = 32, iters = 2, trainMod = 1)
    assert(sup.size == 32)
    assert(ch.size > 512 && ch.size <= 1024,
      s"${ch.size} leaves — expected most of the 32×32 budget trained")
    val index = Ann.ivfEncodeHier(big, sup, ch, cChild = 32)
    assert(index.count() == n, "exactly one encode row per vector")
    // routing cost: stage 1 is n·cSuper candidate rows; stage 2 is
    // Σ_v |children(parent(v))| ≤ n·cChild — measured exactly from the
    // encode output (cluster div 32 = parent), the same rows a
    // ShuffleAudit weighs. Flat routing at this leaf count would be
    // n·1024; two-level must stay at n·2√c = n·64.
    val perParent = ch.groupBy(_._1).map { case (p, cs) => p -> cs.size.toLong }
    val stage2 = index.select((col("cluster") / 32).cast("int").as("parent"))
      .groupBy("parent").count().collect()
      .map(r => r.getLong(1) * perParent(r.getInt(0))).sum
    val routingRows = n * 32 + stage2
    assert(stage2 <= n * 32, s"stage-2 candidate rows $stage2 exceed n·cChild")
    assert(routingRows <= n * 64, s"routing rows $routingRows exceed n·2√c")
    assert(routingRows * 8 <= n * 1024,
      s"routing rows $routingRows not far under the flat n·c join")
    // recall parity at matched scan fraction: flat 16/4 scans 25%;
    // 32×32 probing 16 supers × 16 children = 256/1024 = 25% with
    // 32 + 16·32 = 544 comparisons vs the flat router's 1024
    val queries = big.filter(col("vec_id") < 20)
    val exact = Ann.bruteKnn(big, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & s).size.toDouble / exact.size
    }
    val flat = recallOf(Ann.ivfKnn(big, queries, k = 5, c = 16, nprobe = 4))
    val hier = recallOf(Ann.ivfSearchHier(sup, ch, index, queries, k = 5,
      cChild = 32, nprobeSuper = 16, nprobePerSuper = 16))
    assert(hier >= flat - 0.1 && hier >= 0.5,
      f"1024-leaf recall@5 = $hier%.2f vs flat $flat%.2f")
  }

  test("two-level IVF holds recall parity with the flat fit at the same leaf count") {
    val big = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val queries = big.filter(col("vec_id") < 20)
    val exact = Ann.bruteKnn(big, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.collect()
      val s = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & s).size.toDouble / exact.size
    }
    // parity frame: moving to the SCALE config must not cost recall vs
    // the old flat config at matched candidate-scan fraction. Flat
    // c=16/nprobe=4 scans 4/16 = 25% of the corpus with 16 routing
    // comparisons; two-level 16×16 (256 leaves — the budget flat
    // routing cannot afford at 10⁴+) probing 8 supers × 8 children
    // scans 64/256 = 25% with 16 + 8·16 = 144 comparisons ≪ the 256 a
    // flat router would pay at the same leaf count. trainMod = 1 here:
    // 256 children need every one of this corpus's 2000 points (the
    // k-means rule — training points must exceed cells by a healthy
    // multiple; measured, trainMod=4's 500 points for 256 cells drops
    // recall 0.94 → 0.67). At 100 TB the SAME rule holds with a
    // sample: pick trainMod so n/trainMod ≫ c, not a fixed fraction.
    val flat = recallOf(Ann.ivfKnn(big, queries, k = 5, c = 16, nprobe = 4))
    val hier = recallOf(Ann.ivfKnnHier(big, queries, k = 5, cSuper = 16, cChild = 16,
      nprobeSuper = 8, nprobePerSuper = 8, trainMod = 1))
    assert(hier >= flat - 0.1 && hier >= 0.5,
      f"two-level recall@5 = $hier%.2f vs flat $flat%.2f")
  }

  test("matryoshka agreement: planted twin survives truncation; a tail-heavy vector flips") {
    import spark.implicits._
    // hand-built 4-dim corpus, dims = 2 truncation:
    //   query 100 = (1, 0, 0, 0)
    //   twin  1   = identical → full AND truncated top-1 (sim 1.0 both)
    //   decoy 2   = (1, 0, 9, 0): truncated-cosine 1.0 (prefix parallel)
    //               but full cosine ~0.11 — flips the truncated pick by
    //               cid tie-break? no: twin also scores 1.0 truncated and
    //               has the lower cid, so agreement HOLDS for q 100.
    //   query 200 = (0, 1, 5, 0) with no twin: full top-1 is 3=(0,1,5,1)-ish,
    //               truncated prefix (0,1) ties 3 and 4=(0,1,-5,0) → the
    //               flip case: truncated picks by prefix only.
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(1f, 0f, 9f, 0f)),
      (3L, Seq(0f, 1f, 5f, 1f)), (4L, Seq(0f, 1f, -5f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq(
      (100L, Seq(1f, 0f, 0f, 0f)), (200L, Seq(0f, 1f, 5f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.matryoshkaAgreement(corpus, queries, dims = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3),
        r.getBoolean(5))).toMap
    // q100: twin 1 wins both metrics (decoy 2 ties truncated at 1.0 but
    // loses the cid tie-break) → agree
    assert(out(100L) == ((1L, 1L, true)), out(100L))
    // q200: full cosine picks 3 (closest in all dims); truncated cosine
    // ties 3 and 4 at prefix-parallel 1.0 and the cid tie-break keeps 3
    // — but 4's full sim is negative-ish, so IF truncation picked it the
    // delivered quality would collapse; assert full pick is 3 and the
    // report carries the truncated pick's FULL sim for exactly this audit
    assert(out(200L)._1 == 3L, out(200L))
  }

  test("matryoshkaAgreement rejects dims beyond the embedding length") {
    // r15 (ADVICE r14): slice() clamps past the array end, so an
    // oversized dims would silently report 100% trivial agreement —
    // the in-plan assert fails loudly instead
    import spark.implicits._
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ann.matryoshkaAgreement(corpus, queries, dims = 3).collect()
    }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("exceeds"), e.getMessage)
    // dims == length is the full cosine on both rankings: trivially agrees
    val ok = Ann.matryoshkaAgreement(corpus, queries, dims = 2).collect()
    assert(ok.forall(_.getBoolean(5)))
  }
}
