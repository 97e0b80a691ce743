package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, QueryFamily, Tables}
import graft.functions.Text
import graft.operators.{Ann, Dedup, Winnow}
import graft.sources.Multimodal

/** §2.6 LLM-training-data pipeline operators — dedup (exact, n-gram
  * Jaccard, MinHash+LSH, SimHash), similarity search (brute-force +
  * LSH-bucketed ANN), text analysis (language ID, quality scoring, token
  * counting, fingerprinting), and multimodal binary plumbing.
  *
  * Beyond the reference's SQL surface (brief-mandated). Sketch-based
  * candidates (xxhash64) have no DuckDB equivalent → rows-only checks
  * there, with exact oracled companions (q60/q61/q64/q71) and planted-dup
  * / recall ScalaTests covering the sketch paths.
  */
object PipelineQueries extends QueryFamily {

  // Shared DuckDB snippets (normalized text / words / shingles).
  private val NORM = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
  private val WORDS = s"string_split($NORM, ' ')"
  private val SHINGLES =
    "list_transform(range(1, greatest(len(w) - 2, 0) + 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])"

  val q60 = Q(
    "q60_dedup_exact",
    s"""SELECT md5($NORM) AS content_hash,
       | min(doc_id) AS canonical_id,
       | count(*) AS n_copies
       |FROM documents
       |GROUP BY 1
       |ORDER BY canonical_id""".stripMargin) { (s, d) =>
    Dedup.exactGroups(Tables.documents(s, d))
      .select("content_hash", "canonical_id", "n_copies")
      .orderBy("canonical_id")
  }

  val q61 = Q(
    "q61_dedup_ngram_jaccard",
    s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
       |shd AS (SELECT DISTINCT doc_id, s
       |        FROM (SELECT doc_id, unnest($SHINGLES) AS s FROM d)),
       |ok AS (SELECT s FROM shd GROUP BY s HAVING count(*) <= 50),
       |shf AS (SELECT shd.doc_id, shd.s FROM shd JOIN ok USING (s)),
       |cnt AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |          FROM shf a JOIN shf b USING (s)
       |          WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
       | ca.n AS na, cb.n AS nb,
       | round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) AS jaccard
       |FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
       |WHERE round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    Dedup.jaccardPairs(Tables.documents(s, d), threshold = 0.5)
      .orderBy("doc_a", "doc_b")
  }

  // 60-bit md5-derived element hash — the base of the SQL-replayable
  // sketch family (graft.plans.Affine mirrors this in the native
  // kernels). Minhash reduces it mod 2^31−1 for the affine mixing;
  // simhash keeps all 60 bits (every bit must carry signal).
  private val H0 = "CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)"
  private val H0P = s"$H0 % 2147483647"

  // the k=32 affine slot minima, generated from the same constants the
  // native MinHashAffine kernel uses
  private val SIG = (0 until 32).map { i =>
    s"list_min(list_transform(hs, h -> (${graft.plans.Affine.a(i)} * h + ${graft.plans.Affine.b(i)}) % 2147483647))"
  }.mkString("[", ", ", "]")

  // shared by q62 (pair emission), q121 (cluster closure over the same
  // pairs), and q155 (threshold calibration at a lower floor)
  private def minhashPairsSql(minEst: String): String =
    s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
       |s AS (SELECT doc_id, $SHINGLES AS sh FROM d),
       |hs AS (SELECT doc_id, list_transform(sh, x -> $H0P) AS hs FROM s WHERE len(sh) > 0),
       |sig AS (SELECT doc_id, $SIG AS sig FROM hs),
       |bands AS (SELECT doc_id, sig, band,
       |   array_to_string(list_transform(sig[band*4+1 : band*4+4], x -> CAST(x AS VARCHAR)), ',') AS bkey
       | FROM sig, (SELECT unnest(range(8)) AS band) t),
       |bn AS (SELECT band, bkey, count(*) AS n FROM bands GROUP BY 1, 2),
       |bounded AS (SELECT bands.doc_id, bands.sig, bands.band, bands.bkey
       | FROM bands JOIN bn USING (band, bkey) WHERE bn.n <= 20),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
       | FROM bounded a JOIN bounded b
       |   ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       | round(len(list_filter(range(1, 33), i -> sig_a[i] = sig_b[i])) / 32.0, 6) AS est_jaccard
       |FROM pairs
       |WHERE len(list_filter(range(1, 33), i -> sig_a[i] = sig_b[i])) / 32.0 >= $minEst""".stripMargin

  private val q62PairsSql: String = minhashPairsSql("0.5")

  val q62 = Q(
    "q62_dedup_minhash",
    s"$q62PairsSql\nORDER BY doc_a, doc_b") { (s, d) =>
    Dedup.minhashCandidates(Tables.documents(s, d))
      .orderBy("doc_a", "doc_b")
  }

  val q63 = Q(
    "q63_dedup_simhash",
    s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
       |hs AS (SELECT doc_id, list_transform(w, x -> $H0) AS hs FROM d WHERE len(w) > 0),
       |fp AS (SELECT doc_id, CAST(list_sum(list_transform(range(60), b ->
       |   CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
       |        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS sh FROM hs),
       |chunks AS (SELECT doc_id, sh, chunk, (sh >> (chunk * 15)) & 32767 AS ckey
       | FROM fp, (SELECT unnest(range(4)) AS chunk) t),
       |cn AS (SELECT chunk, ckey, count(*) AS df FROM chunks GROUP BY 1, 2),
       |bounded AS (SELECT chunks.doc_id, chunks.sh, chunks.chunk, chunks.ckey
       | FROM chunks JOIN cn USING (chunk, ckey) WHERE cn.df <= 20),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |   CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
       | FROM bounded a JOIN bounded b
       |   ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id
       | WHERE bit_count(xor(a.sh, b.sh)) <= 6)
       |SELECT doc_a, doc_b, hamming FROM pairs
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    Dedup.simhashCandidates(Tables.documents(s, d), maxHamming = 6)
      .orderBy("doc_a", "doc_b")
  }

  val q64 = Q(
    "q64_embedding_knn_brute",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |sims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
      |           round(list_cosine_similarity(q.emb, c.emb), 4) AS sim
      |         FROM e q JOIN e c ON q.vec_id <> c.vec_id
      |         WHERE q.vec_id < 10),
      |rk AS (SELECT qid, cid, sim,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
      |       FROM sims)
      |SELECT qid, cid, sim, rn FROM rk WHERE rn <= 5
      |ORDER BY qid, rn""".stripMargin) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    Ann.bruteKnn(embs, embs.filter(col("vec_id") < 10), k = 5)
      .orderBy("qid", "rn")
  }

  // The LSH hyperplanes are literal ±1 arrays generated from the shared
  // Affine constants — embedded identically on both engines, so the
  // oracle replays bucketing + probing + ranking end to end.
  private val q65Oracle: String = {
    val nBits = 4
    val hps = graft.functions.Sketches.hyperplaneSigns(nBits, dim = 64)
    val bucketExpr = hps.zipWithIndex.map { case (hp, i) =>
      s"CASE WHEN list_dot_product(emb, [${hp.map(s => s"$s.0").mkString(", ")}]) > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    val probeList = ("bucket" +: (0 until nBits).map(i => s"xor(bucket, ${1L << i})")).mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |b AS (SELECT vec_id, emb, $bucketExpr AS bucket FROM e),
       |q AS (SELECT vec_id AS qid, emb AS qe, bucket FROM b WHERE vec_id < 10),
       |probes AS (SELECT qid, qe, unnest([$probeList]) AS bucket FROM q),
       |cand AS (SELECT p.qid, p.qe, c.vec_id AS cid, c.emb AS ce
       |         FROM probes p JOIN b c USING (bucket) WHERE p.qid <> c.vec_id),
       |rk AS (SELECT qid, cid, round(list_cosine_similarity(qe, ce), 4) AS sim,
       |         CAST(row_number() OVER (PARTITION BY qid
       |           ORDER BY round(list_cosine_similarity(qe, ce), 4) DESC, cid) AS INTEGER) AS rn
       |       FROM cand)
       |SELECT qid, cid, sim, rn FROM rk WHERE rn <= 5
       |ORDER BY qid, rn""".stripMargin
  }

  val q65 = Q("q65_embedding_knn_lsh", q65Oracle) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    Ann.lshKnn(embs, embs.filter(col("vec_id") < 10), k = 5, nBits = 4)
      .orderBy("qid", "rn")
  }

  private val langCases = {
    val gt = Text.stopwords.map(_._1)
    // deterministic argmax: first language (in declaration order) whose
    // hit count is maximal and positive
    gt.zipWithIndex.map { case (lang, i) =>
      val rest = gt.drop(i + 1).map(l => s"h_$l")
      val cond = rest match {
        case Seq()     => s"h_$lang > 0"
        case Seq(only) => s"h_$lang >= $only AND h_$lang > 0"
        case many      => s"h_$lang >= greatest(${many.mkString(", ")}) AND h_$lang > 0"
      }
      s"WHEN $cond THEN '$lang'"
    }.mkString(" ")
  }

  val q66 = Q(
    "q66_langid",
    s"""WITH hits AS (
       |  SELECT doc_id, CAST(len(w) AS INTEGER) AS n_words,
       |${Text.stopwords.map { case (lang, ws) =>
          s"   CAST(len(list_filter(w, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS INTEGER) AS h_$lang"
        }.mkString(",\n")}
       |  FROM (SELECT doc_id, $WORDS AS w FROM documents))
       |SELECT doc_id, n_words, h_en, h_es, h_de, h_fr, h_zh,
       | round(CAST(h_en AS DOUBLE) / n_words, 6) AS ratio_en,
       | CASE $langCases ELSE 'und' END AS predicted
       |FROM hits
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val hits = Tables.documents(s, d)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(Seq(col("doc_id"), size(col("w")).as("n_words")) ++
        Text.stopwords.map { case (lang, ws) =>
          Text.vocabHits("w", ws).as(s"h_$lang")
        }: _*)
    hits.select(col("doc_id"), col("n_words"),
      col("h_en"), col("h_es"), col("h_de"), col("h_fr"), col("h_zh"),
      round(col("h_en").cast("double") / col("n_words"), 6).as("ratio_en"),
      expr(s"CASE $langCases ELSE 'und' END").as("predicted"))
      .orderBy("doc_id")
  }

  val q67 = Q(
    "q67_quality_score",
    s"""WITH m AS (
       |  SELECT doc_id,
       |   CAST(length(n) AS INTEGER) AS n_chars,
       |   CAST(len(w) AS INTEGER) AS n_words,
       |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(length(replace(n, ' ', '')) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS aw6,
       |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS sr6,
       |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> length(x) < 3)) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS shr6
       |  FROM (SELECT doc_id, $NORM AS n, $WORDS AS w FROM documents))
       |SELECT doc_id, n_chars, n_words,
       | aw6 / 1000000.0 AS avg_wlen, sr6 / 1000000.0 AS stop_ratio, shr6 / 1000000.0 AS short_ratio,
       | CASE WHEN n_words = 0 THEN 0.0 ELSE CAST((2 * (least(CAST(n_words AS BIGINT) * 20000, 4000000) + 3 * sr6 + 3000000 - 3 * shr6) + 1000) // 2000 AS BIGINT) / 10000.0 END AS quality
       |FROM m
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // one implementation shared with the SQL front door (graft_quality TVF)
    graft.operators.Quality.score(Tables.documents(s, d)).orderBy("doc_id")
  }

  val q68 = Q(
    "q68_token_count",
    s"""SELECT doc_id,
       | CAST(len($WORDS) AS INTEGER) AS ws_tokens,
       | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS re_tokens,
       | round(CAST(length(text) AS DOUBLE) / len($WORDS), 6) AS chars_per_token
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ws = Text.words(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(ws).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("re_tokens"),
        round(length(col("text")).cast("double") / size(ws), 6).as("chars_per_token"))
      .orderBy("doc_id")
  }

  val q69 = Q(
    "q69_fingerprint",
    s"""SELECT doc_id,
       | CAST(len(w) AS INTEGER) AS n_words,
       | list_reduce(
       |   list_prepend(CAST(0 AS BIGINT),
       |     list_transform(w, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT))),
       |   (a, x) -> (a * 131 + x) % 1000000007) AS fingerprint
       |FROM (SELECT doc_id, $WORDS AS w FROM documents)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).as("n_words"),
        Text.fingerprint("w").as("fingerprint"))
      .orderBy("doc_id")
  }

  val q70 = Q(
    "q70_multimodal_meta",
    """SELECT doc_id,
      | CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
      | CAST(('0x' || substr(hex(text::BLOB), 1, 2)) AS INTEGER) AS first_byte,
      | CAST(octet_length(text::BLOB) % 64 + 1 AS INTEGER) AS fake_width,
      | CAST(CAST(('0x' || substr(hex(text::BLOB), 1, 2)) AS INTEGER) % 64 + 1 AS INTEGER) AS fake_height,
      | CAST(octet_length(text::BLOB) % 10 + 1 AS INTEGER) AS fake_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(s, Tables.documents(s, d))
      .toDF()
      .orderBy("doc_id")
  }

  // Embedding near-dup pairs via LSH candidates + exact-cosine verify
  // (no all-pairs join). The oracle replays the same literal-hyperplane
  // bucketing + 1-bit multi-probe, then the same exact verification —
  // the full scale-path plan is what gets hash-checked.
  private val q71Oracle: String = {
    val nBits = 4
    val hps = graft.functions.Sketches.hyperplaneSigns(nBits, dim = 64)
    val bucketExpr = hps.zipWithIndex.map { case (hp, i) =>
      s"CASE WHEN list_dot_product(emb, [${hp.map(s => s"$s.0").mkString(", ")}]) > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    val probeList = ("bucket" +: (0 until nBits).map(i => s"xor(bucket, ${1L << i})")).mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |b AS (SELECT vec_id, emb, $bucketExpr AS bucket FROM e),
       |probes AS (SELECT vec_id, unnest([$probeList]) AS bucket FROM b),
       |cand AS (SELECT DISTINCT p.vec_id AS va, c.vec_id AS vb
       |         FROM probes p JOIN b c USING (bucket) WHERE p.vec_id < c.vec_id)
       |SELECT va, vb, round(list_cosine_similarity(ea.emb, eb.emb), 4) AS sim
       |FROM cand JOIN e ea ON va = ea.vec_id JOIN e eb ON vb = eb.vec_id
       |WHERE round(list_cosine_similarity(ea.emb, eb.emb), 4) >= 0.4
       |ORDER BY va, vb""".stripMargin
  }

  val q71 = Q("q71_dedup_embedding_cosine", q71Oracle) { (s, d) =>
    Ann.cosineDupPairs(Tables.embeddings(s, d), threshold = 0.4, nBits = 4)
      .orderBy("va", "vb")
  }

  // IVF ANN: data-adaptive counterpart of q65's LSH buckets. Centroids
  // are float averages (sum order varies by partitioning), so the full
  // neighbor list is not bit-replayable in DuckDB. The oracle instead
  // uses PLANTED TWINS: each query vector is an exact copy of corpus
  // vector j registered under qid = j + 10^6, so a correct ANN must
  // return cid = j at rank 1 with cosine 1.0 REGARDLESS of float
  // k-means details (the twin shares the query's argmax-cosine cluster,
  // so it is always probed; max natural cosine near the planted
  // sources is ≤ 0.5, so no rank-1 tie is possible). The oracled
  // projection is the per-query summary (top1 + shape invariants);
  // AnnSpec holds recall ≥ 50% vs brute force for the accuracy claim.
  private val annPlant = 1000000L
  // Every planted-twin oracle hard-codes its id offset in SQL text, so
  // the natural vec_id space must stay strictly below it — a testdata
  // regen with ≥offset embeddings would otherwise alias two different
  // vectors under one id and corrupt the oracle with no guard firing
  // (r9 ADVICE). One thin max() job, outside the audited query plan.
  private def requirePlantHeadroom(embs: DataFrame, offset: Long): DataFrame = {
    val top = embs.agg(max(col("vec_id")).cast("long")).head()
    require(top.isNullAt(0) || top.getLong(0) < offset,
      s"planted-twin offset $offset collides with the natural vec_id space " +
        s"(max ${top.getLong(0)}) — the hard-coded oracle id arithmetic is no " +
        "longer injective; regenerate with a larger offset")
    embs
  }
  private def annPlantQueries(embs: DataFrame): DataFrame =
    requirePlantHeadroom(embs, annPlant).filter(col("vec_id") < 10)
      .select((col("vec_id") + annPlant).as("vec_id"), col("embedding"))
  // Oracled projection = top1 + a scale-independent shape bit: rank-1
  // identity (and cosine 1.0) is the invariant the planted twin
  // guarantees at ANY sf/c/nprobe. Exact row and candidate-set counts
  // are data-dependent (a probed cell can hold < k vectors at small
  // sf) and live in AnnSpec — but `shape_ok` (1 ≤ result rows ≤ k and
  // exactly one rank-1 row per qid) holds at every scale, so a
  // candidate-set collapse or rank-duplication regression fails the
  // cross-engine oracle, not just the unit suite.
  private def annTop1Summary(knn: DataFrame, simCol: Option[String], k: Int): DataFrame = {
    val aggs = simCol.map(c => max(when(col("rn") === 1, col(c))).as("top1_sim")).toSeq :+
      (count(lit(1)).between(1, k) &&
        sum(when(col("rn") === 1, lit(1L)).otherwise(lit(0L))) === 1L).as("shape_ok")
    knn.groupBy(col("qid"))
      .agg(max(when(col("rn") === 1, col("cid"))).as("top1_cid"), aggs: _*)
      .orderBy("qid")
  }
  private def annTop1Oracle(simCol: String): String =
    s"""SELECT CAST(vec_id + 1000000 AS BIGINT) AS qid,
       | vec_id AS top1_cid${if (simCol.nonEmpty) "," else ""}$simCol,
       | true AS shape_ok
       |FROM embeddings WHERE vec_id < 10
       |ORDER BY qid""".stripMargin

  val q87 = Q("q87_ivf_ann", annTop1Oracle(" CAST(1.0 AS DOUBLE) AS top1_sim")) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    annTop1Summary(
      // trainMod = 4 (r8): coarse centroids train on the 1/4 hash band,
      // as in q138/q142 — assignment still covers every vector
      Ann.ivfKnn(embs, annPlantQueries(embs), k = 5, c = 16, nprobe = 4, trainMod = 4),
      simCol = Some("sim"), k = 5)
  }

  // 1→N frame sampling over binary payloads (Multimodal.sampleFrames):
  // the oracle replays the deterministic decode stub + range unnest.
  val q90 = Q(
    "q90_multimodal_frames",
    """WITH m AS (SELECT doc_id,
      |  CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
      |  CAST(('0x' || substr(hex(text::BLOB), 1, 2)) AS INTEGER) AS first_byte
      | FROM documents),
      |f AS (SELECT doc_id, first_byte, n_bytes % 10 + 1 AS n_frames FROM m)
      |SELECT doc_id, CAST(u AS INTEGER) AS frame_idx,
      | CAST((first_byte * 31 + u * 17) % 997 AS INTEGER) AS frame_hash,
      | CAST(n_frames AS INTEGER) AS n_frames
      |FROM f, unnest(range(0, n_frames, 2)) AS t(u)
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    Multimodal.sampleFrames(s, Tables.documents(s, d), step = 2)
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  // End-to-end training-data pipeline composition: exact-dedup to
  // canonical docs → English-only (same argmax as q66) → quality gate
  // (same score as q67) → token stats. One declarative plan — Catalyst
  // sees the whole flow, so the dedup groupBy, the language filter, and
  // the projection all pipeline without materialization barriers.
  val q93 = Q(
    "q93_pipeline_e2e",
    s"""WITH canon AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, md5($NORM) AS h FROM documents) GROUP BY h),
       |d AS (SELECT doc_id, $NORM AS n, $WORDS AS w
       |      FROM documents JOIN canon USING (doc_id)),
       |hits AS (
       |  SELECT doc_id, n, w, CAST(len(w) AS INTEGER) AS n_words,
       |${Text.stopwords.map { case (lang, ws) =>
          s"   CAST(len(list_filter(w, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS INTEGER) AS h_$lang"
        }.mkString(",\n")}
       |  FROM d),
       |lang AS (SELECT *, CASE $langCases ELSE 'und' END AS predicted FROM hits),
       |q AS (SELECT doc_id, n_words,
       |   CAST((2 * (least(CAST(n_words AS BIGINT) * 20000, 4000000)
       |     + 3 * ((2 * CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)))
       |     + 3000000
       |     - 3 * ((2 * CAST(len(list_filter(w, x -> length(x) < 3)) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)))) + 1000) // 2000 AS BIGINT) / 10000.0 AS quality
       | FROM lang WHERE predicted = 'en')
       |SELECT doc_id, n_words, quality
       |FROM q WHERE quality >= 0.3
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // canonical-doc selection stays the groupBy + join-back TWO-PASS
    // deliberately (r10 scan audit adjudication): a content-hash window
    // would do it in one scan but ships the full TEXT column through
    // its exchange — corpus-sized shuffle bytes at real document sizes
    // — where this shape's two pruned scans shuffle only 32-byte
    // hashes + ids. Shuffle bytes, not scans, dominate this query at
    // 100 TB; whitelisted in PlanAudit.multiScanWhitelist.
    val canon = Dedup.exactGroups(docs).select(col("canonical_id").as("doc_id"))
    val base = docs.join(canon, "doc_id")
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(Seq(col("doc_id"), col("w"), size(col("w")).as("n_words")) ++
        Text.stopwords.map { case (lang, ws) =>
          Text.vocabHits("w", ws).as(s"h_$lang")
        }: _*)
    base
      .withColumn("predicted", expr(s"CASE $langCases ELSE 'und' END"))
      .filter(col("predicted") === "en")
      .withColumn("hits", Text.vocabHits("w", Text.stopwords.head._2))
      .withColumn("sr6", expr(
        "(2 * cast(hits as bigint) * 1000000 + n_words) div (2 * n_words)"))
      .withColumn("shr6", expr(
        "(2 * cast(size(filter(w, x -> length(x) < 3)) as bigint) * 1000000 " +
          "+ n_words) div (2 * n_words)"))
      .withColumn("quality", expr(
        // the integer-micro-unit composite over direct integer 6-dp
        // ratios (see Quality.score — r17 dropped the round(ratio·1e6)
        // recovery, which was only half-safe below 128 words);
        // 10000.0D: a bare 10000.0 parses as DECIMAL in Spark SQL and
        // would silently retype the column
        "cast((2 * (least(cast(n_words as bigint) * 20000, 4000000) " +
          "+ 3 * sr6 + 3000000 " +
          "- 3 * shr6) + 1000) " +
          "div 2000 as bigint) / 10000.0D"))
      .filter(col("quality") >= 0.3)
      .select(col("doc_id"), col("n_words"), col("quality"))
      .orderBy("doc_id")
  }

  // Chunked binary decode (Multimodal.chunkDecode): fixed-size chunks
  // per payload, batched per partition; the oracle replays the rolling
  // polynomial hash over each chunk's bytes from the hex expansion of
  // the BLOB.
  val q104 = Q(
    "q104_multimodal_chunks",
    """WITH m AS (SELECT doc_id, text::BLOB AS b, octet_length(text::BLOB) AS n
      | FROM documents WHERE doc_id < 200),
      |c AS (SELECT doc_id, b, n,
      |  greatest(CAST(ceil(n / 32.0) AS INTEGER), 1) AS n_chunks FROM m),
      |x AS (SELECT doc_id, b, n, n_chunks, CAST(u AS INTEGER) AS chunk_idx
      | FROM c, unnest(range(0, n_chunks)) AS t(u))
      |SELECT doc_id, chunk_idx,
      | CAST(chunk_idx * 32 AS INTEGER) AS offset,
      | CAST(greatest(least(32, n - chunk_idx * 32), 0) AS INTEGER) AS n_chunk_bytes,
      | CASE WHEN least(32, n - chunk_idx * 32) <= 0 THEN 0 ELSE
      |   list_reduce(list_transform(range(1, least(32, n - chunk_idx * 32) + 1),
      |     j -> CAST(('0x' || substr(hex(b), (chunk_idx * 32 + CAST(j AS INTEGER) - 1) * 2 + 1, 2)) AS BIGINT)),
      |     (a, x) -> (a * 31 + x) % 1000000007) END AS chunk_hash,
      | CAST(n_chunks AS INTEGER) AS n_chunks
      |FROM x
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    // prefiltered load: the doc_id predicate pushes to the parquet scan
    // BELOW the corpus rebalance — only the 200 surviving docs shuffle
    Multimodal.chunkDecode(s, Tables.documents(s, d, col("doc_id") < 200))
      .toDF()
      .orderBy("doc_id", "chunk_idx")
  }

  // Segment-level exact dedup (the line/paragraph-dedup pass of
  // CCNet/RefinedWeb-style pipelines): each doc is chunked into fixed
  // 20-word segments; segments repeated ACROSS the corpus are reported
  // with their spread. One hash shuffle on the segment hash — the q60
  // shape at sub-document granularity, which is what catches boilerplate
  // and near-dup docs sharing most of their text.
  val q119 = Q(
    "q119_segment_dedup",
    s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
       |s AS (SELECT doc_id, i AS seg_idx,
       |   md5(array_to_string(w[CAST(i * 20 + 1 AS INTEGER) : CAST(i * 20 + 20 AS INTEGER)], ' ')) AS seg_hash
       | FROM d, unnest(range(0, CAST(ceil(len(w) / 20.0) AS INTEGER))) AS t(i)),
       |g AS (SELECT seg_hash, CAST(count(*) AS BIGINT) AS n_occ,
       |   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |   min(doc_id) AS first_doc
       | FROM s GROUP BY 1)
       |SELECT seg_hash, n_occ, n_docs, first_doc
       |FROM g WHERE n_occ > 1
       |ORDER BY seg_hash""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, cast(ceil(size(w) / 20.0) as int) - 1), " +
          "i -> md5(array_join(slice(w, i * 20 + 1, 20), ' ')))")))
      .select(col("doc_id"), col("pos").as("seg_idx"), col("col").as("seg_hash"))
      .groupBy(col("seg_hash"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_occ") > 1)
      .orderBy("seg_hash")
  }

  // Gopher-style repetition quality signals (Rae et al. 2021, public
  // rules; the repetition-filter pass of a training-data pipeline):
  // fraction of characters in the most frequent word, most frequent
  // word-2-gram fraction, duplicate-20-word-segment fraction, and the
  // composed keep/drop gate. Pure per-row projection — no shuffle, no
  // UDF; the in-array count trick (distinct × filter) is O(n·distinct)
  // per doc, bounded by doc length on both engines.
  val q120 = Q(
    "q120_gopher_repetition",
    s"""WITH d AS (SELECT doc_id, $NORM AS n, $WORDS AS w FROM documents),
       |m AS (SELECT doc_id,
       |  len(w) AS n_words,
       |  CAST(list_max(list_transform(list_distinct(w),
       |    x -> len(list_filter(w, y -> y = x)) * length(x))) AS DOUBLE)
       |    / length(replace(n, ' ', '')) AS top_word_char_frac,
       |  CAST(list_max(list_transform(
       |    list_distinct(list_transform(range(1, CAST(len(w) AS INTEGER)),
       |      i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i + 1 AS INTEGER)])),
       |    g -> len(list_filter(list_transform(range(1, CAST(len(w) AS INTEGER)),
       |      i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i + 1 AS INTEGER)]), h -> h = g))))
       |    AS DOUBLE) / (len(w) - 1) AS top_2gram_frac,
       |  1.0 - CAST(len(list_distinct(list_transform(
       |      range(0, CAST(ceil(len(w) / 20.0) AS INTEGER)),
       |      i -> array_to_string(w[CAST(i * 20 + 1 AS INTEGER) : CAST(i * 20 + 20 AS INTEGER)], ' ')))) AS DOUBLE)
       |    / CAST(ceil(len(w) / 20.0) AS INTEGER) AS dup_seg_frac
       | FROM d WHERE len(w) > 1)
       |SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
       | round(top_word_char_frac, 6) AS top_word_char_frac,
       | round(top_2gram_frac, 6) AS top_2gram_frac,
       | round(dup_seg_frac, 6) AS dup_seg_frac,
       | (top_word_char_frac <= 0.2 AND top_2gram_frac <= 0.2 AND dup_seg_frac <= 0.3) AS keep
       |FROM m
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val grams = "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
    val segs = "transform(sequence(0, cast(ceil(size(w) / 20.0) as int) - 1), i -> array_join(slice(w, i * 20 + 1, 20), ' '))"
    Tables.documents(s, d)
      .select(col("doc_id"), Text.normText(col("text")).as("n"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) > 1)
      .select(col("doc_id"), size(col("w")).as("n_words"),
        (expr("array_max(transform(array_distinct(w), x -> size(filter(w, y -> y = x)) * length(x)))")
          .cast("double") / length(regexp_replace(col("n"), " ", ""))).as("top_word_char_frac"),
        (expr(s"array_max(transform(array_distinct($grams), g -> size(filter($grams, h -> h = g))))")
          .cast("double") / (size(col("w")) - 1)).as("top_2gram_frac"),
        (lit(1.0) - expr(s"size(array_distinct($segs))").cast("double")
          / expr("cast(ceil(size(w) / 20.0) as int)")).as("dup_seg_frac"))
      .select(col("doc_id"), col("n_words"),
        round(col("top_word_char_frac"), 6).as("top_word_char_frac"),
        round(col("top_2gram_frac"), 6).as("top_2gram_frac"),
        round(col("dup_seg_frac"), 6).as("dup_seg_frac"),
        (col("top_word_char_frac") <= 0.2 && col("top_2gram_frac") <= 0.2
          && col("dup_seg_frac") <= 0.3).as("keep"))
      .orderBy("doc_id")
  }

  // Dedup clustering (graft.operators.Components): connected components
  // over the q62 minhash candidate pairs — the step that turns pair
  // emission into dedup CLUSTERS with one canonical doc each. Spark
  // side is iterative min-label propagation (diameter-bounded rounds of
  // join+agg); the oracle computes the identical closure with a
  // recursive CTE over the same replayed pairs.
  val q121 = Q(
    "q121_dedup_clusters",
    s"""WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM ($q62PairsSql)),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM p
       |      UNION SELECT doc_b, doc_a FROM p),
       |reach(id, r) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a),
       |comp AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1)
       |SELECT comp.id AS doc_id, cluster_id, cluster_size
       |FROM comp JOIN sz USING (cluster_id)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.operators.Components
    val pairs = Dedup.minhashCandidates(Tables.documents(s, d))
      .select(col("doc_a"), col("doc_b"))
    Components.dedupClusters(pairs).orderBy("doc_id")
  }

  // PII redaction (the C4/RefinedWeb-style scrubbing pass): detect and
  // replace email / phone-shaped spans. The corpus carries no real PII,
  // so each doc is augmented with a deterministic synthetic contact
  // string derived from doc_id — the REDACTION machinery (global
  // regexp counts + ordered replacement chain) is what's exercised and
  // hash-checked. Pure projection, zero shuffle.
  val q125 = Q(
    "q125_pii_redaction",
    """WITH a AS (SELECT doc_id,
      |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-'
      |       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
      | FROM documents),
      |r AS (SELECT doc_id, aug,
      |  CAST(len(regexp_extract_all(aug, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS INTEGER) AS n_emails,
      |  CAST(len(regexp_extract_all(aug, '[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
      |  regexp_replace(regexp_replace(aug, '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
      |    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
      | FROM a)
      |SELECT doc_id, n_emails, n_phones, md5(red) AS red_hash,
      | CAST(length(aug) - length(red) AS INTEGER) AS chars_removed
      |FROM r
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val phoneRe = "[0-9]{3}-[0-9]{4}"
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("aug"))
      .select(col("doc_id"), col("aug"),
        regexp_count(col("aug"), lit(emailRe)).cast("int").as("n_emails"),
        regexp_count(col("aug"), lit(phoneRe)).cast("int").as("n_phones"),
        regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("red"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        md5(col("red")).as("red_hash"),
        (length(col("aug")) - length(col("red"))).cast("int").as("chars_removed"))
      .orderBy("doc_id")
  }

  // Deterministic train/val/test split assignment: a content-independent
  // hash of the doc id buckets every document reproducibly (90/5/5) —
  // the split survives reprocessing, repartitioning and corpus growth
  // (new docs never move old ones). The canonical "no random(), ever"
  // pipeline rule.
  val q126 = Q(
    "q126_dataset_split",
    s"""WITH s AS (SELECT doc_id, $WORDS AS w,
       |  CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS b
       | FROM documents),
       |t AS (SELECT doc_id, len(w) AS n_words,
       |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
       | FROM s)
       |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(n_words) AS BIGINT) AS n_words,
       | round(count(*) / CAST((SELECT count(*) FROM documents) AS DOUBLE), 4) AS doc_share
       |FROM t GROUP BY split
       |ORDER BY split""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val total = docs.count() // scalar; the oracle's scalar subquery twin
    docs
      .select(col("doc_id"), size(Text.words(col("text"))).as("n_words"),
        (conv(substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long") % 100).as("b"))
      .withColumn("split",
        when(col("b") < 90, "train").when(col("b") < 95, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"))
      .select(col("split"), col("n_docs"), col("n_words"),
        round(col("n_docs") / lit(total.toDouble), 4).as("doc_share"))
      .orderBy("split")
  }

  // Stratified sampling for data mixing: per-language keep rates
  // (downsample the dominant language, keep the rest) applied through a
  // deterministic per-doc hash — the reproducible mixing step that
  // follows language ID in a training-data pipeline. Reuses q66's exact
  // argmax so the strata match the langid operator bit-for-bit.
  val q127 = Q(
    "q127_stratified_sample",
    s"""WITH hits AS (
       |  SELECT doc_id, CAST(len(w) AS INTEGER) AS n_words,
       |${Text.stopwords.map { case (lang, ws) =>
          s"   CAST(len(list_filter(w, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS INTEGER) AS h_$lang"
        }.mkString(",\n")}
       |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
       |lang AS (SELECT doc_id, n_words, CASE $langCases ELSE 'und' END AS predicted FROM hits),
       |rated AS (SELECT doc_id, n_words, predicted,
       |  CASE WHEN predicted = 'en' THEN 500 ELSE 1000 END AS keep_permille,
       |  CAST('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 AS h
       | FROM lang)
       |SELECT predicted, CAST(count(*) AS BIGINT) AS n_total,
       | CAST(sum(CASE WHEN h < keep_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       | round(sum(CASE WHEN h < keep_permille THEN 1 ELSE 0 END)
       |   / CAST(count(*) AS DOUBLE), 4) AS realized_rate
       |FROM rated GROUP BY predicted
       |ORDER BY predicted""".stripMargin) { (s, d) =>
    val hits = Tables.documents(s, d)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(Seq(col("doc_id"), size(col("w")).as("n_words")) ++
        Text.stopwords.map { case (lang, ws) => Text.vocabHits("w", ws).as(s"h_$lang") }: _*)
    hits
      .withColumn("predicted", expr(s"CASE $langCases ELSE 'und' END"))
      .withColumn("keep_permille", when(col("predicted") === "en", 500).otherwise(1000))
      .withColumn("h",
        conv(substring(md5(concat(lit("sample|"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long") % 1000)
      .groupBy(col("predicted"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("h") < col("keep_permille"), 1L).otherwise(0L)).as("n_sampled"))
      .select(col("predicted"), col("n_total"), col("n_sampled"),
        round(col("n_sampled") / col("n_total").cast("double"), 4).as("realized_rate"))
      .orderBy("predicted")
  }

  // Benchmark decontamination: eval set = every 50th doc (stand-in for a
  // held-out benchmark), training = the rest; a training doc is flagged
  // when ≥5% of its (df-capped) 3-gram shingles appear in ANY eval doc.
  // The Spark side joins 64-bit shingle hashes against a broadcast eval
  // index (Dedup.decontaminate); the oracle replays with string shingles
  // — identical counts modulo 64-bit collisions (q61 precedent).
  val q128 = Q(
    "q128_decontamination",
    s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
       |shd AS (SELECT DISTINCT doc_id, s
       |        FROM (SELECT doc_id, unnest($SHINGLES) AS s FROM d)),
       |ok AS (SELECT s FROM shd GROUP BY s HAVING count(*) <= 50),
       |shf AS (SELECT shd.doc_id, shd.s FROM shd JOIN ok USING (s)),
       |ev AS (SELECT doc_id AS eval_id, s FROM shf WHERE doc_id % 50 = 0),
       |tr AS (SELECT doc_id, s FROM shf WHERE doc_id % 50 <> 0),
       |cnt AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY 1),
       |hits AS (SELECT tr.doc_id, count(DISTINCT tr.s) AS n_shared,
       |           count(DISTINCT ev.eval_id) AS n_eval_docs
       |         FROM tr JOIN ev USING (s) GROUP BY 1)
       |SELECT h.doc_id AS train_id, CAST(n_shared AS BIGINT) AS n_shared,
       | CAST(n_eval_docs AS BIGINT) AS n_eval_docs, CAST(n_sh AS BIGINT) AS n_sh,
       | round(CAST(n_shared AS DOUBLE) / n_sh, 6) AS overlap
       |FROM hits h JOIN cnt c ON h.doc_id = c.doc_id
       |WHERE round(CAST(n_shared AS DOUBLE) / n_sh, 6) >= 0.05
       |ORDER BY train_id""".stripMargin) { (s, d) =>
    Dedup.decontaminate(Tables.documents(s, d),
        org.apache.spark.sql.functions.col("doc_id") % 50 === 0, minOverlap = 0.05)
      .orderBy("train_id")
  }

  // Symmetric int8 embedding quantization — the compression step that
  // makes a 100 TB float-embedding corpus a 25 TB int8 one (4× ANN
  // index shrink for ~1e-3 cosine loss). Per-vector scale = 127/max|x|;
  // rounding is spelled floor(x·scale + 0.5) on BOTH engines so no
  // library half-rounding convention can diverge. The Spark side runs
  // the reconstruction cosine through the native fused kernel
  // (graft_cosine); error stats are exact maxima, rounded only at the
  // output edge.
  val q131 = Q(
    "q131_embedding_quantize",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |          FROM embeddings WHERE vec_id < 100),
      |m AS (SELECT vec_id, emb,
      |        list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS maxabs
      |      FROM e),
      |s AS (SELECT vec_id, emb, 127.0 / maxabs AS scale FROM m WHERE maxabs > 0),
      |qt AS (SELECT vec_id, emb, scale,
      |         list_transform(emb, x -> CAST(floor(x * scale + 0.5) AS INTEGER)) AS q
      |       FROM s),
      |dq AS (SELECT vec_id, emb, q, list_transform(q, x -> x / scale) AS deq FROM qt)
      |SELECT vec_id,
      | CAST(list_aggregate(q, 'min') AS INTEGER) AS qmin,
      | CAST(list_aggregate(q, 'max') AS INTEGER) AS qmax,
      | round(list_dot_product(emb, deq)
      |   / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(deq, deq))), 6)
      |   AS cos_recon,
      | round(list_aggregate(list_transform(range(1, len(emb) + 1),
      |   i -> abs(emb[i] - deq[i])), 'max'), 6) AS max_abs_err
      |FROM dq
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d).filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("maxabs", expr("aggregate(emb, 0D, (a, x) -> greatest(a, abs(x)))"))
      .filter(col("maxabs") > 0)
      .withColumn("scale", lit(127.0) / col("maxabs"))
      .withColumn("q", expr("transform(emb, x -> cast(floor(x * scale + 0.5d) as int))"))
      .withColumn("deq", expr("transform(q, x -> x / scale)"))
      .select(col("vec_id"),
        expr("array_min(q)").as("qmin"), expr("array_max(q)").as("qmax"),
        round(graft.plans.NativeFunctions.cosineSim(col("emb"), col("deq")), 6)
          .as("cos_recon"),
        round(expr("aggregate(zip_with(emb, deq, (a, b) -> abs(a - b)), 0D, " +
          "(acc, x) -> greatest(acc, x))"), 6).as("max_abs_err"))
      .orderBy("vec_id")
  }

  // TF-IDF corpus weighting — the classic relevance/keyword-extraction
  // pass over a training corpus. Shape at 100 TB: tf is one shuffle on
  // (doc, term) with map-side combine; df re-aggregates the already-
  // distinct tf pairs on term (second shuffle, vocab-sized output); the
  // tf×df join shuffles on term (a broadcast would need the whole
  // vocabulary on every executor — wrong at web scale); the top-k window
  // shuffles back to doc. Both engines rank by the ROUNDED weight with a
  // term tie-break so ordering is decided on identical values.
  val q136 = Q(
    "q136_tfidf",
    s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
       |t AS (SELECT doc_id, unnest(w) AS term FROM d),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t WHERE term <> '' GROUP BY 1, 2),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |wt AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |         round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS weight
       |       FROM tf JOIN df USING (term) CROSS JOIN n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY weight DESC, term) AS rk FROM wt)
       |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       | weight, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // ONE documents scan: the persisted (doc_id, term, tf) table — the
    // materialization a real TF-IDF pipeline keeps anyway — feeds tf,
    // df AND the corpus doc count. explode_outer keeps a null-term row
    // per zero-term doc so n_docs counts EVERY document (the oracle's
    // count(*) FROM documents), not just docs with terms.
    val tf0 = docs
      .select(col("doc_id"),
        explode_outer(filter(Text.words(col("text")), t => t =!= "")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tf0.count()
    val tf = tf0.filter(col("term").isNotNull)
    val dfTerm = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = tf0.agg(countDistinct(col("doc_id")).as("n_docs"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("weight").desc, col("term"))
    tf.join(dfTerm, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("weight",
        round(col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("weight"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  // Distribution drift between dataset splits — the QA step after
  // splitting/mixing: are train/val/test language distributions
  // exchangeable? Laplace-smoothed per-split language probabilities
  // (exact integers until the final division), then KL(a‖b), KL(b‖a)
  // and Jensen–Shannon divergence as ONE formula string evaluated
  // verbatim by both engines (fixed-order 6-term sums — no float
  // reassociation between engines). Scale: a single conditional-sum
  // shuffle on split (3 rows out); the pair join is 3×3.
  private val driftLangs: Seq[String] = Text.stopwords.map(_._1) :+ "und"
  private def driftKl(p: String, q: String): String =
    driftLangs.map(l => s"${p}_$l * ln(${p}_$l / ${q}_$l)").mkString(" + ")
  private def driftJsd: String = {
    val ha = driftLangs.map(l => s"a_$l * ln(2.0 * a_$l / (a_$l + b_$l))").mkString(" + ")
    val hb = driftLangs.map(l => s"b_$l * ln(2.0 * b_$l / (a_$l + b_$l))").mkString(" + ")
    s"0.5 * ($ha) + 0.5 * ($hb)"
  }

  val q137 = Q(
    "q137_split_drift",
    s"""WITH hits AS (
       |  SELECT doc_id,
       |${Text.stopwords.map { case (lang, ws) =>
          s"   CAST(len(list_filter(w, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS INTEGER) AS h_$lang"
        }.mkString(",\n")},
       |   CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS b
       |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
       |lab AS (SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
       |               CASE $langCases ELSE 'und' END AS lang FROM hits),
       |cnt AS (SELECT split,
       |${driftLangs.map(l => s"  sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS c_$l").mkString(",\n")},
       |  count(*) AS c_tot FROM lab GROUP BY split),
       |p AS (SELECT split,
       |${driftLangs.map(l => s"  (c_$l + 1.0) / (c_tot + ${driftLangs.size}.0) AS p_$l").mkString(",\n")}
       |  FROM cnt),
       |pa AS (SELECT split AS split_a, ${driftLangs.map(l => s"p_$l AS a_$l").mkString(", ")} FROM p),
       |pb AS (SELECT split AS split_b, ${driftLangs.map(l => s"p_$l AS b_$l").mkString(", ")} FROM p)
       |SELECT split_a, split_b,
       | round(${driftKl("a", "b")}, 6) AS kl_ab,
       | round(${driftKl("b", "a")}, 6) AS kl_ba,
       | round($driftJsd, 6) AS jsd
       |FROM pa JOIN pb ON split_a < split_b
       |ORDER BY split_a, split_b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val hits = docs
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(Seq(col("doc_id")) ++
        Text.stopwords.map { case (lang, ws) => Text.vocabHits("w", ws).as(s"h_$lang") } :+
        (conv(substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long") % 100).as("b"): _*)
    val lab = hits.select(
      when(col("b") < 90, "train").when(col("b") < 95, "val").otherwise("test").as("split"),
      expr(s"CASE $langCases ELSE 'und' END").as("lang"))
    val cnt = lab.groupBy("split")
      .agg(driftLangs.map(l => sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"c_$l")).head,
        driftLangs.map(l => sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"c_$l")).tail :+
          count(lit(1)).as("c_tot"): _*)
    val p = cnt.select(col("split") +:
      driftLangs.map(l => ((col(s"c_$l") + lit(1.0)) / (col("c_tot") + lit(driftLangs.size.toDouble))).as(s"p_$l")): _*)
    val pa = p.select(col("split").as("split_a") +: driftLangs.map(l => col(s"p_$l").as(s"a_$l")): _*)
    val pb = p.select(col("split").as("split_b") +: driftLangs.map(l => col(s"p_$l").as(s"b_$l")): _*)
    pa.join(pb, col("split_a") < col("split_b"))
      .select(col("split_a"), col("split_b"),
        round(expr(driftKl("a", "b")), 6).as("kl_ab"),
        round(expr(driftKl("b", "a")), 6).as("kl_ba"),
        round(expr(driftJsd), 6).as("jsd"))
      .orderBy("split_a", "split_b")
  }

  // Product-quantization ANN (Ann.pqKnn): vectors stored as m=32 4-bit
  // codes (32 subspaces × 16 centroids → 16 B/vector, a 16× shrink of
  // 64-dim float32), search via broadcast ADC lookup tables + an
  // equi-join on (sub, code) — the raw vectors are never scanned at
  // query time. Codebooks are float k-means averages → ADC distances
  // are not bit-replayable in DuckDB, but the planted-twin top-1 IS
  // codebook-independent: the twin's code in every subspace is by
  // construction argmin_c d²(q_sub, c), so its ADC distance is the
  // global minimum Σ_sub min_c d²(q_sub, c) — no other vector can beat
  // it, and a code-tie would need a near-identical vector (max natural
  // cosine ≤ 0.5 near the planted sources). AnnSpec holds recall ≥40%
  // vs exact L2 for the accuracy claim.
  // trainMod = 4: codebooks train on the deterministic 1/4 hash band
  // (the FAISS sample-training practice — at 100 TB the Lloyd rounds
  // are sample-sized; encoding still covers every vector). The
  // planted-twin oracle is codebook-independent, and AnnSpec holds
  // recall parity of sampled vs full training.
  val q138 = Q("q138_pq_ann", annTop1Oracle("")) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    annTop1Summary(
      Ann.pqKnn(embs, annPlantQueries(embs), k = 5, m = 32, ksub = 16, trainMod = 4),
      simCol = None, k = 5)
  }

  // The ROTATED PQ face (r12; the OPQ-style anisotropy fix — Ge et al.
  // CVPR 2013, measured in AnisoProbe/BENCHNOTES r12: a skewed
  // eigenspectrum starves consecutive-dim subquantizers, recall@5
  // 0.41→0.31 unrotated vs 0.60 rotated on the sf1 aniso set): corpus
  // AND queries pass through the seeded orthonormal rotation
  // (graft_matvec, one codegen'd dim×dim multiply per vector) before
  // the subvector split. Orthonormality preserves ALL pairwise
  // geometry, so q138's planted-twin oracle carries over verbatim —
  // the twin is still an exact copy in rotated space and must rank
  // top-1 regardless of codebook float details.
  val q188 = Q("q188_pq_ann_rotated", annTop1Oracle("")) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    annTop1Summary(
      Ann.pqKnn(Ann.rotateEmbeddings(embs),
        Ann.rotateEmbeddings(annPlantQueries(embs)),
        k = 5, m = 32, ksub = 16, trainMod = 4),
      simCol = None, k = 5)
  }

  // BM25 document scoring (Robertson–Spärck Jones; k1=1.2, b=0.75)
  // against a literal query-term set — the retrieval-quality ranker a
  // training pipeline uses for targeted corpus selection. Only rows for
  // the ≤3 query terms survive the first filter (pushed to the scan),
  // so every downstream shuffle is query-sized, not corpus-sized; df
  // and avgdl are scalar/broadcast. The per-(doc,term) contribution is
  // one formula string shared verbatim by both engines; ranking is on
  // the ROUNDED score with a doc_id tie-break.
  val q140 = {
    val terms = Seq("hash", "join", "vector")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val contrib = "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 " +
      "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    Q(
      "q140_bm25",
      s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
         |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM d),
         |ad AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
         |t AS (SELECT doc_id, unnest(w) AS term FROM d),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
         |       WHERE term IN ($termList) GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id, round(sum($contrib), 6) AS score,
         |         CAST(count(*) AS BIGINT) AS n_terms
         |       FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN ad
         |       GROUP BY 1),
         |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc)
         |SELECT doc_id, score, n_terms, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 10
         |ORDER BY rank""".stripMargin) { (s, d) =>
      // ONE documents scan (operators/Retrieval.bm25Scored): a thin
      // persisted projection — per doc, its length and ONLY the query's
      // terms (the match-list a posting intersection produces) — feeds
      // doc lengths, corpus stats, tf and df; top-10 FIRST via
      // orderBy+limit (TakeOrderedAndProject), THEN the rank window
      // over the ≤10 survivors.
      graft.operators.Retrieval.bm25(Tables.documents(s, d), terms, k = 10)
    }
  }

  // Event debounce / thinning: keep only the EARLIEST event per
  // (user, type, 5-minute tumbling bucket) and count what was
  // suppressed — the rate-limiting pass in front of a feature or
  // ingestion pipeline (sensor chatter, double-clicks, retry storms).
  // One shuffle on the composite key; min(struct(ts, event_id, value))
  // picks the kept row atomically (ties broken by event_id). The
  // streaming face is the same plan over dropDuplicates under a
  // watermark — StreamingSpec asserts stream == batch.
  val q141 = Q(
    "q141_event_debounce",
    """WITH b AS (SELECT user_id, event_type,
      |  make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS bucket,
      |  ts, event_id FROM events),
      |m AS (SELECT *, min(ts) OVER (PARTITION BY user_id, event_type, bucket) AS mts FROM b),
      |k AS (SELECT user_id, event_type, bucket,
      |        min(ts) AS first_ts,
      |        min(event_id) FILTER (WHERE ts = mts) AS kept_id,
      |        CAST(count(*) AS BIGINT) - 1 AS n_suppressed
      |      FROM m GROUP BY 1, 2, 3)
      |SELECT user_id, event_type, bucket, first_ts, kept_id, n_suppressed
      |FROM k
      |ORDER BY user_id, event_type, bucket""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("bucket", window(col("ts"), "5 minutes").getField("start"))
      .groupBy("user_id", "event_type", "bucket")
      .agg(min(struct(col("ts"), col("event_id"))).as("first"),
        (count(lit(1)) - 1).as("n_suppressed"))
      .select(col("user_id"), col("event_type"), col("bucket"),
        col("first.ts").as("first_ts"), col("first.event_id").as("kept_id"),
        col("n_suppressed"))
      .orderBy("user_id", "event_type", "bucket")
  }

  // IVF-PQ composed index (Ann.ivfPqKnn, the FAISS-default posture):
  // coarse cells route the search, PQ codes over cell residuals carry
  // it — cell id + m codes per vector, nprobe/c of the index touched
  // per query, raw vectors never read at query time. Planted-twin
  // oracle (see q87/q138): the twin shares the query's argmax coarse
  // cell (always probed) and its residual equals the query's residual
  // there, so its codes are the query-optimal codes → minimal ADC
  // within the probe set; empirically rank-1 at all three SFs with a
  // wide margin (nearest natural neighbor cosine ≤ 0.5). AnnSpec holds
  // recall vs exact L2.
  // trainMod = 4 as in q138: both the coarse quantizer and the residual
  // PQ codebooks train on the 1/4 hash band; assignment + encoding
  // still cover every vector.
  val q142 = Q("q142_ivfpq_ann", annTop1Oracle("")) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    annTop1Summary(Ann.ivfPqKnn(embs, annPlantQueries(embs), k = 5, trainMod = 4),
      simCol = None, k = 5)
  }

  // ---- q145: per-domain quota sampling (graft.operators.Quota) -----------
  // The C4-style "≤ k pages per domain" cap. Deterministic salted-hash
  // rank; the count-broadcast prefilter (map-side, margin·k expected
  // survivors per domain) is part of the replayed contract — see
  // Quota.perDomain's scale notes. k=7 < 25 docs/source here, so the
  // quota actually bites on every domain.
  val q145 = Q(
    "q145_domain_quota",
    """WITH r AS (SELECT doc_id, source,
      |  CAST(('0x' || substr(md5('quota|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rk
      | FROM documents),
      |c AS (SELECT source, count(*) AS domain_n FROM r GROUP BY 1),
      |s AS (SELECT r.*, c.domain_n FROM r JOIN c USING (source)
      |      WHERE rk < CASE WHEN domain_n <= 56 THEN 1152921504606846976
      |                      ELSE (1152921504606846976 // domain_n) * 56 END),
      |w AS (SELECT doc_id, source, domain_n,
      |        row_number() OVER (PARTITION BY source ORDER BY rk, doc_id) AS qrank
      |      FROM s)
      |SELECT doc_id, source, CAST(domain_n AS BIGINT) AS domain_n,
      |       CAST(qrank AS INTEGER) AS qrank
      |FROM w WHERE qrank <= 7
      |ORDER BY source, qrank""".stripMargin) { (s, d) =>
    graft.operators.Quota.perDomain(
      Tables.documents(s, d).select(col("doc_id"), col("source")),
      "source", "doc_id", k = 7, margin = 8)
      .select(col("doc_id"), col("source"), col("domain_n"),
        col("qrank").cast("int").as("qrank"))
      .orderBy("source", "qrank")
  }

  // ---- q152: training-mix construction (capstone composition) ------------
  // The "data mixing" op: hit per-language TARGET token shares from an
  // arbitrary corpus distribution. Chains the pipeline primitives:
  // token counting (q68's tokenizer) → per-stratum availability (one
  // count shuffle, stratum-cardinality-sized, broadcast back) →
  // per-stratum keep rate min(1, target·budget/available) in exact
  // integer arithmetic (rate compare in the q145 threshold form — no
  // float at the boundary) → deterministic hash sample (q127's
  // content-independent md5 draw) → achieved-mix report. Map-side
  // sampling: the only shuffles are stratum-sized aggregations, so the
  // plan is corpus-scan-bound at 100 TB.
  //
  // Targets (tokens, of a 30k budget): en 40%, zh 25%, de 20%, es 10%,
  // fr 5% — deliberately NOT the corpus's own distribution (en is
  // under-sampled, zh over-demanded past availability → rate caps at 1).
  val q152 = Q(
    "q152_corpus_mix",
    """WITH d AS (SELECT doc_id, lang,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS toks,
      |  CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      | FROM documents),
      |t AS (SELECT lang,
      |  CASE lang WHEN 'en' THEN 40 WHEN 'zh' THEN 25 WHEN 'de' THEN 20
      |            WHEN 'es' THEN 10 ELSE 5 END AS share_pct
      | FROM (SELECT DISTINCT lang FROM d)),
      |a AS (SELECT d.lang, share_pct, sum(toks) AS avail,
      |        CAST(30000 AS BIGINT) * share_pct // 100 AS want
      | FROM d JOIN t ON d.lang = t.lang GROUP BY d.lang, share_pct),
      |s AS (SELECT d.doc_id, d.lang, d.toks, a.want, a.avail
      | FROM d JOIN a ON d.lang = a.lang
      | WHERE a.want >= a.avail OR d.h < (1152921504606846976 // a.avail) * a.want)
      |SELECT lang,
      | CAST(count(*) AS BIGINT) AS docs_kept,
      | CAST(sum(toks) AS BIGINT) AS tokens_kept,
      | CAST(max(want) AS BIGINT) AS tokens_wanted,
      | CAST(max(avail) AS BIGINT) AS tokens_available
      |FROM s
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    // selection faces live in operators/Mix.scala since the q190
    // composition; this oracle gates them round over round
    graft.operators.Mix.report(Tables.documents(s, d), budgetTokens = 30000L)
      .orderBy("lang")
  }

  // ---- q155: dedup threshold calibration (learned-threshold dedup) -------
  // The tuning pass in front of q62: at 100 TB the EXACT Jaccard (q61)
  // is computable only on a calibration sample, while the minhash
  // estimate is what the production pipeline filters on — so the
  // operator learns WHICH estimate threshold to deploy by sweeping a
  // grid against exact ground truth on the sample and reporting
  // precision/recall/F1 per threshold (argmax flagged). Ground truth =
  // exact Jaccard ≥ 0.5 among pairs ≥ 0.3 (hard negatives included);
  // candidates at a deliberately low 0.25 estimate floor so both sides
  // of every grid point are populated; an LSH-missed true pair (est
  // NULL → -1) counts against recall at EVERY threshold — banding
  // recall loss is part of what the calibration measures. All
  // comparisons in integer micro-units (round(j*1e6)): the grid
  // boundary can never be decided by float representation drift.
  // Scale: both inputs are the bounded candidate/pair tables (bucket
  // joins, df/band caps); the sweep is a 13× explode of those pairs
  // with one aggregation shuffle — calibration-sample-sized, never
  // corpus-sized.
  // calibration sample (r13): the exact-Jaccard truth join is
  // O(sample²)-shaped, so it runs on a deterministic md5 hash-bucket
  // sample of doc_id (192/256 = 75% here; a deployment tunes this down
  // hard) — the q27 tablesample discipline, replayed by the oracle.
  // Candidates are NOT resampled: the sweep filters the DEPLOYED
  // candidate table to sample-sample pairs, so calibration measures the
  // exact candidate stream the learned threshold will gate.
  private val CalibSampleHex = "c0" // 192/256, = Dedup default
  private def inSampleSql(c: String): String =
    s"substr(md5(CAST($c AS VARCHAR)), 1, 2) < '$CalibSampleHex'"

  // exact-Jaccard ground truth for calibration (shared by q155/q189):
  // pairs ≥ 0.3 with micro-unit jaccard, over the calibration sample
  private val calibTruthSql =
    s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents
         |       WHERE ${inSampleSql("doc_id")}),
         |shd AS (SELECT DISTINCT doc_id, s
         |        FROM (SELECT doc_id, unnest($SHINGLES) AS s FROM d)),
         |ok AS (SELECT s FROM shd GROUP BY s HAVING count(*) <= 50),
         |shf AS (SELECT shd.doc_id, shd.s FROM shd JOIN ok USING (s)),
         |cnt AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
         |jp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |       FROM shf a JOIN shf b USING (s)
         |       WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         | CAST(round(round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) * 1000000) AS BIGINT) AS exact_m
         |FROM jp JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
         |WHERE round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) >= 0.3""".stripMargin

  val q155 = Q(
      "q155_dedup_threshold_calibration",
      s"""WITH truth AS (SELECT * FROM ($calibTruthSql)),
         |cands AS (SELECT doc_a, doc_b, CAST(round(est_jaccard * 1000000) AS BIGINT) AS est_m
         |          FROM (${minhashPairsSql("0.25")})
         |          WHERE ${inSampleSql("doc_a")} AND ${inSampleSql("doc_b")}),
         |p AS (SELECT coalesce(t.exact_m, 0) AS exact_m, coalesce(c.est_m, -1) AS est_m
         |      FROM truth t FULL OUTER JOIN cands c USING (doc_a, doc_b)),
         |sweep AS (SELECT i,
         |   CAST(sum(CASE WHEN exact_m >= 500000 AND est_m >= i * 50000 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |   CAST(sum(CASE WHEN exact_m <  500000 AND est_m >= i * 50000 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |   CAST(sum(CASE WHEN exact_m >= 500000 AND est_m <  i * 50000 THEN 1 ELSE 0 END) AS BIGINT) AS fn
         | FROM p, (SELECT unnest(range(6, 19)) AS i) g GROUP BY 1),
         |stats AS (SELECT round(i / 20.0, 2) AS threshold, tp, fp, fn,
         |   CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
         |   CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
         |   CASE WHEN 2 * tp + fp + fn > 0 THEN round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1
         | FROM sweep)
         |SELECT threshold, tp, fp, fn, precision, recall, f1,
         | coalesce(f1, -1.0) = max(coalesce(f1, -1.0)) OVER () AS best_f1
         |FROM stats
         |ORDER BY threshold""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      // the whole sampled construction is shared with
      // Dedup.learnedThresholdPairs (q189) and learnThreshold — one
      // definition of the sample predicate, the grid, and the
      // micro-unit arithmetic, so the learned threshold can never
      // desynchronize from this report. The sweep stays LAZY here (no
      // release): a calibration report's caller holds the session and
      // may re-aggregate (BENCHNOTES r12's documented asymmetry).
      val (_, _, sweep) = Dedup.sampledCalibration(docs)
      sweep
        .withColumn("threshold", round(col("i") / 20.0, 2))
        .withColumn("precision", when(col("tp") + col("fp") > 0,
          round(col("tp") / (col("tp") + col("fp")).cast("double"), 6)))
        .withColumn("recall", when(col("tp") + col("fn") > 0,
          round(col("tp") / (col("tp") + col("fn")).cast("double"), 6)))
        .withColumn("f1", when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          round(lit(2.0) * col("tp") / (lit(2) * col("tp") + col("fp") + col("fn")).cast("double"), 6)))
        .withColumn("best_f1",
          coalesce(col("f1"), lit(-1.0)) ===
            max(coalesce(col("f1"), lit(-1.0))).over(Window.partitionBy()))
        .select(col("threshold"), col("tp"), col("fp"), col("fn"),
          col("precision"), col("recall"), col("f1"), col("best_f1"))
        .orderBy("threshold")
    }

  // ---- q189: learned-threshold dedup (calibrate → deploy) ----------------
  // The composition SURVEY §7 named as remaining depth: q155 LEARNS the
  // minhash threshold (argmax F1 against exact ground truth, lowest
  // threshold on a tie), and this query DEPLOYS it — the candidate
  // table is built once (persisted) and serves both the calibration
  // sweep and the final filter; the argmax itself is a 13-row driver
  // decision in the oracle's exact micro-unit arithmetic. The oracle
  // replays the whole composition: sweep → best i → filtered pairs.
  val q189 = Q(
    "q189_learned_threshold_dedup",
    s"""WITH truth AS (SELECT * FROM ($calibTruthSql)),
       |cands AS (SELECT doc_a, doc_b, est_jaccard,
       |            CAST(round(est_jaccard * 1000000) AS BIGINT) AS est_m
       |          FROM (${minhashPairsSql("0.25")})),
       |sc AS (SELECT * FROM cands
       |       WHERE ${inSampleSql("doc_a")} AND ${inSampleSql("doc_b")}),
       |p AS (SELECT coalesce(t.exact_m, 0) AS exact_m, coalesce(c.est_m, -1) AS est_m
       |      FROM truth t FULL OUTER JOIN sc c USING (doc_a, doc_b)),
       |sweep AS (SELECT i,
       |   CAST(sum(CASE WHEN exact_m >= 500000 AND est_m >= i * 50000 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |   CAST(sum(CASE WHEN exact_m <  500000 AND est_m >= i * 50000 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |   CAST(sum(CASE WHEN exact_m >= 500000 AND est_m <  i * 50000 THEN 1 ELSE 0 END) AS BIGINT) AS fn
       | FROM p, (SELECT unnest(range(6, 19)) AS i) g GROUP BY 1),
       |stats AS (SELECT i,
       |   CASE WHEN 2 * tp + fp + fn > 0 THEN round(2.0 * tp / (2 * tp + fp + fn), 6) ELSE -1.0 END AS f1
       | FROM sweep),
       |best AS (SELECT min(i) AS bi FROM stats
       |         WHERE f1 = (SELECT max(f1) FROM stats))
       |SELECT round(bi / 20.0, 2) AS threshold, doc_a, doc_b, est_jaccard
       |FROM cands, best WHERE est_m >= bi * 50000
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    graft.operators.Dedup.learnedThresholdPairs(Tables.documents(s, d))
      .orderBy("doc_a", "doc_b")
  }

  // ---- q161: winnowing duplicated-span detection (MOSS) ------------------
  // Schleimer/Wilkerson/Aiken SIGMOD 2003: alignment-robust span dedup —
  // any shared substring of ≥ w+k−1 tokens is guaranteed detected, at
  // ~2/(w+1) fingerprint density. The case q60/q62 (whole-doc) and q119
  // (fixed segments) structurally miss: duplicated text at DIFFERENT
  // offsets inside otherwise-distinct documents. See operators/Winnow.
  // winnowing constants shared by q161/q162 (mirror operators/Winnow defaults)
  private val WinK = 5; private val WinW = 8
  private val WinMaxDf = 50; private val WinShift = 1073741824L // 2^30

  // DuckDB replay of Winnow.fingerprints + the df cap: CTE prefix ending
  // in `fpf(doc_id, pos, fh, gram)` — the verified fingerprint table both
  // span queries join on.
  private val winnowFpSql: String = {
    val K = WinK; val W = WinW; val MaxDf = WinMaxDf; val Shift = WinShift
    val gramK = (0 until K).map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
    val gramsK =
      s"list_transform(range(1, greatest(len(w) - ${K - 1}, 0) + 1), i -> $gramK)"
    s"""d AS (SELECT doc_id, $WORDS AS w FROM documents),
       |g AS (SELECT doc_id, w, $gramsK AS grams FROM d),
       |h AS (SELECT doc_id, w, list_transform(grams, x -> $H0P) AS hs FROM g),
       |c AS (SELECT doc_id, w,
       |        list_transform(range(len(hs)), p -> hs[p+1] * $Shift + p) AS comb FROM h),
       |s AS (SELECT doc_id, w,
       |        CASE WHEN len(comb) >= $W
       |             THEN list_distinct(list_transform(range(len(comb) - $W + 1),
       |                    i -> list_min(comb[i+1:i+$W])))
       |             ELSE [] END AS sel FROM c),
       |fp AS (SELECT doc_id, c % $Shift AS pos, c // $Shift AS fh,
       |         array_to_string(w[(c % $Shift) + 1 : (c % $Shift) + $K], ' ') AS gram
       |       FROM (SELECT doc_id, w, unnest(sel) AS c FROM s)),
       |ok AS (SELECT fh FROM fp GROUP BY fh HAVING count(DISTINCT doc_id) <= $MaxDf),
       |fpf AS (SELECT fp.* FROM fp JOIN ok USING (fh))""".stripMargin
  }

  // Shared extents chain over fpf — diagonal grouping + gap segmentation,
  // consumed by both q162 (reporting) and q191 (excision): ONE definition,
  // the winnowFpSql discipline, so the two oracles cannot drift.
  private val winnowSegsSql: String =
    s"""shared AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |             a.pos AS pa, b.pos AS pb, a.pos - b.pos AS diag
       |           FROM fpf a JOIN fpf b
       |             ON a.fh = b.fh AND a.gram = b.gram AND a.doc_id < b.doc_id),
       |gp AS (SELECT *, pa - lag(pa) OVER
       |         (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS gap FROM shared),
       |brks AS (SELECT *, CASE WHEN gap IS NULL OR gap > $WinW THEN 1 ELSE 0 END AS brk FROM gp),
       |segs AS (SELECT *, sum(brk) OVER
       |           (PARTITION BY doc_a, doc_b, diag ORDER BY pa
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM brks)""".stripMargin

  val q161 =
    Q(
      "q161_winnow_spans",
      s"""WITH $winnowFpSql,
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |            CAST(count(DISTINCT a.gram) AS BIGINT) AS n_spans,
         |            min(a.pos) AS pos_a, min(b.pos) AS pos_b
         |          FROM fpf a JOIN fpf b
         |            ON a.fh = b.fh AND a.gram = b.gram AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_spans, pos_a, pos_b
         |FROM pairs ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      Winnow.spanPairs(Tables.documents(s, d), k = WinK, w = WinW, maxDf = WinMaxDf)
        .orderBy("doc_a", "doc_b")
    }

  // ---- q162: duplicated-span EXTENTS (the excision view) -----------------
  // q161 says WHICH pairs share text; q162 says WHERE — shared verified
  // fingerprints grouped per pair by alignment diagonal (pos_a − pos_b:
  // constant across a shared region) and split into contiguous segments
  // where consecutive positions gap by more than w (inside one shared
  // region winnowing bounds the gap by w). Token extents [start, end]
  // inclusive, end = last fingerprint + k − 1 — the intervals a training
  // pipeline cuts. Resolution: regions on one diagonal closer than ~w
  // tokens merge.
  val q162 =
    Q(
      "q162_winnow_extents",
      s"""WITH $winnowFpSql,
         |$winnowSegsSql
         |SELECT doc_a, doc_b,
         |  min(pa) AS start_a, max(pa) + ${WinK - 1} AS end_a,
         |  min(pb) AS start_b, max(pb) + ${WinK - 1} AS end_b,
         |  CAST(count(*) AS BIGINT) AS n_fp
         |FROM segs GROUP BY doc_a, doc_b, diag, seg
         |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin) { (s, d) =>
      Winnow.spanExtents(Tables.documents(s, d), k = WinK, w = WinW, maxDf = WinMaxDf)
        .orderBy("doc_a", "doc_b", "start_a", "start_b")
    }

  // ---- q163: sequence packing (global token offsets) ---------------------
  // The pretraining "concat corpus, cut every seq_len" step: each doc's
  // global token offset via the two-phase distributed prefix sum
  // (operators/Pack — range partitions + parallel intra-partition windows
  // + partition-count-sized prefix broadcast; NEVER a corpus-sized
  // un-partitioned window), then bin/offset/bins_spanned arithmetic.
  val q163 = {
    val L = 512
    Q(
      "q163_sequence_packing",
      s"""WITH d AS (SELECT doc_id, CAST(len($WORDS) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS global_start
         |      FROM d)
         |SELECT doc_id, n_tokens, global_start,
         |  global_start // $L AS bin, global_start % $L AS "offset",
         |  (global_start + n_tokens - 1) // $L - global_start // $L + 1 AS bins_spanned
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.Pack.packSequences(Tables.documents(s, d), seqLen = L)
        .orderBy("doc_id")
    }
  }

  // ---- q164: weighted corpus sampling (Efraimidis–Spirakis) --------------
  // Quality/length-WEIGHTED subsampling — the importance-sampling step
  // between q127 (unweighted strata), q145 (caps), q152 (mix targets):
  // keep k docs with inclusion probability ∝ weight. E–S priority
  // key = u^(1/w) with u the salted-hash uniform (q145's md5-60 rank
  // discipline), global top-k by key — Spark executes orderBy+limit as
  // per-partition top-k + merge (TakeOrderedAndProject), never a global
  // sort. Key rounded to 9dp with doc_id tie-break: near-ties become
  // EXACT ties resolved deterministically, so cross-engine libm ULP
  // differences cannot flip the selection (q61/q71 rounding precedent).
  val q164 = {
    val K = 1000
    Q(
      "q164_weighted_sample",
      s"""WITH d AS (SELECT doc_id, CAST(len($WORDS) AS BIGINT) AS n_words FROM documents),
         |r AS (SELECT doc_id, n_words, least(n_words, 500) AS w,
         |        CAST(('0x' || substr(md5('wsample|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rnk
         |      FROM d),
         |k AS (SELECT doc_id, n_words, w,
         |        round(pow((CAST(rnk AS DOUBLE) + 1.0) / 1152921504606846976.0,
         |              CAST(1.0 AS DOUBLE) / CAST(w AS DOUBLE)), 9) AS skey
         |      FROM r)
         |SELECT doc_id, n_words, w, skey
         |FROM (SELECT * FROM k ORDER BY skey DESC, doc_id LIMIT $K)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.WeightedSample
        .topK(Tables.documents(s, d), k = K, maxWeight = 500L)
        .orderBy("doc_id")
    }
  }

  // ---- q165: corpus-statistical LM quality filter (CCNet-style) ----------
  // Per-doc mean unigram log-prob under a model trained on the corpus
  // itself (operators/LmScore) — the model-based counterpart to q67's
  // heuristics. V=16 against the synthetic corpus's 31-term vocabulary
  // so model selection AND the OOV path are both exercised; each model
  // term's ln(p) is quantized ONCE to integer micro-units, so all
  // per-doc arithmetic is exact int64 (no float accumulation to
  // replay). Threshold −7.0 keeps ~84% at sf0.01 (both classes
  // populated).
  val q165 = {
    val V = 16; val Thresh = -7.0
    Q(
      "q165_lm_quality",
      s"""WITH d AS (SELECT doc_id, coalesce(list_filter($WORDS, x -> x <> ''), []) AS w FROM documents),
         |dd AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens FROM d),
         |toks AS (SELECT unnest(w) AS term FROM dd),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM toks),
         |cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
         |model AS (SELECT term, CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(nn + ${V + 1} AS DOUBLE)) * 1000000.0) AS BIGINT) AS lnp_micro
         |          FROM (SELECT * FROM cnt, tot ORDER BY c DESC, term LIMIT $V)),
         |oov AS (SELECT CAST(floor(ln(CAST(1 AS DOUBLE) / CAST(nn + ${V + 1} AS DOUBLE)) * 1000000.0) AS BIGINT) AS oov_micro FROM tot),
         |dt AS (SELECT doc_id, n_tokens, unnest(list_transform(list_distinct(w),
         |         t -> struct_pack(term := t, c_dt := CAST(len(list_filter(w, x -> x = t)) AS BIGINT)))) AS e
         |       FROM dd),
         |dt2 AS (SELECT doc_id, n_tokens, e.term AS term, e.c_dt AS c_dt FROM dt),
         |sc AS (SELECT doc_id,
         |         sum(CASE WHEN m.lnp_micro IS NULL THEN c_dt ELSE 0 END) AS oov_toks,
         |         sum(c_dt * coalesce(m.lnp_micro, (SELECT oov_micro FROM oov))) AS sum_micro
         |       FROM dt2 LEFT JOIN model m USING (term) GROUP BY 1)
         |SELECT dd.doc_id AS doc_id, dd.n_tokens AS n_tokens,
         |  CASE WHEN dd.n_tokens > 0
         |    THEN CAST((2 * oov_toks * 1000000 + dd.n_tokens) // (2 * dd.n_tokens) AS DOUBLE) / 1000000.0 END AS oov_frac,
         |  CASE WHEN dd.n_tokens > 0
         |    THEN CAST(-((2 * (-sum_micro) + dd.n_tokens) // (2 * dd.n_tokens)) AS DOUBLE) / 1000000.0 END AS avg_logp,
         |  CASE WHEN dd.n_tokens > 0
         |    THEN -((2 * (-sum_micro) + dd.n_tokens) // (2 * dd.n_tokens)) >= ${math.round(Thresh * 1000000)}
         |    ELSE false END AS keep
         |FROM dd LEFT JOIN sc USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.LmScore.score(Tables.documents(s, d), v = V, threshold = Thresh)
        .orderBy("doc_id")
    }
  }

  // ---- q175: DSIR importance selection (Xie et al. NeurIPS 2023) ---------
  // Target-by-example data selection: hashed unigram+bigram bag model,
  // importance weight = log p_target − log p_raw per bucket, quantized
  // once to integer micro-units (q165 discipline) so per-doc scores are
  // exact int64 on both engines. Target = the lang='en' subset; B=1024
  // buckets; top-50 selection (TakeOrderedAndProject). The oracle
  // replays the md5-60 bucket hash, the add-one smoothing, and the
  // quantized log ratios bit-for-bit.
  val q175 = {
    val B = 1024; val K = 50
    Q(
      "q175_dsir",
      s"""WITH d AS (SELECT doc_id, lang = 'en' AS is_target,
         |            coalesce(list_filter($WORDS, x -> x <> ''), []) AS w FROM documents),
         |f AS (SELECT doc_id, is_target, list_concat(w,
         |        list_transform(range(1, greatest(len(w) - 1, 0) + 1), i -> w[i] || ' ' || w[i+1])) AS feats
         |      FROM d),
         |occ AS (SELECT doc_id, is_target,
         |          unnest(list_transform(feats, x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) % $B)) AS bucket
         |        FROM f),
         |cnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rc,
         |          CAST(count(*) FILTER (WHERE is_target) AS BIGINT) AS tc
         |        FROM occ GROUP BY 1),
         |tot AS (SELECT CAST(sum(rc) AS BIGINT) AS rtot, CAST(sum(tc) AS BIGINT) AS ttot FROM cnt),
         |ratio AS (SELECT bucket,
         |    CAST(floor(ln(CAST(tc + 1 AS DOUBLE) / CAST(ttot + $B AS DOUBLE)) * 1000000.0) AS BIGINT)
         |  - CAST(floor(ln(CAST(rc + 1 AS DOUBLE) / CAST(rtot + $B AS DOUBLE)) * 1000000.0) AS BIGINT) AS ratio_micro
         |  FROM cnt, tot),
         |sc AS (SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |         CAST(sum(ratio.ratio_micro) AS BIGINT) AS score_micro
         |       FROM occ JOIN ratio USING (bucket) GROUP BY 1)
         |SELECT doc_id, n_feats, score_micro FROM sc
         |ORDER BY score_micro DESC, doc_id LIMIT $K""".stripMargin) { (s, d) =>
      graft.operators.Dsir.importanceTopK(
        Tables.documents(s, d), isTarget = col("lang") === "en", b = B, k = K)
    }
  }

  // ---- q176: SemDeDup semantic dedup (Abbas et al. 2023) -----------------
  // k-means cells bound the pair search; exact cosine verifies. FULL
  // oracle via planted twins (the q87 discipline): every vec_id % 10 = 3
  // vector gets an identical copy under id+100000 — identical floats
  // assign to the SAME cell deterministically, so the intra-cell join
  // must recover every twin pair at cosine exactly 1.0, independent of
  // the float k-means. Threshold 0.9 sits far above the corpus's
  // measured max NATURAL pair cosine (0.60 at sf0.1) while twins sit at
  // exactly 1.0 — margin on BOTH sides against a testdata regen
  // shifting the embedding distribution — so the result set is exactly
  // the twin set: missed twins (candidate collapse) AND phantom pairs
  // both fail the row hash. Cluster ids are float artifacts and not
  // exposed. The +100000 twin id space must be disjoint from the
  // natural ids — requirePlantHeadroom fails loudly if a regen grows
  // the corpus into it.
  val q176 = Q(
    "q176_semdedup",
    """SELECT vec_id AS va, vec_id + 100000 AS vb, CAST(1.0 AS DOUBLE) AS sim
      |FROM embeddings WHERE vec_id % 10 = 3 ORDER BY va""".stripMargin) { (s, d) =>
    val embs = requirePlantHeadroom(Tables.embeddings(s, d), 100000L)
    val twins = embs.filter(col("vec_id") % 10 === 3)
      .withColumn("vec_id", col("vec_id") + 100000L)
    graft.operators.SemDedup
      .dupPairs(embs.unionByName(twins), threshold = 0.9, c = 16, iters = 2,
        trainMod = 4)
      .orderBy("va")
  }

  // ---- q177: BPE pair statistics (Sennrich et al. ACL 2016) --------------
  // The tokenizer-training inner loop's distributed statistics pass:
  // overlapping adjacent-pair counts rank merge candidates (get_stats),
  // the non-overlapping replace-based count gives each candidate's
  // actual token reduction. After one corpus scan everything runs on
  // the VOCAB-sized word-frequency table — the property that makes BPE
  // training feasible at 100 TB.
  val q177 = Q(
    "q177_bpe_stats",
    s"""WITH d AS (SELECT doc_id, coalesce(list_filter($WORDS, x -> x <> ''), []) AS w FROM documents),
       |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |       FROM (SELECT unnest(w) AS word FROM d) GROUP BY 1),
       |p AS (SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, freq
       |      FROM wf, unnest(range(1, len(word))) AS t(i)
       |      WHERE len(word) >= 2),
       |top AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n_adjacent
       |        FROM p GROUP BY 1 ORDER BY n_adjacent DESC, pair LIMIT 20)
       |SELECT top.pair AS pair, top.n_adjacent AS n_adjacent,
       |  CAST(sum(freq * ((len(word) - len(replace(word, top.pair, ''))) // 2)) AS BIGINT) AS n_merge_apply
       |FROM top CROSS JOIN wf
       |GROUP BY 1, 2 ORDER BY n_adjacent DESC, pair""".stripMargin) { (s, d) =>
    graft.operators.Bpe.pairStats(Tables.documents(s, d), k = 20)
      .orderBy(col("n_adjacent").desc, col("pair"))
  }

  // ---- q178: hierarchical (two-level) IVF ANN ---------------------------
  // The 100 TB configuration of the IVF family: at c ≈ √n ≈ 10⁴–10⁵
  // cells the flat n·c assignment join dies; two-level routing costs
  // n·2√c (Ann.ivfFitHier/ivfEncodeHier/ivfSearchHier). Same
  // planted-twin FULL oracle as q87: the twin routes to the SAME
  // rank-1 super and child (tie-breaks aligned), so top-1 identity at
  // cosine 1.0 is invariant at any sf and any (cSuper, cChild) split.
  val q178 = Q("q178_hier_ivf_ann", annTop1Oracle(" CAST(1.0 AS DOUBLE) AS top1_sim")) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    annTop1Summary(
      Ann.ivfKnnHier(embs, annPlantQueries(embs), k = 5, cSuper = 8, cChild = 8,
        nprobeSuper = 2, nprobePerSuper = 2, trainMod = 4),
      simCol = Some("sim"), k = 5)
  }

  // ---- q179: multi-round BPE training loop (Sennrich, full loop) --------
  // q177 is one round's statistics; this is the actual training loop:
  // count pairs → pick top merge → re-tokenize the vocab → recount, for
  // k rounds. The oracle UNROLLS the same k rounds in SQL — DuckDB's
  // list_reduce over list_prepend('', syms) replays the '|'-delimited
  // left-to-right non-overlapping merge fold exactly (see
  // Bpe.trainMerges), so pair choice, overlapping counts, AND the
  // post-merge corpus token count are compared bit-for-bit per round.
  private val bpeRounds = 6
  // The unrolled k-round training CTE chain, shared by q179 (reads the
  // per-round merge records m$r) and q182 (reads the final vocab
  // v$bpeRounds — DuckDB inlines only referenced CTEs, the unused m$r
  // blocks cost nothing there).
  private def bpeOracleCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH d AS (SELECT coalesce(list_filter($WORDS, x -> x <> ''), []) AS w FROM documents),
              |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
              |       FROM (SELECT unnest(w) AS word FROM d)
              |       WHERE regexp_full_match(word, '[a-z0-9]+') GROUP BY 1),
              |v0 AS (SELECT word, list_transform(range(1, len(word) + 1), i -> substr(word, CAST(i AS INTEGER), 1)) AS syms, freq FROM wf)""".stripMargin
    for (r <- 1 to rounds) {
      val p = r - 1
      sb ++= s""",
                |p$r AS (SELECT syms[CAST(i AS INTEGER)] AS pa, syms[CAST(i AS INTEGER)+1] AS pb, freq
                |       FROM v$p, unnest(range(1, len(syms))) AS t(i) WHERE len(syms) >= 2),
                |t$r AS (SELECT pa, pb, CAST(sum(freq) AS BIGINT) AS cnt FROM p$r GROUP BY 1,2 ORDER BY cnt DESC, pa, pb LIMIT 1),
                |v$r AS (SELECT word, string_split(substr(list_reduce(list_prepend('', syms),
                |         (acc, s) -> CASE WHEN ends_with(acc, '|' || pa) AND s = pb THEN acc || s ELSE acc || '|' || s END), 2), '|') AS syms, freq
                |       FROM v$p CROSS JOIN t$r),
                |n$r AS (SELECT CAST(sum(len(syms) * freq) AS BIGINT) AS n_after FROM v$r),
                |m$r AS (SELECT $r AS round, pa AS pair_a, pb AS pair_b, cnt AS n_adjacent, n_after AS n_tokens_after FROM t$r, n$r)""".stripMargin
    }
    sb.toString
  }
  val q179 = Q(
    "q179_bpe_train",
    bpeOracleCtes(bpeRounds) +
      "\nSELECT CAST(round AS INTEGER) AS round, pair_a, pair_b, n_adjacent, n_tokens_after FROM (" +
      (1 to bpeRounds).map(r => s"SELECT * FROM m$r").mkString(" UNION ALL ") +
      ") ORDER BY round") { (s, d) =>
    // the BATCHED trainer is the deployment face (~batch× fewer driver
    // round trips); the oracle above replays the SERIAL loop, so this
    // gate also holds batched == serial every round
    graft.operators.Bpe.trainMergesBatched(Tables.documents(s, d),
      rounds = bpeRounds, batch = 3)
      .orderBy("round")
  }

  // ---- q180: cross-corpus semantic decontamination ----------------------
  // The embedding-space counterpart of q128's n-gram decontamination:
  // eval vectors probe the TRAINING corpus's persisted IVF index
  // (SemDedup.decontaminate — eval-sized encode + cluster equi-join,
  // never a training rescan). FULL oracle via planted twins (the q176
  // discipline): every vec_id % 10 = 7 training vector doubles as an
  // eval query under id + 10^6 — identical floats route to the same
  // cell, so the probe must flag exactly that training vector at
  // cosine 1.0 (natural pair cosines max 0.60, far under the 0.9
  // threshold on both sides). requirePlantHeadroom guards the offset.
  val q180 = Q(
    "q180_semantic_decontam",
    """SELECT CAST(vec_id + 1000000 AS BIGINT) AS eval_id, vec_id AS train_id,
      |  CAST(1.0 AS DOUBLE) AS sim
      |FROM embeddings WHERE vec_id % 10 = 7 ORDER BY eval_id""".stripMargin) { (s, d) =>
    val train = requirePlantHeadroom(Tables.embeddings(s, d), annPlant)
    val evalSet = train.filter(col("vec_id") % 10 === 7)
      .select((col("vec_id") + annPlant).as("vec_id"), col("embedding"))
    graft.operators.SemDedup
      .decontaminate(train, evalSet, threshold = 0.9, c = 16, iters = 2,
        trainMod = 4)
      .orderBy("eval_id")
  }

  // ---- q181: deterministic training-shard manifest -----------------------
  // The pipeline's OUTPUT stage: seeded-hash global shuffle (Knuth
  // multiplicative key — replayable on any engine, so re-runs and
  // resumed jobs lay out identically), dense packing via the q163
  // two-phase prefix sum, contiguous bin ranges per shard (sequential
  // trainer reads). Σ n_tokens over shards == corpus token count
  // exactly — the integrity check a writer validates against.
  val q181 = {
    val L = 512; val BPS = 16; val SEED = 42L
    val ST = BPS.toLong * L
    Q(
      "q181_shard_manifest",
      s"""WITH d AS (SELECT doc_id, CAST(len($WORDS) AS BIGINT) AS n_tokens,
         |            ((doc_id % 2147483647) * 2654435761 + $SEED) % 2147483647 AS h
         |          FROM documents),
         |c AS (SELECT doc_id, n_tokens, h,
         |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gs
         |      FROM d),
         |e AS (SELECT doc_id, gs, n_tokens, gs // $ST AS first_shard,
         |        (gs + n_tokens - 1) // $ST AS last_shard FROM c),
         |x AS (SELECT e.*, CAST(s AS BIGINT) AS shard_id
         |      FROM e, unnest(range(first_shard, last_shard + 1)) AS t(s))
         |SELECT shard_id,
         |  CAST(sum(CASE WHEN first_shard = shard_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_starting,
         |  CAST(count(*) AS BIGINT) AS n_docs_touching,
         |  CAST(sum(least(gs + n_tokens, (shard_id + 1) * $ST) - greatest(gs, shard_id * $ST)) AS BIGINT) AS n_tokens,
         |  shard_id * $BPS AS first_bin,
         |  least(max((gs + n_tokens - 1) // $L), (shard_id + 1) * $BPS - 1) AS last_bin
         |FROM x GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, d) =>
      graft.operators.Pack
        .shardManifest(Tables.documents(s, d), seqLen = L, binsPerShard = BPS,
          seed = SEED)
        .orderBy("shard_id")
    }
  }

  // ---- q182: BPE application (tokenize with trained merges) --------------
  // Closes the tokenizer loop: q179 trains the merge list, this applies
  // it — merges fold over the DISTINCT-word table (M chained vocab-sized
  // projections, one stage), then one hash aggregation ranks the
  // resulting subword tokens. The oracle reuses q179's unrolled training
  // CTEs and reads the final vocab v6, so merge choice AND application
  // are compared end-to-end against the serial DuckDB replay.
  private val bpeTopTokens = 30
  val q182 = Q(
    "q182_bpe_encode",
    bpeOracleCtes(bpeRounds) +
      s"""
         |SELECT token, CAST(sum(freq) AS BIGINT) AS freq
         |FROM (SELECT unnest(syms) AS token, freq FROM v$bpeRounds)
         |GROUP BY 1 ORDER BY freq DESC, token LIMIT $bpeTopTokens""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // ONE corpus words pass: training and encoding both read this
    // materialized (word, freq) table (r17 opt)
    val wf = graft.operators.Bpe.wordFreq(docs).localCheckpoint(true)
    val merges = graft.operators.Bpe
      .trainMergesBatchedWf(wf, rounds = bpeRounds, batch = 3)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // the oracle unrolls EXACTLY bpeRounds rounds; a corpus too small
    // to sustain them (trainMerges exhausts early) would silently
    // diverge — its t_r CTE goes empty and the cross join annihilates
    // the oracle vocab while Spark applies fewer merges. Fail loudly.
    require(merges.length == bpeRounds,
      s"BPE training exhausted after ${merges.length}/$bpeRounds rounds — " +
        "corpus too small for the unrolled oracle; lower bpeRounds")
    graft.operators.Bpe.encodeTokensWf(wf, merges, k = bpeTopTokens)
      .orderBy(col("freq").desc, col("token"))
  }

  // ---- q187: combined decontamination (n-gram + semantic, provenance) ----
  // The published pre-training recipes run BOTH hygiene passes (GPT-3
  // appendix C's 13-gram overlap scrub; semantic probes for paraphrased
  // leaks): q128's n-gram branch and q180's semantic branch against the
  // same corpus, flag sets full-outer-merged per training doc with
  // per-branch provenance. Both branches keep their exact replays — the
  // n-gram CTE chain is q128's, the semantic side is the planted-twin
  // discipline (vec_id % 10 = 7 twins at +10^6, cosine exactly 1.0,
  // natural pairs max 0.60 ≪ the 0.9 threshold) — so the UNION is
  // fully oracled.
  val q187 = Q(
    "q187_combined_decontam",
    s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
       |shd AS (SELECT DISTINCT doc_id, s
       |        FROM (SELECT doc_id, unnest($SHINGLES) AS s FROM d)),
       |ok AS (SELECT s FROM shd GROUP BY s HAVING count(*) <= 50),
       |shf AS (SELECT shd.doc_id, shd.s FROM shd JOIN ok USING (s)),
       |ev AS (SELECT doc_id AS eval_id, s FROM shf WHERE doc_id % 50 = 0),
       |tr AS (SELECT doc_id, s FROM shf WHERE doc_id % 50 <> 0),
       |cnt AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY 1),
       |hits AS (SELECT tr.doc_id, count(DISTINCT tr.s) AS n_shared
       |         FROM tr JOIN ev USING (s) GROUP BY 1),
       |ng AS (SELECT h.doc_id AS train_id,
       |         round(CAST(n_shared AS DOUBLE) / n_sh, 6) AS overlap
       |       FROM hits h JOIN cnt c ON h.doc_id = c.doc_id
       |       WHERE round(CAST(n_shared AS DOUBLE) / n_sh, 6) >= 0.05),
       |sm AS (SELECT vec_id AS train_id, CAST(1.0 AS DOUBLE) AS max_sim
       |       FROM embeddings WHERE vec_id % 10 = 7)
       |SELECT coalesce(ng.train_id, sm.train_id) AS train_id,
       |  ng.train_id IS NOT NULL AS ngram_flag,
       |  sm.train_id IS NOT NULL AS sem_flag,
       |  ng.overlap AS overlap, sm.max_sim AS max_sim
       |FROM ng FULL OUTER JOIN sm ON ng.train_id = sm.train_id
       |ORDER BY train_id""".stripMargin) { (s, d) =>
    val train = requirePlantHeadroom(Tables.embeddings(s, d), annPlant)
    val evalVecs = train.filter(col("vec_id") % 10 === 7)
      .select((col("vec_id") + annPlant).as("vec_id"), col("embedding"))
    graft.operators.SemDedup.decontaminateCombined(
        Tables.documents(s, d), train, evalVecs,
        evalDocPred = col("doc_id") % 50 === 0,
        minOverlap = 0.05, semThreshold = 0.9, c = 16, iters = 2, trainMod = 4)
      .orderBy("train_id")
  }

  // ---- q190: corpus build (mix → shard manifest, the output capstone) ----
  // The last mile from curated corpus to training shards as ONE
  // operator: q152's exact-integer mix selection (Mix.keep) feeds
  // q181's seeded shard packer over the corpus-THIN (doc_id, n_tokens)
  // kept table — Pack.shardManifestCounted never re-reads text, so at
  // 100 TB the composition pays the mix's two scan roles (availability
  // fit + sampling pass) and nothing else. The checkpoint runs the mix
  // at query CONSTRUCTION (PlanAudit's documented fit-at-construction
  // blind spot: the plan walker starts at the thin table, so the mix's
  // corpus scans are gated by q190's shuffle-byte row and the q152
  // oracle instead). FULL oracle: q152's keep CTEs chained into q181's
  // cumsum/overlap arithmetic, every step in exact integer form on
  // both engines.
  val q190 = {
    val BPS = 4; val SEED = 7L
    val L = 512
    val ST = BPS.toLong * L
    Q(
      "q190_corpus_build",
      s"""WITH d0 AS (SELECT doc_id, lang,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks,
         |  CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         | FROM documents),
         |t AS (SELECT lang,
         |  CASE lang WHEN 'en' THEN 40 WHEN 'zh' THEN 25 WHEN 'de' THEN 20
         |            WHEN 'es' THEN 10 ELSE 5 END AS share_pct
         | FROM (SELECT DISTINCT lang FROM d0)),
         |a AS (SELECT d0.lang, share_pct, sum(toks) AS avail,
         |        CAST(30000 AS BIGINT) * share_pct // 100 AS want
         | FROM d0 JOIN t ON d0.lang = t.lang GROUP BY d0.lang, share_pct),
         |kept AS (SELECT d0.doc_id, d0.toks FROM d0 JOIN a ON d0.lang = a.lang
         | WHERE a.want >= a.avail OR d0.h < (1152921504606846976 // a.avail) * a.want),
         |d AS (SELECT doc_id, toks AS n_tokens,
         |        ((doc_id % 2147483647) * 2654435761 + $SEED) % 2147483647 AS h
         |      FROM kept),
         |c AS (SELECT doc_id, n_tokens, h,
         |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gs
         |      FROM d),
         |e AS (SELECT doc_id, gs, n_tokens, gs // $ST AS first_shard,
         |        (gs + n_tokens - 1) // $ST AS last_shard FROM c),
         |x AS (SELECT e.*, CAST(sh AS BIGINT) AS shard_id
         |      FROM e, unnest(range(first_shard, last_shard + 1)) AS u(sh))
         |SELECT shard_id,
         |  CAST(sum(CASE WHEN first_shard = shard_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_starting,
         |  CAST(count(*) AS BIGINT) AS n_docs_touching,
         |  CAST(sum(least(gs + n_tokens, (shard_id + 1) * $ST) - greatest(gs, shard_id * $ST)) AS BIGINT) AS n_tokens,
         |  shard_id * $BPS AS first_bin,
         |  least(max((gs + n_tokens - 1) // $L), (shard_id + 1) * $BPS - 1) AS last_bin
         |FROM x GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, d) =>
      // the kept table is BUDGET-sized by construction (keep rates cap
      // tokens at ~30k), so materializing it eagerly costs a model-sized
      // checkpoint, cuts the mix lineage (the prefix sum's two passes
      // read the thin table, never the corpus), and keeps the pack
      // topology visible to PlanAudit
      val kept = graft.operators.Mix
        .keep(Tables.documents(s, d), budgetTokens = 30000L)
        .select(col("doc_id"), col("toks").as("n_tokens"))
        .localCheckpoint()
      graft.operators.Pack
        .shardManifestCounted(kept, seqLen = L, binsPerShard = BPS, seed = SEED)
        .orderBy("shard_id")
    }
  }

  // ---- q191: span excision (cut the duplicated passages) ----------------
  // The consumer of q162's extents — the RefinedWeb-style REMOVAL of
  // duplicated passages, keep-earliest convention (doc_b, the higher id
  // of each pair, loses its copy). Per cut-side document the extents
  // merge into maximal intervals (overlap/adjacency coalesces), the
  // covered tokens drop, and the cleaned normalized text is emitted
  // with span/cut counts. Only AFFECTED documents re-read text and pay
  // the token explode; interval windows partition per doc over extent
  // rows only. FULL oracle: q162's extents chain + the same island
  // merge + a position anti-join replayed exactly (both engines decide
  // every boundary on integers).
  val q191 = Q(
    "q191_span_excision",
    s"""WITH $winnowFpSql,
       |$winnowSegsSql,
       |cuts AS (SELECT DISTINCT doc_b AS doc_id, min(pb) AS s,
       |           max(pb) + ${WinK - 1} AS e
       |         FROM segs GROUP BY doc_a, doc_b, diag, seg),
       |rm AS (SELECT doc_id, s, e, max(e) OVER
       |         (PARTITION BY doc_id ORDER BY s, e
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM cuts),
       |br AS (SELECT *, CASE WHEN pme IS NULL OR s > pme + 1 THEN 1 ELSE 0 END AS brk FROM rm),
       |isl AS (SELECT *, sum(brk) OVER
       |          (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM br),
       |m AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM isl GROUP BY doc_id, grp),
       |aff AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM m GROUP BY 1),
       |w0 AS (SELECT d0.doc_id, $WORDS AS w FROM documents d0
       |       JOIN aff ON d0.doc_id = aff.doc_id),
       |tok AS (SELECT w0.doc_id, u.i - 1 AS pos, w[u.i] AS word
       |        FROM w0, unnest(range(1, len(w) + 1)) AS u(i)),
       |kept AS (SELECT t.* FROM tok t WHERE NOT EXISTS
       |           (SELECT 1 FROM m WHERE m.doc_id = t.doc_id
       |              AND t.pos BETWEEN m.s AND m.e)),
       |ka AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
       |         count(*) AS n_kept FROM kept GROUP BY 1),
       |tot AS (SELECT doc_id, len(w) AS n_tok FROM w0)
       |SELECT aff.doc_id, aff.n_spans,
       |  CAST(tot.n_tok - coalesce(ka.n_kept, 0) AS BIGINT) AS tokens_cut,
       |  coalesce(ka.clean_text, '') AS clean_text
       |FROM aff JOIN tot USING (doc_id) LEFT JOIN ka USING (doc_id)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Winnow.exciseSpans(Tables.documents(s, d), k = WinK, w = WinW,
        maxDf = WinMaxDf)
      .orderBy("doc_id")
  }

  // ---- q192: keep-best dedup (cluster → quality argmax survivor) --------
  // The RefinedWeb/FineWeb-style SELECTION step q121 stops short of:
  // which copy of each near-dup cluster ships. Keep-earliest (q191's
  // convention) throws away information — production pipelines keep
  // the HIGHEST-QUALITY member. Composition: q62's minhash pairs →
  // q121's connected components → q67's quality score over AFFECTED
  // docs only → per-cluster argmax (quality desc, doc_id tie-break).
  // Output is one row per CLUSTERED doc with its kept flag; unclustered
  // docs survive trivially and never enter the window.
  //
  // Scale shape: clusters are pair-derived (a vanishing fraction of
  // the corpus); quality is scored only for cluster members (the
  // cluster-id semi join prunes the corpus scan before the text HOFs
  // run); the argmax window partitions by cluster_id over cluster
  // members only — never a corpus-sized sort. FULL oracle: the q62
  // pair CTEs + q121's recursive closure + q67's quality arithmetic +
  // the same row_number rule, every boundary decided on rounded-once
  // values with an integer tie-break.
  val q192 = Q(
    "q192_dedup_keep_best",
    s"""WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM ($q62PairsSql)),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM p
       |      UNION SELECT doc_b, doc_a FROM p),
       |reach(id, r) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a),
       |comp AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1),
       |qm AS (SELECT doc_id,
       |   CAST(len(w) AS INTEGER) AS n_words,
       |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS sr6,
       |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> length(x) < 3)) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS shr6
       |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
       |q AS (SELECT doc_id,
       |   CASE WHEN n_words = 0 THEN 0.0 ELSE CAST((2 * (least(CAST(n_words AS BIGINT) * 20000, 4000000) + 3 * sr6 + 3000000 - 3 * shr6) + 1000) // 2000 AS BIGINT) / 10000.0 END AS quality
       |  FROM qm),
       |cl AS (SELECT comp.id AS doc_id, cluster_id, cluster_size, q.quality
       |  FROM comp JOIN sz USING (cluster_id) JOIN q ON q.doc_id = comp.id)
       |SELECT doc_id, cluster_id, cluster_size, quality,
       |  CAST(CASE WHEN row_number() OVER
       |    (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) = 1
       |    THEN 1 ELSE 0 END AS INTEGER) AS kept
       |FROM cl
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Dedup.keepBest(docs, Dedup.minhashCandidates(docs)).orderBy("doc_id")
  }

  // ---- q193: temperature-scaled corpus mix (UniMax / α-sampling) --------
  // q152 hits hand-FIXED target shares; the published multilingual
  // recipe derives shares from the corpus itself: share_l ∝ avail_l^α
  // (α = 1 proportional, α → 0 uniform; 0.5 here), which boosts
  // low-resource languages without a hand-tuned table. Same
  // exact-integer keep boundary as q152 (the md5-60 draw vs a
  // want/avail threshold); the ONE float step — avail^0.5 — is IEEE
  // sqrt, correctly rounded by the standard, quantized ONCE per
  // language to micro-units, so both engines floor identical doubles
  // and everything downstream is int64 (share in 1e-5 units, the
  // two-step div keeping every product under 2^63 to trillion-token
  // budgets — see Mix.availabilityTemperature).
  val q193 = Q(
    "q193_mix_temperature",
    """WITH d AS (SELECT doc_id, lang,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS toks,
      |  CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      | FROM documents),
      |a0 AS (SELECT lang, CAST(sum(toks) AS BIGINT) AS avail,
      |  CAST(floor(sqrt(CAST(sum(toks) AS DOUBLE)) * 1000000) AS BIGINT) AS w
      | FROM d GROUP BY lang),
      |a AS (SELECT lang, avail,
      |  CAST(CAST(w AS HUGEINT) * 100000 // (SELECT sum(w) FROM a0) AS BIGINT) AS share_ppm
      | FROM a0),
      |a2 AS (SELECT lang, avail, share_ppm,
      |  CAST(CAST(30000 AS HUGEINT) * share_ppm // 100000 AS BIGINT) AS want FROM a),
      |s AS (SELECT d.doc_id, d.lang, d.toks, a2.share_ppm, a2.want, a2.avail
      | FROM d JOIN a2 ON d.lang = a2.lang
      | WHERE a2.want >= a2.avail OR d.h < (1152921504606846976 // a2.avail) * a2.want)
      |SELECT lang,
      | CAST(max(share_ppm) AS BIGINT) AS share_ppm,
      | CAST(count(*) AS BIGINT) AS docs_kept,
      | CAST(sum(toks) AS BIGINT) AS tokens_kept,
      | CAST(max(want) AS BIGINT) AS tokens_wanted,
      | CAST(max(avail) AS BIGINT) AS tokens_available
      |FROM s
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    graft.operators.Mix
      .reportTemperature(Tables.documents(s, d), budgetTokens = 30000L)
      .orderBy("lang")
  }

  // ---- q194: CCNet perplexity buckets (head / middle / tail) ------------
  // Wenzek et al. 2020 §4.3: each language's documents partition into
  // thirds by LM score (our q165 integer scores); training reads
  // head+middle. NOT a per-language ntile over the corpus (a giant
  // per-language sort partition at 100 TB): per-language tercile
  // CUTOFFS calibrate on a deterministic hash-bucket sample (256 =
  // whole corpus here, so the oracle replays it; a deployment tunes
  // the sample down), broadcast L×2, and every document assigns
  // map-side. Cutoffs and comparisons are exact int64 micro-units;
  // boundary ties go to the better bucket (content-deterministic).
  // Zero-token docs bucket 'tail' by contract. V=16 as in q165.
  // shared by q194 (the bucket assignment), q196 (the curriculum build
  // over the kept bands), and q200 (the same over dedup survivors —
  // `from` names the source relation): q165's score CTEs + the rank
  // cutoffs + the CASE, ending in bk(doc_id, lang, n_tokens, am, bucket)
  private def ccnetOracleCtes(v: Int, from: String = "documents",
                              lead: String = "WITH "): String =
    s"""${lead}d AS (SELECT doc_id, lang, coalesce(list_filter($WORDS, x -> x <> ''), []) AS w FROM $from),
       |dd AS (SELECT doc_id, lang, w, CAST(len(w) AS BIGINT) AS n_tokens FROM d),
       |toks AS (SELECT unnest(w) AS term FROM dd),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM toks),
       |cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
       |model AS (SELECT term, CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(nn + ${v + 1} AS DOUBLE)) * 1000000.0) AS BIGINT) AS lnp_micro
       |          FROM (SELECT * FROM cnt, tot ORDER BY c DESC, term LIMIT $v)),
       |oov AS (SELECT CAST(floor(ln(CAST(1 AS DOUBLE) / CAST(nn + ${v + 1} AS DOUBLE)) * 1000000.0) AS BIGINT) AS oov_micro FROM tot),
       |dt AS (SELECT doc_id, n_tokens, unnest(list_transform(list_distinct(w),
       |         t -> struct_pack(term := t, c_dt := CAST(len(list_filter(w, x -> x = t)) AS BIGINT)))) AS e
       |       FROM dd),
       |dt2 AS (SELECT doc_id, n_tokens, e.term AS term, e.c_dt AS c_dt FROM dt),
       |sc AS (SELECT doc_id, sum(c_dt * coalesce(m.lnp_micro, (SELECT oov_micro FROM oov))) AS sum_micro
       |       FROM dt2 LEFT JOIN model m USING (term) GROUP BY 1),
       |sc2 AS (SELECT dd.doc_id, dd.lang, dd.n_tokens,
       |          CASE WHEN dd.n_tokens > 0
       |            THEN -((2 * (-sc.sum_micro) + dd.n_tokens) // (2 * dd.n_tokens)) END AS am
       |        FROM dd LEFT JOIN sc USING (doc_id)),
       |rk AS (SELECT lang, doc_id, am,
       |         row_number() OVER (PARTITION BY lang ORDER BY am DESC, doc_id) AS r,
       |         count(*) OVER (PARTITION BY lang) AS n
       |       FROM sc2 WHERE n_tokens > 0),
       |cut AS (SELECT lang,
       |          min(CASE WHEN r <= (n + 2) // 3 THEN am END) AS c1,
       |          min(CASE WHEN r <= (2 * n + 2) // 3 THEN am END) AS c2
       |        FROM rk GROUP BY 1),
       |bk AS (SELECT doc_id, sc2.lang AS lang, n_tokens, am,
       |         CASE WHEN n_tokens = 0 THEN 'tail'
       |              WHEN am >= c1 THEN 'head'
       |              WHEN am >= c2 THEN 'middle'
       |              ELSE 'tail' END AS bucket
       |       FROM sc2 LEFT JOIN cut ON sc2.lang = cut.lang)""".stripMargin

  val q194 = {
    val V = 16
    Q(
      "q194_ccnet_buckets",
      ccnetOracleCtes(V) +
        s"""
           |SELECT doc_id, lang, n_tokens,
           |  CAST(am AS DOUBLE) / 1000000.0 AS avg_logp, bucket
           |FROM bk
           |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.operators.LmScore.ccnetBuckets(Tables.documents(s, d), v = V)
        .orderBy("doc_id")
    }
  }

  // ---- q195: tokenized packing (shard layout by TRAINED-BPE counts) -----
  // q163/q181/q190 pack by whitespace token counts; a real training
  // run packs by the TOKENIZER's counts — a tokenizer-aware corpus
  // build composes q179 (train merges) → per-doc subword counts
  // (Bpe.encodeDocCounts: the vocab-sized merge fold joined back to
  // word usage — tokenizer math costs |vocab|·M, never corpus·M) →
  // q181's seeded shard packer over the corpus-THIN counted table.
  // Out-of-alphabet words count 1 (UNK); empty docs count 1 (Pack's
  // n_tokens ≥ 1 invariant). FULL oracle: q179's unrolled training
  // CTEs (v6 now carries the word key) → word→subword-length table →
  // per-doc counts → q190's cumsum/overlap manifest arithmetic, every
  // step exact integer on both engines.
  val q195 = {
    val L = 128; val BPS = 4; val SEED = 11L
    val ST = BPS.toLong * L
    Q(
      "q195_tokenized_packing",
      bpeOracleCtes(bpeRounds) +
        s""",
           |wn AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_sub FROM v$bpeRounds),
           |docw AS (SELECT doc_id, unnest(coalesce(list_filter($WORDS, x -> x <> ''), [])) AS word FROM documents),
           |dcw AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cw FROM docw GROUP BY 1, 2),
           |dn AS (SELECT doc_id, greatest(CAST(sum(cw * coalesce(wn.n_sub, 1)) AS BIGINT), 1) AS n_tokens
           |       FROM dcw LEFT JOIN wn USING (word) GROUP BY 1),
           |cnt AS (SELECT d0.doc_id, coalesce(dn.n_tokens, 1) AS n_tokens
           |        FROM (SELECT doc_id FROM documents) d0 LEFT JOIN dn USING (doc_id)),
           |pd AS (SELECT doc_id, n_tokens,
           |        ((doc_id % 2147483647) * 2654435761 + $SEED) % 2147483647 AS h FROM cnt),
           |pc AS (SELECT doc_id, n_tokens, h,
           |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gs
           |       FROM pd),
           |pe AS (SELECT doc_id, gs, n_tokens, gs // $ST AS first_shard,
           |        (gs + n_tokens - 1) // $ST AS last_shard FROM pc),
           |px AS (SELECT pe.*, CAST(sh AS BIGINT) AS shard_id
           |       FROM pe, unnest(range(first_shard, last_shard + 1)) AS u(sh))
           |SELECT shard_id,
           |  CAST(sum(CASE WHEN first_shard = shard_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_starting,
           |  CAST(count(*) AS BIGINT) AS n_docs_touching,
           |  CAST(sum(least(gs + n_tokens, (shard_id + 1) * $ST) - greatest(gs, shard_id * $ST)) AS BIGINT) AS n_tokens,
           |  shard_id * $BPS AS first_bin,
           |  least(max((gs + n_tokens - 1) // $L), (shard_id + 1) * $BPS - 1) AS last_bin
           |FROM px GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // ONE corpus words pass serves training (via the derived word
      // frequencies) and the per-doc token counts (r17 opt — the three
      // separate explode+aggregate corpus passes this query paid
      // collapse into this materialized usage table)
      val dw = graft.operators.Bpe.docWordCounts(docs).localCheckpoint(true)
      val merges = graft.operators.Bpe
        .trainMergesBatchedWf(graft.operators.Bpe.wordFreqFromDocCounts(dw),
          rounds = bpeRounds, batch = 3)
        .orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      require(merges.length == bpeRounds,
        s"BPE training exhausted after ${merges.length}/$bpeRounds rounds — " +
          "corpus too small for the unrolled oracle; lower bpeRounds")
      // corpus-THIN (doc_id, n_tokens): materialized so the prefix
      // sum's two passes read the thin table, never the corpus (the
      // q190 posture)
      val counted = graft.operators.Bpe.encodeDocCountsFromWords(dw, merges)
        .localCheckpoint()
      graft.operators.Pack
        .shardManifestCounted(counted, seqLen = L, binsPerShard = BPS, seed = SEED)
        .orderBy("shard_id")
    }
  }

  // ---- q196: curriculum corpus build (ccnet bands → annealed shards) ----
  // The CCNet DEPLOYMENT composed end-to-end: q194's buckets gate the
  // corpus (tail dropped — the published recipe trains on head+middle)
  // and the kept bands lay out into shards in ANNEAL order — all of
  // middle's tokens first, head's last (the quality-curriculum /
  // anneal-phase layout: training ends on the best band), the seeded
  // shuffle decorrelating order WITHIN each band (Pack's new
  // orderPrefix). Same manifest arithmetic as q181/q190/q195, exact
  // integer end-to-end; the kept thin table localCheckpoints so the
  // prefix sum never re-pays the LM scoring.
  val q196 = {
    val V = 16; val L = 128; val BPS = 4; val SEED = 13L
    val ST = BPS.toLong * L
    Q(
      "q196_curriculum_build",
      ccnetOracleCtes(V) +
        s""",
           |kept AS (SELECT doc_id, n_tokens,
           |          CASE WHEN bucket = 'middle' THEN 0 ELSE 1 END AS band_rank
           |         FROM bk WHERE bucket <> 'tail'),
           |pd AS (SELECT doc_id, n_tokens, band_rank,
           |        ((doc_id % 2147483647) * 2654435761 + $SEED) % 2147483647 AS h FROM kept),
           |pc AS (SELECT doc_id, n_tokens, band_rank, h,
           |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY band_rank, h, doc_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gs
           |       FROM pd),
           |pe AS (SELECT doc_id, gs, n_tokens, gs // $ST AS first_shard,
           |        (gs + n_tokens - 1) // $ST AS last_shard FROM pc),
           |px AS (SELECT pe.*, CAST(sh AS BIGINT) AS shard_id
           |       FROM pe, unnest(range(first_shard, last_shard + 1)) AS u(sh))
           |SELECT shard_id,
           |  CAST(sum(CASE WHEN first_shard = shard_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_starting,
           |  CAST(count(*) AS BIGINT) AS n_docs_touching,
           |  CAST(sum(least(gs + n_tokens, (shard_id + 1) * $ST) - greatest(gs, shard_id * $ST)) AS BIGINT) AS n_tokens,
           |  shard_id * $BPS AS first_bin,
           |  least(max((gs + n_tokens - 1) // $L), (shard_id + 1) * $BPS - 1) AS last_bin
           |FROM px GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, d) =>
      val kept = graft.operators.LmScore
        .ccnetBuckets(Tables.documents(s, d), v = V)
        .filter(col("bucket") =!= "tail")
        .withColumn("band_rank",
          when(col("bucket") === "middle", 0L).otherwise(1L))
        .select(col("doc_id"), col("n_tokens"), col("band_rank"))
        .localCheckpoint()
      graft.operators.Pack
        .shardManifestCounted(kept, seqLen = L, binsPerShard = BPS,
          seed = SEED, orderPrefix = Seq("band_rank"))
        .orderBy("shard_id")
    }
  }

  // ---- q197: the SQL front door through the driver's oracle gate --------
  // SqlSurfaceSpec pins TVF == DataFrame equality; this query puts the
  // TVF PATH ITSELF under the round-over-round DuckDB gate: the Spark
  // side is LITERAL SQL TEXT composing two pipeline table functions
  // (graft_pack × graft_quality joined, aggregated per training bin),
  // exactly what a reference user would type. Per-bin stats avoid
  // order-dependent float accumulation (count/sum on integers, min/max
  // on the already-rounded quality), so the oracle is exact.
  val q197 = Q(
    "q197_sql_front_door",
    s"""WITH m AS (SELECT doc_id, $WORDS AS w FROM documents),
       |qm AS (SELECT doc_id,
       |   CAST(len(w) AS INTEGER) AS n_words,
       |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS sr6,
       |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> length(x) < 3)) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS shr6
       |  FROM m),
       |q2 AS (SELECT doc_id, n_words,
       |   CASE WHEN n_words = 0 THEN 0.0 ELSE CAST((2 * (least(CAST(n_words AS BIGINT) * 20000, 4000000) + 3 * sr6 + 3000000 - 3 * shr6) + 1000) // 2000 AS BIGINT) / 10000.0 END AS quality
       |  FROM qm),
       |t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM m),
       |c AS (SELECT doc_id, CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gs FROM t),
       |b AS (SELECT doc_id, gs // 128 AS bin FROM c)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(q2.n_words) AS BIGINT) AS words,
       |  min(q2.quality) AS min_q, max(q2.quality) AS max_q
       |FROM b JOIN q2 USING (doc_id)
       |GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
    Tables.documents(s, d).createOrReplaceTempView("graft_docs")
    s.sql(
      """SELECT p.bin, count(*) AS n_docs,
        |  CAST(sum(q.n_words) AS BIGINT) AS words,
        |  min(q.quality) AS min_q, max(q.quality) AS max_q
        |FROM graft_pack('graft_docs', 128) p
        |JOIN graft_quality('graft_docs') q ON p.doc_id = q.doc_id
        |GROUP BY p.bin
        |ORDER BY p.bin""".stripMargin)
  }

  // ---- q198: contrastive pair mining (positives + hard negatives) -------
  // The dataset-construction step of retriever/embedding training
  // (DPR/SimCSE-style): per anchor, positives = candidates in the
  // near-dup band (planted twins at cosine exactly 1.0 — the q176
  // discipline, margin on both sides of the 0.9 threshold vs the
  // corpus's 0.60 natural max), hard negatives = the k most similar
  // candidates BELOW the band (random negatives are too easy; the
  // near-miss band carries the gradient). FULL oracle replays the
  // planted union, the rounded-once cosine, and the per-role rank.
  val q198 = Q(
    "q198_contrastive_mining",
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |tw AS (SELECT vec_id + $annPlant AS vec_id, emb FROM e0 WHERE vec_id < 10),
       |e AS (SELECT * FROM e0 UNION ALL SELECT * FROM tw),
       |q AS (SELECT vec_id AS qid, emb AS qe FROM e0 WHERE vec_id < 10),
       |sims AS (SELECT qid, c.vec_id AS cid,
       |           round(list_cosine_similarity(qe, c.emb), 4) AS sim
       |         FROM q JOIN e c ON qid <> c.vec_id),
       |r AS (SELECT qid, cid, sim,
       |        CASE WHEN sim >= 0.9 THEN 'pos' ELSE 'neg' END AS role FROM sims),
       |rk AS (SELECT qid, cid, sim, role,
       |         CAST(row_number() OVER (PARTITION BY qid, role
       |           ORDER BY sim DESC, cid) AS INTEGER) AS rn
       |       FROM r)
       |SELECT qid, cid, sim, role, rn FROM rk
       |WHERE role = 'pos' OR rn <= 5
       |ORDER BY qid, role, rn""".stripMargin) { (s, d) =>
    val base = requirePlantHeadroom(Tables.embeddings(s, d), annPlant)
      .select(col("vec_id"), col("embedding"))
    val anchors = base.filter(col("vec_id") < 10)
    val twins = anchors
      .select((col("vec_id") + annPlant).as("vec_id"), col("embedding"))
    Ann.contrastivePairs(base.unionByName(twins), anchors, k = 5,
        posThreshold = 0.9)
      .orderBy("qid", "role", "rn")
  }

  // ---- q199: corpus report card (per-source health dashboard) -----------
  // The operations view every corpus team keeps on a wall: per SOURCE,
  // volume (docs/tokens), language spread (distinct + mode), exact-dup
  // rate, and quality stats. ONE corpus text scan: quality + the
  // content hash ride a single projection (Quality.score carry), the
  // thin scored table localCheckpoints, and every branch below —
  // dup-hash set (rare by construction, broadcast back), per-source
  // aggregate, language mode — reads thin rows. Float discipline: the
  // quality MEAN is computed in integer 1e-4 units with the half-up
  // integer division (the q165 rounding form — a float sum's order
  // could flip the 4th decimal); dup_rate is one division of identical
  // integers; min/max are order-free.
  val q199 = Q(
    "q199_corpus_report",
    s"""WITH m AS (SELECT doc_id, source, lang, $NORM AS nrm, $WORDS AS w FROM documents),
       |qm AS (SELECT doc_id, source, lang, md5(nrm) AS ch,
       |   CAST(len(w) AS BIGINT) AS n_words,
       |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS sr6,
       |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> length(x) < 3)) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS shr6
       |  FROM m),
       |q AS (SELECT doc_id, source, lang, ch, n_words,
       |   CASE WHEN n_words = 0 THEN 0.0 ELSE CAST((2 * (least(CAST(n_words AS BIGINT) * 20000, 4000000) + 3 * sr6 + 3000000 - 3 * shr6) + 1000) // 2000 AS BIGINT) / 10000.0 END AS quality
       |  FROM qm),
       |dup AS (SELECT ch FROM q GROUP BY ch HAVING count(*) > 1),
       |b AS (SELECT q.*, CASE WHEN dup.ch IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
       |        CAST(round(quality * 10000) AS BIGINT) AS q4
       |      FROM q LEFT JOIN dup USING (ch)),
       |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |        CAST(sum(n_words) AS BIGINT) AS n_tokens,
       |        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |        CAST(sum(is_dup) AS BIGINT) AS dup_docs,
       |        CAST(sum(q4) AS BIGINT) AS sq4,
       |        min(quality) AS min_q, max(quality) AS max_q
       |      FROM b GROUP BY 1),
       |lm AS (SELECT source, lang, count(*) AS cnt FROM b GROUP BY 1, 2),
       |tm AS (SELECT source, lang AS top_lang FROM (
       |        SELECT source, lang, row_number() OVER
       |          (PARTITION BY source ORDER BY cnt DESC, lang) AS rn FROM lm)
       |       WHERE rn = 1)
       |SELECT a.source AS source, n_docs, n_tokens, n_langs, top_lang, dup_docs,
       |  round(CAST(dup_docs AS DOUBLE) / n_docs, 6) AS dup_rate,
       |  CAST((2 * sq4 + n_docs) // (2 * n_docs) AS DOUBLE) / 10000.0 AS avg_quality,
       |  min_q, max_q
       |FROM a JOIN tm ON a.source = tm.source
       |ORDER BY source""".stripMargin) { (s, d) =>
    // one implementation behind the batch card, the streaming card
    // (StreamingReportSpec), and the SQL face: operators/Report
    val thin = graft.operators.Report.thin(Tables.documents(s, d))
      .localCheckpoint()
    graft.operators.Report.card(thin).orderBy("source")
  }

  // ---- q200: corpus build v2 (the full modern pipeline, one statement) --
  // What a 2024-era pretraining data pipeline actually runs, composed
  // end-to-end and fully oracled: near-dup clusters keep their BEST
  // member (q192 — the losers leave), the SURVIVORS train the CCNet LM
  // and bucket per language (q194 — note the model fits on the
  // deduplicated corpus, the published order: dedup before quality
  // modeling so boilerplate mass cannot skew the LM), the tail band
  // drops, and the kept bands lay out into annealed curriculum shards
  // (q196). Scale shape: the loser set is cluster-member-sized
  // (broadcast anti-join), the band table is corpus-thin and
  // checkpointed, the packer never touches text.
  val q200 = {
    val V = 16; val L = 128; val BPS = 4; val SEED = 17L
    val ST = BPS.toLong * L
    Q(
      "q200_corpus_build_v2",
      s"""WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM ($q62PairsSql)),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p
         |      UNION SELECT doc_b, doc_a FROM p),
         |reach(id, r) AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a),
         |comp AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
         |qm AS (SELECT doc_id,
         |   CAST(len(w) AS INTEGER) AS n_words,
         |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS sr6,
         |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> length(x) < 3)) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS shr6
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
         |ql AS (SELECT doc_id,
         |   CASE WHEN n_words = 0 THEN 0.0 ELSE CAST((2 * (least(CAST(n_words AS BIGINT) * 20000, 4000000) + 3 * sr6 + 3000000 - 3 * shr6) + 1000) // 2000 AS BIGINT) / 10000.0 END AS quality
         |  FROM qm),
         |losers AS (SELECT doc_id FROM (
         |    SELECT comp.id AS doc_id, row_number() OVER
         |      (PARTITION BY cluster_id ORDER BY ql.quality DESC, comp.id) AS rn
         |    FROM comp JOIN ql ON ql.doc_id = comp.id)
         |  WHERE rn > 1),
         |surv AS (SELECT d0.doc_id, d0.lang, d0.text FROM documents d0
         |         LEFT JOIN losers USING (doc_id) WHERE losers.doc_id IS NULL),
         |${ccnetOracleCtes(V, from = "surv", lead = "")},
         |kept AS (SELECT doc_id, n_tokens,
         |          CASE WHEN bucket = 'middle' THEN 0 ELSE 1 END AS band_rank
         |         FROM bk WHERE bucket <> 'tail'),
         |pd AS (SELECT doc_id, n_tokens, band_rank,
         |        ((doc_id % 2147483647) * 2654435761 + $SEED) % 2147483647 AS h FROM kept),
         |pc AS (SELECT doc_id, n_tokens, band_rank, h,
         |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY band_rank, h, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gs
         |       FROM pd),
         |pe AS (SELECT doc_id, gs, n_tokens, gs // $ST AS first_shard,
         |        (gs + n_tokens - 1) // $ST AS last_shard FROM pc),
         |px AS (SELECT pe.*, CAST(sh AS BIGINT) AS shard_id
         |       FROM pe, unnest(range(first_shard, last_shard + 1)) AS u(sh))
         |SELECT shard_id,
         |  CAST(sum(CASE WHEN first_shard = shard_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_starting,
         |  CAST(count(*) AS BIGINT) AS n_docs_touching,
         |  CAST(sum(least(gs + n_tokens, (shard_id + 1) * $ST) - greatest(gs, shard_id * $ST)) AS BIGINT) AS n_tokens,
         |  shard_id * $BPS AS first_bin,
         |  least(max((gs + n_tokens - 1) // $L), (shard_id + 1) * $BPS - 1) AS last_bin
         |FROM px GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val kb = Dedup.keepBest(docs, Dedup.minhashCandidates(docs))
      val losers = kb.filter(col("kept") === 0).select(col("doc_id"))
      // losers are cluster-member-sized (a vanishing fraction): the
      // anti-join broadcasts, so the survivor scan is map-side
      val surv = docs.join(broadcast(losers), Seq("doc_id"), "left_anti")
      val kept = graft.operators.LmScore.ccnetBuckets(surv, v = V)
        .filter(col("bucket") =!= "tail")
        .withColumn("band_rank",
          when(col("bucket") === "middle", 0L).otherwise(1L))
        .select(col("doc_id"), col("n_tokens"), col("band_rank"))
        .localCheckpoint()
      graft.operators.Pack
        .shardManifestCounted(kept, seqLen = L, binsPerShard = BPS,
          seed = SEED, orderPrefix = Seq("band_rank"))
        .orderBy("shard_id")
    }
  }

  // ---- q201: temperature mixing across the alpha range (0.3 / 0.7) ------
  // r13 VERDICT item 2: q193 oracles only α = 0.5 (plain IEEE sqrt);
  // any other α went through libm pow — spec-pinned, not oracled. The
  // Mix.dyadicPow sqrt-chain (α snapped to k/2²⁰, one nested-sqrt
  // factor per set bit, fixed multiply order) makes EVERY α
  // engine-exact: sqrt and × are IEEE-correctly-rounded on both
  // engines, so the floor quantization cannot flip. This query runs
  // the UniMax paper's practical range (α = 0.3 and 0.7) through the
  // FULL hash-matched oracle — the DuckDB side replays the identical
  // chain, generated from the same dyadicPowSql helper.
  val q201 = {
    val budget = 30000L
    def tagOf(alpha: Double): String = math.round(alpha * 10).toString
    def side(alpha: Double): String = {
      val tag = tagOf(alpha)
      s"""SELECT CAST($alpha AS DOUBLE) AS alpha, lang,
         | CAST(max(share_ppm) AS BIGINT) AS share_ppm,
         | CAST(count(*) AS BIGINT) AS docs_kept,
         | CAST(sum(toks) AS BIGINT) AS tokens_kept,
         | CAST(max(want) AS BIGINT) AS tokens_wanted,
         | CAST(max(avail) AS BIGINT) AS tokens_available
         |FROM (
         | SELECT d.doc_id, d.lang, d.toks, a2.share_ppm, a2.want, a2.avail
         | FROM d JOIN (
         |   SELECT lang, avail, share_ppm,
         |     CAST(CAST($budget AS HUGEINT) * share_ppm // 100000 AS BIGINT) AS want
         |   FROM (SELECT lang, avail,
         |     CAST(CAST(w AS HUGEINT) * 100000 // (SELECT sum(w) FROM a0_$tag) AS BIGINT) AS share_ppm
         |     FROM a0_$tag)) a2 ON d.lang = a2.lang
         | WHERE a2.want >= a2.avail OR d.h < (1152921504606846976 // a2.avail) * a2.want)
         |GROUP BY lang""".stripMargin
    }
    def a0(alpha: Double): String = {
      val tag = tagOf(alpha)
      val chain = graft.operators.Mix.dyadicPowSql("CAST(sum(toks) AS DOUBLE)",
        graft.operators.Mix.dyadicK(alpha))
      s"""a0_$tag AS (SELECT lang, CAST(sum(toks) AS BIGINT) AS avail,
         |  CAST(floor(($chain) * 1000000) AS BIGINT) AS w
         | FROM d GROUP BY lang)""".stripMargin
    }
    Q(
      "q201_mix_alpha_sweep",
      s"""WITH d AS (SELECT doc_id, lang,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks,
         |  CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         | FROM documents),
         |${a0(0.3)},
         |${a0(0.7)}
         |SELECT * FROM (${side(0.3)} UNION ALL ${side(0.7)})
         |ORDER BY alpha, lang""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Seq(0.3, 0.7).map(a =>
        graft.operators.Mix.reportTemperature(docs, budget, alpha = a)
          .withColumn("alpha", lit(a)))
        .reduce(_ unionByName _)
        .select(col("alpha"), col("lang"), col("share_ppm"), col("docs_kept"),
          col("tokens_kept"), col("tokens_wanted"), col("tokens_available"))
        .orderBy("alpha", "lang")
    }
  }

  // ---- q202: contrastive mining from the persisted IVF index ------------
  // r13 VERDICT item 3: q198's brute face broadcasts anchors against a
  // full corpus scan — the correctness baseline, but anchor sets must
  // scale past broadcast. The deployment face probes the persisted IVF
  // index (model + index only, zero training jobs at query time — the
  // ivfSearch/q180 posture), reading ~nprobe/c of the index per anchor.
  // Planted-twin oracle discipline (q87/q198): twins are the only pairs
  // ≥ 0.9 (max natural cosine ~0.6 at every scale), and an identical
  // vector shares the anchor's top cluster by construction, so the
  // positive set is exactly {twin} at any nprobe; the kmeans-dependent
  // NEGATIVE identities are shape-checked (1..k rows, all below the
  // positive band). AnnIndexSpec pins full-probe == brute row-for-row.
  val q202 = Q(
    "q202_contrastive_from_index",
    s"""SELECT vec_id AS qid,
       | CAST(1 AS BIGINT) AS n_pos,
       | CAST(vec_id + $annPlant AS BIGINT) AS pos_cid,
       | CAST(1.0 AS DOUBLE) AS pos_sim,
       | true AS neg_ok
       |FROM embeddings WHERE vec_id < 10
       |ORDER BY qid""".stripMargin) { (s, d) =>
    val base = requirePlantHeadroom(Tables.embeddings(s, d), annPlant)
      .select(col("vec_id"), col("embedding"))
    val anchors = base.filter(col("vec_id") < 10)
    val twins = anchors
      .select((col("vec_id") + annPlant).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(twins)
    val cents = Ann.ivfFit(corpus, c = 16, iters = 2, trainMod = 4)
    val index = Ann.ivfEncode(corpus, cents)
    Ann.contrastivePairsFromIndex(cents, index, anchors, k = 5,
        posThreshold = 0.9, nprobe = 4)
      .groupBy(col("qid"))
      .agg(
        sum(when(col("role") === "pos", 1L).otherwise(0L)).as("n_pos"),
        max(when(col("role") === "pos", col("cid"))).as("pos_cid"),
        max(when(col("role") === "pos", col("sim"))).as("pos_sim"),
        (sum(when(col("role") === "neg", 1L).otherwise(0L)).between(1, 5) &&
          max(when(col("role") === "neg", col("sim"))) < 0.9).as("neg_ok"))
      .orderBy("qid")
  }

  // ---- q203: graph ANN (partitioned NSW + beam search) -------------------
  // r13 VERDICT item 7 (stretch): the HNSW-class index family. True
  // HNSW insertion is sequential; the Spark-native equivalent is
  // cell-local ring init + NN-Descent refinement (Dong et al. WWW'11,
  // with the §2.3 ρ=1/2 sampling) + centroid-routed fixed-hop beam
  // search from per-cell entries (the SPANN/DiskANN posture: coarse
  // routing, fine ranking by graph walk — the query path touches
  // graph-degree rows, never a cell scan). Cells scale as √n so walks
  // stay bounded as the corpus grows. This composition uses sign-LSH
  // cells (nswKnnLsh) — the zero-model face (no fit pass; buckets
  // assignable per-row at ingest); q214 oracles the k-means-celled
  // face, replay-deterministic since r15's centroid quantization
  // (Ann.centroidMean: fitted means rounded to the 1e-6 grid, so
  // accumulation-order ulp can no longer flip a boundary cell
  // assignment — the r14 9/10-vs-10/10 twin flake).
  // Planted-twin oracle (q87's): an identical query lands in its
  // twin's bucket BY CONSTRUCTION and the walk must surface it top-1
  // at sim 1.0.
  val q203 = Q("q203_graph_ann",
    annTop1Oracle(" CAST(1.0 AS DOUBLE) AS top1_sim")) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    annTop1Summary(
      Ann.nswKnnLsh(embs, annPlantQueries(embs), k = 5),
      simCol = Some("sim"), k = 5)
  }

  // ---- q214: graph ANN, k-means-celled face (r15) -------------------------
  // The q203 composition on ivfFit cells instead of sign-LSH buckets —
  // the face a deployment with an existing IVF model reuses (one cell
  // table serves both the IVF probe path and the graph walk). Joins
  // the oracle gate ONLY because r15 quantized fitted centroids to the
  // 1e-6 grid (Ann.centroidMean): the r14 twin flake was the walk path
  // flipping on accumulation-order ulp in the centroid means, and a
  // hash-gated oracle cannot sit on a coin flip. Same planted-twin
  // invariant: the query IS a corpus vector, so quantized routing
  // sends both to the same cell and the walk must surface the twin
  // top-1 at sim 1.0.
  val q214 = Q("q214_graph_ann_kmeans",
    annTop1Oracle(" CAST(1.0 AS DOUBLE) AS top1_sim")) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    annTop1Summary(
      Ann.nswKnn(embs, annPlantQueries(embs), k = 5, trainMod = 4),
      simCol = Some("sim"), k = 5)
  }

  // ---- q215: hybrid retrieval fusion (RRF) --------------------------------
  // Reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR'09, k=60) of
  // two retrievers over the same query-term set: lexical BM25 (q140's
  // formula) and TF-IDF dot product (q136's weight) — the standard
  // hybrid-retrieval combiner a targeted-corpus-selection pipeline runs
  // when neither ranker alone is trusted. Each ranker emits its top-20
  // by (rounded score, doc_id); fusion is INTEGER micro-units,
  // 1000000 div (60 + rank), summed over the lists a doc appears in —
  // exact on both engines (positive integer division truncates
  // identically), the q165/q175 discipline, so the fused ranking is
  // hash-stable with no float accumulation anywhere.
  //
  // Scale shape: ONE documents scan feeds both rankers (the q140
  // posting-intersection projection — only the <=3 query terms survive
  // to any shuffle, so every exchange is query-sized); each top-20 is
  // TakeOrderedAndProject (per-partition top-k + k-sized merge), the
  // rank windows run over <=20 rows, and the fusion join is 20x20
  // full-outer on unique doc_id. At 100 TB: rankers read their own
  // persisted posting/ANN indexes; the fusion step is rank-list-sized
  // regardless of corpus size.
  val q215 = {
    val terms = Seq("hash", "join", "vector")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val contrib = "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 " +
      "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    val tfidfW = "tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)"
    Q(
      "q215_hybrid_rrf",
      s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
         |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM d),
         |ad AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
         |t AS (SELECT doc_id, unnest(w) AS term FROM d),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
         |       WHERE term IN ($termList) GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |sa AS (SELECT tf.doc_id, round(sum($contrib), 6) AS score_a
         |       FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN ad
         |       GROUP BY 1),
         |sb AS (SELECT tf.doc_id, round(sum($tfidfW), 6) AS score_b
         |       FROM tf JOIN df USING (term) CROSS JOIN ad
         |       GROUP BY 1),
         |ra AS (SELECT doc_id, score_a,
         |         CAST(row_number() OVER (ORDER BY score_a DESC, doc_id) AS INTEGER) AS rank_a
         |       FROM sa QUALIFY rank_a <= 20),
         |rb AS (SELECT doc_id, score_b,
         |         CAST(row_number() OVER (ORDER BY score_b DESC, doc_id) AS INTEGER) AS rank_b
         |       FROM sb QUALIFY rank_b <= 20),
         |f AS (SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
         |        ra.rank_a, rb.rank_b,
         |        CAST(COALESCE(1000000 // (60 + ra.rank_a), 0)
         |           + COALESCE(1000000 // (60 + rb.rank_b), 0) AS BIGINT) AS fused
         |      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id)
         |SELECT doc_id, rank_a, rank_b, fused,
         |  CAST(row_number() OVER (ORDER BY fused DESC, doc_id) AS INTEGER) AS rank
         |FROM f QUALIFY rank <= 10
         |ORDER BY rank""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // ONE scan: the q140 posting-intersection projection, persisted —
      // doc length + only the query's terms survive to any shuffle
      val base = docs.select(col("doc_id"), Text.words(col("text")).as("w"))
        .select(col("doc_id"), size(col("w")).cast("double").as("dl"),
          expr(s"filter(w, t -> t IN ($termList))").as("qterms"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      val dl = base.select(col("doc_id"), col("dl"))
      val ad = base.agg(avg("dl").as("avgdl"),
        count(lit(1)).cast("double").as("n_docs"))
      val tf = base.select(col("doc_id"), explode(col("qterms")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tf.count()
      val dfT = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      def top20(scored: DataFrame, scoreCol: String, rankCol: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col(scoreCol).desc, col("doc_id"))
        scored.orderBy(col(scoreCol).desc, col("doc_id")).limit(20)
          .withColumn(rankCol, row_number().over(w).cast("int"))
      }
      val sa = tf.join(broadcast(dfT), "term").join(dl, "doc_id")
        .crossJoin(broadcast(ad))
        .groupBy("doc_id").agg(round(sum(expr(contrib)), 6).as("score_a"))
      val sb = tf.join(broadcast(dfT), "term")
        .crossJoin(broadcast(ad))
        .groupBy("doc_id").agg(round(sum(expr(tfidfW)), 6).as("score_b"))
      val ra = top20(sa, "score_a", "rank_a").select("doc_id", "rank_a")
      val rb = top20(sb, "score_b", "rank_b").select("doc_id", "rank_b")
      val wf = org.apache.spark.sql.expressions.Window
        .orderBy(col("fused").desc, col("doc_id"))
      ra.join(rb, Seq("doc_id"), "full_outer")
        .withColumn("fused",
          coalesce(expr("1000000L div (60 + rank_a)"), lit(0L)) +
            coalesce(expr("1000000L div (60 + rank_b)"), lit(0L)))
        .orderBy(col("fused").desc, col("doc_id")).limit(10)
        .withColumn("rank", row_number().over(wf).cast("int"))
        .select(col("doc_id"), col("rank_a"), col("rank_b"),
          col("fused"), col("rank"))
        .orderBy("rank")
    }
  }

  // ---- q216: ANN recall report (index qualification) ----------------------
  // recall@5 of the LSH index face (q65's exact plan) against the brute
  // baseline (q64's) — the go/no-go table a deployment reads before
  // switching its similarity-search index (Ann.recallAtK; the
  // NswRecallProbe measurement promoted to a first-class oracled
  // operator). Integer-exact: both rankings are replay-deterministic
  // (round-4 sims, cid tie-breaks), hits are set-intersection counts,
  // recall_ppm is hits·1e6 div base. The grading joins are
  // rank-list-sized (queries × k rows) regardless of corpus size.
  val q216 = {
    val nBits = 4
    val hps = graft.functions.Sketches.hyperplaneSigns(nBits, dim = 64)
    val bucketExpr = hps.zipWithIndex.map { case (hp, i) =>
      s"CASE WHEN list_dot_product(emb, [${hp.map(s => s"$s.0").mkString(", ")}]) > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    val probeList = ("bucket" +: (0 until nBits).map(i => s"xor(bucket, ${1L << i})")).mkString(", ")
    Q(
      "q216_ann_recall",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |bsims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |            round(list_cosine_similarity(q.emb, c.emb), 4) AS sim
         |          FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |          WHERE q.vec_id < 10),
         |brk AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
         |        FROM bsims),
         |bt AS (SELECT qid, cid FROM brk WHERE rn <= 5),
         |b AS (SELECT vec_id, emb, $bucketExpr AS bucket FROM e),
         |q AS (SELECT vec_id AS qid, emb AS qe, bucket FROM b WHERE vec_id < 10),
         |probes AS (SELECT qid, qe, unnest([$probeList]) AS bucket FROM q),
         |cand AS (SELECT p.qid, p.qe, c.vec_id AS cid, c.emb AS ce
         |         FROM probes p JOIN b c USING (bucket) WHERE p.qid <> c.vec_id),
         |ark AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY round(list_cosine_similarity(qe, ce), 4) DESC, cid) AS rn
         |        FROM cand),
         |at AS (SELECT qid, cid, 1 AS hit FROM ark WHERE rn <= 5)
         |SELECT bt.qid,
         |  count(*) AS n_exact,
         |  CAST(sum(COALESCE(at.hit, 0)) AS BIGINT) AS n_hits,
         |  CAST(sum(COALESCE(at.hit, 0)) * 1000000 // count(*) AS BIGINT) AS recall_ppm
         |FROM bt LEFT JOIN at ON bt.qid = at.qid AND bt.cid = at.cid
         |GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, d) =>
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 10)
      Ann.recallAtK(
        approx = Ann.lshKnn(embs, queries, k = 5, nBits = nBits),
        exact = Ann.bruteKnn(embs, queries, k = 5), k = 5)
        .orderBy("qid")
    }
  }

  // ---- q217: 1-NN label agreement (embedding-quality QA) ------------------
  // The standard probe before trusting an embedding column for
  // SemDeDup / ANN / contrastive mining: per label class, does each
  // probe's nearest neighbour share its label? (a space whose
  // neighbours cross labels will near-dup across concepts).
  // Ann.nnLabelAgreement: q64-discipline top-1 (round-4 cosine, cid
  // tie-break — SQL-replayable), labels on thin equi-joins, |labels|
  // output rows, agreement_ppm integer-exact. Probes are the 25
  // lowest vec_ids (bounded broadcast side — the q64 declared-brute
  // class; at scale any index face substitutes for bruteKnn).
  val q217 = Q(
    "q217_nn_label_agreement",
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |sims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
      |           round(list_cosine_similarity(q.emb, c.emb), 4) AS sim
      |         FROM e q JOIN e c ON q.vec_id <> c.vec_id
      |         WHERE q.vec_id < 25),
      |rk AS (SELECT qid, cid,
      |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
      |       FROM sims),
      |nn AS (SELECT qid, cid FROM rk WHERE rn = 1),
      |j AS (SELECT ql.label AS q_label, cl.label AS nn_label
      |      FROM nn JOIN e ql ON nn.qid = ql.vec_id
      |             JOIN e cl ON nn.cid = cl.vec_id)
      |SELECT q_label,
      |  count(*) AS n_queries,
      |  CAST(sum(CASE WHEN q_label = nn_label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
      |  CAST(sum(CASE WHEN q_label = nn_label THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS agreement_ppm
      |FROM j GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    Ann.nnLabelAgreement(embs, embs.filter(col("vec_id") < 25))
      .orderBy("q_label")
  }

  // ---- q218: overlapping text chunking (RAG / context-window prep) --------
  // Every document split into 32-word windows advancing by 24 (8-word
  // overlap), last window clamped at the end — the retrieval-corpus /
  // training-context preparation pass (Text.chunkWords). Pure map-side
  // projection: sequence/transform/slice are codegen'd built-ins and
  // the chunker never sees two documents together, so it scales as a
  // scan at any corpus size; the only exchange is the output ORDER BY.
  // Chunk count is integer-exact ((len−W+S−1) div S + 1), replayed
  // verbatim by the oracle's generate-and-slice CTEs.
  val q218 = {
    val (w, s) = (32, 24)
    Q(
      "q218_text_chunking",
      s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
         |n AS (SELECT doc_id, w, CAST(len(w) AS INTEGER) AS len,
         |  CASE WHEN len(w) <= $w THEN 1
         |       ELSE CAST((len(w) - $w + ${s - 1}) // $s + 1 AS INTEGER) END AS n_chunks
         | FROM d),
         |c AS (SELECT doc_id, len, n_chunks,
         |  CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_id FROM n),
         |x AS (SELECT c.doc_id, c.len, c.n_chunks, c.chunk_id,
         |  CAST(c.chunk_id * $s + 1 AS INTEGER) AS start_word,
         |  n.w[(c.chunk_id * $s + 1):(c.chunk_id * $s + $w)] AS piece
         | FROM c JOIN n ON c.doc_id = n.doc_id)
         |SELECT doc_id, chunk_id, start_word,
         |  CAST(len(piece) AS INTEGER) AS n_words,
         |  array_to_string(piece, ' ') AS chunk
         |FROM x
         |ORDER BY doc_id, chunk_id""".stripMargin) { (sp, d) =>
      Tables.documents(sp, d)
        .select(col("doc_id"),
          explode(graft.functions.Text.chunkWords(
            graft.functions.Text.words(col("text")), w, s)).as("c"))
        .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
          col("c.start_word").as("start_word"),
          col("c.n_words").as("n_words"), col("c.chunk").as("chunk"))
        .orderBy("doc_id", "chunk_id")
    }
  }

  // ---- q219: corpus snapshot diff (iterative-curation QA) -----------------
  // What changed between two corpus versions — the table a curation
  // loop reads after every pipeline change (did the new filter remove
  // what it claimed, and ONLY that?). The "new" snapshot is derived
  // deterministically from documents inside the query (every 97th doc
  // removed, every 53rd revised, every 89th duplicated in as a fresh
  // srcNEW arrival), so the oracle replays snapshot derivation AND
  // diff. Report.corpusDiff: both sides reduce to corpus-THIN
  // (doc_id, source, ch, toks) before ONE full-outer unique-key join —
  // text never rides the exchange, output is |sources| rows; content
  // identity is the normalized md5 (format-only edits don't count);
  // presence via markers, not column nullness (the r15 discipline).
  val q219 = Q(
    "q219_corpus_diff",
    s"""WITH newd AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 53 = 0 THEN text || ' revised' ELSE text END AS text
       |  FROM documents WHERE doc_id % 97 <> 0
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, 'srcNEW' AS source, text
       |  FROM documents WHERE doc_id % 89 = 0),
       |o AS (SELECT doc_id, source, md5($NORM) AS ch,
       |        CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks
       |      FROM documents),
       |n AS (SELECT doc_id, source, md5($NORM) AS ch,
       |        CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks
       |      FROM newd),
       |j AS (SELECT CASE WHEN n.doc_id IS NOT NULL THEN n.source
       |             ELSE o.source END AS source,
       |        CASE WHEN o.doc_id IS NULL THEN 1 ELSE 0 END AS added,
       |        CASE WHEN n.doc_id IS NULL THEN 1 ELSE 0 END AS removed,
       |        CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
       |             AND o.ch IS DISTINCT FROM n.ch THEN 1 ELSE 0 END AS changed,
       |        CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
       |             AND o.ch IS NOT DISTINCT FROM n.ch THEN 1 ELSE 0 END AS unchanged,
       |        COALESCE(n.toks, 0) - COALESCE(o.toks, 0) AS tok_delta
       |      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
       |SELECT source,
       |  CAST(sum(added) AS BIGINT) AS n_added,
       |  CAST(sum(removed) AS BIGINT) AS n_removed,
       |  CAST(sum(changed) AS BIGINT) AS n_changed,
       |  CAST(sum(unchanged) AS BIGINT) AS n_unchanged,
       |  CAST(sum(tok_delta) AS BIGINT) AS tok_delta
       |FROM j GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // ONE scan derives the whole new snapshot: each doc emits its
    // surviving (possibly revised) row and/or its srcNEW re-arrival as
    // an array-explode, instead of a 2-scan filter+union
    val newDocs = docs.select(explode(filter(array(
        when(col("doc_id") % 97 =!= 0, struct(
          col("doc_id"),
          col("source"),
          when(col("doc_id") % 53 === 0,
            concat(col("text"), lit(" revised"))).otherwise(col("text"))
            .as("text"))),
        when(col("doc_id") % 89 === 0, struct(
          (col("doc_id") + 1000000L).as("doc_id"),
          lit("srcNEW").as("source"),
          col("text")))),
        x => x.isNotNull)).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.text").as("text"))
    graft.operators.Report.corpusDiff(docs, newDocs).orderBy("source")
  }

  // ---- q220: hybrid BM25 ⊕ vector-ANN retrieval (the RAG stack) ----------
  // The actual production hybrid: the q140 BM25 lexical ranking fused
  // with each probe's brute-cosine vector ranking (q64's exact face —
  // swap any Ann index face at 100 TB) through q215's integer RRF.
  // RRF needs no score calibration between the incomparable scales —
  // THE reason it, not a weighted sum, is the deployment default.
  // Operator: Retrieval.hybridSearch — the lexical top-20 broadcasts
  // once (qid-independent), each probe's fusion join is 20×20 on
  // unique doc_id, fused micro-units are integer-exact
  // (Σ 1,000,000 div (60 + rank), absent side 0), so the whole grading
  // is rank-list-sized regardless of corpus size. The oracle replays
  // BM25 scoring, brute cosine ranking, and the fusion end to end.
  val q220 = {
    val terms = Seq("hash", "join", "vector")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val contrib = "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 " +
      "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    Q(
      "q220_hybrid_search",
      s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
         |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM d),
         |ad AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
         |t AS (SELECT doc_id, unnest(w) AS term FROM d),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
         |       WHERE term IN ($termList) GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id, round(sum($contrib), 6) AS score
         |       FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN ad
         |       GROUP BY 1),
         |lex AS (SELECT doc_id,
         |          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank_lex
         |        FROM sc QUALIFY rank_lex <= 20),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |vsims AS (SELECT q.vec_id AS qid, c.vec_id AS doc_id,
         |            round(list_cosine_similarity(q.emb, c.emb), 4) AS sim
         |          FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |          WHERE q.vec_id < 3),
         |vec AS (SELECT qid, doc_id,
         |          CAST(row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, doc_id) AS INTEGER) AS rank_vec
         |        FROM vsims QUALIFY rank_vec <= 20),
         |lq AS (SELECT e.vec_id AS qid, lex.doc_id, lex.rank_lex
         |       FROM e CROSS JOIN lex WHERE e.vec_id < 3),
         |f AS (SELECT COALESCE(v.qid, lq.qid) AS qid,
         |        COALESCE(v.doc_id, lq.doc_id) AS doc_id,
         |        lq.rank_lex, v.rank_vec,
         |        CAST(COALESCE(1000000 // (60 + lq.rank_lex), 0)
         |           + COALESCE(1000000 // (60 + v.rank_vec), 0) AS BIGINT) AS fused
         |      FROM vec v FULL OUTER JOIN lq
         |        ON v.qid = lq.qid AND v.doc_id = lq.doc_id)
         |SELECT qid, doc_id, rank_lex, rank_vec, fused,
         |  CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY fused DESC, doc_id) AS INTEGER) AS rank
         |FROM f QUALIFY rank <= 10
         |ORDER BY qid, rank""".stripMargin) { (s, d) =>
      graft.operators.Retrieval.hybridSearch(
        Tables.documents(s, d), Tables.embeddings(s, d), terms,
        Tables.embeddings(s, d).filter(col("vec_id") < 3),
        k = 10, depth = 20, rrfK = 60)
        .orderBy("qid", "rank")
    }
  }

  // ---- q221: multi-class classification (the presto-ml classify face) ----
  // The reference's `classify(features, model)` contract (presto-ml
  // MLFunctions.java:56): return the predicted CLASS for each row under
  // a trained classifier. Training via libsvm stays excluded (SURVEY
  // §2.2 — version-coupled foreign numerics, unoracleable), but the
  // classify surface rides the q207 integer-odds discipline extended to
  // a DENSE (word × label) grid: weight_ppm(w,l) = P(label|word) ppm,
  // per-doc per-label integer weighted means, argmax by (score desc,
  // label) — zero floats, so train→classify replays exactly in DuckDB.
  // Here: predict each document's language from its words (5 classes).
  val q221 = Q(
    "q221_classify_multi",
    s"""WITH dw AS (SELECT doc_id, lang,
       |        unnest(coalesce(list_filter($WORDS, x -> x <> ''), [])) AS word
       |      FROM documents),
       |fw AS MATERIALIZED (SELECT * FROM dw WHERE regexp_full_match(word, '[a-z0-9]+')),
       |wc AS (SELECT word, lang AS label, CAST(count(*) AS BIGINT) AS cnt
       |       FROM fw WHERE lang IS NOT NULL GROUP BY 1, 2),
       |wt AS (SELECT word, CAST(sum(cnt) AS BIGINT) AS cnt_all
       |       FROM wc GROUP BY 1 HAVING sum(cnt) >= 2),
       |ls AS (SELECT DISTINCT label FROM wc),
       |wl AS (SELECT wt.word, ls.label,
       |         CAST(CAST(coalesce(wc.cnt, 0) AS HUGEINT) * 1000000 // wt.cnt_all AS BIGINT) AS weight_ppm
       |       FROM wt CROSS JOIN ls
       |       LEFT JOIN wc ON wc.word = wt.word AND wc.label = ls.label),
       |dcw AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cw
       |        FROM fw GROUP BY 1, 2),
       |sc AS (SELECT dcw.doc_id, wl.label,
       |         CAST(sum(CAST(cw AS HUGEINT) * weight_ppm) // sum(cw) AS BIGINT) AS score_ppm,
       |         CAST(sum(cw) AS BIGINT) AS n_scored
       |       FROM dcw JOIN wl USING (word) GROUP BY 1, 2),
       |r AS (SELECT doc_id, label, score_ppm, n_scored,
       |        row_number() OVER (PARTITION BY doc_id
       |          ORDER BY score_ppm DESC, label) AS rn
       |      FROM sc)
       |SELECT doc_id, label AS pred_label, score_ppm, n_scored
       |FROM r WHERE rn = 1
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Classifier
      .trainClassify(Tables.documents(s, d), col("lang"), minDf = 2)
      .orderBy("doc_id")
  }

  // ---- q222: FILTERED ANN search (metadata predicate) --------------------
  // Top-k under a metadata predicate (`label = 3`) — the RAG deployment
  // reality (tenant / language / source scoping). The predicate prunes
  // CANDIDATES BEFORE scoring (the reference's pushdown-into-scan
  // posture, ScanFilterAndProjectOperator), never a finished k-list —
  // so rn 1..k is dense over the allowed set and a selective filter
  // cannot empty the answer while allowed neighbours exist. This is the
  // brute oracle face (Ann.bruteKnnFiltered); the index faces
  // (ivfSearchFiltered / pqSearchFiltered / nswSearchLshFiltered) carry
  // the same contract with the predicate pushed into the probed buckets
  // of the persisted index — AnnSpec pins index-face parity and the
  // planted-twin-under-filter law.
  val q222 = Q(
    "q222_filtered_ann",
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |sims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
      |           round(list_cosine_similarity(q.emb, c.emb), 4) AS sim
      |         FROM e q JOIN e c ON q.vec_id <> c.vec_id
      |         WHERE q.vec_id < 10 AND c.label = 3)
      |SELECT qid, cid, sim,
      |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
      |FROM sims QUALIFY rn <= 5
      |ORDER BY qid, rn""".stripMargin) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    Ann.bruteKnnFiltered(embs, embs.filter(col("vec_id") < 10), k = 5,
      pred = col("label") === 3)
      .orderBy("qid", "rn")
  }

  // ---- q223: hybrid retrieval over an INDEX face, graded ------------------
  // q220 fuses the brute vector ranking; the deployment form fuses an
  // ANN INDEX face. Same fusion operator (Retrieval.hybridSearchRanked
  // — integer RRF, qid-partitioned windows, rank-list-sized regardless
  // of which face feeds it), the LSH index face swapped in for the
  // vector side, and the swapped composition GRADED against the brute
  // fusion with q216's recallAtK — the go/no-go row a deployment reads
  // before switching its retrieval stack's vector side. Every stage is
  // replay-deterministic (round-6 BM25, round-4 sims, integer RRF), so
  // the whole grade rides the FULL oracle.
  val q223 = {
    val terms = Seq("hash", "join", "vector")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val contrib = "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 " +
      "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    val nBits = 4
    val hps = graft.functions.Sketches.hyperplaneSigns(nBits, dim = 64)
    val bucketExpr = hps.zipWithIndex.map { case (hp, i) =>
      s"CASE WHEN list_dot_product(emb, [${hp.map(s => s"$s.0").mkString(", ")}]) > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    val probeList = ("bucket" +: (0 until nBits).map(i => s"xor(bucket, ${1L << i})")).mkString(", ")
    Q(
      "q223_hybrid_indexed_recall",
      s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
         |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM d),
         |ad AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
         |t AS (SELECT doc_id, unnest(w) AS term FROM d),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
         |       WHERE term IN ($termList) GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id, round(sum($contrib), 6) AS score
         |       FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN ad
         |       GROUP BY 1),
         |lex AS (SELECT doc_id,
         |          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank_lex
         |        FROM sc QUALIFY rank_lex <= 20),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |qs AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 3),
         |bsims AS (SELECT q.qid, c.vec_id AS doc_id,
         |            round(list_cosine_similarity(q.qe, c.emb), 4) AS sim
         |          FROM qs q JOIN e c ON q.qid <> c.vec_id),
         |bvec AS (SELECT qid, doc_id,
         |           CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, doc_id) AS INTEGER) AS rank_vec
         |         FROM bsims QUALIFY rank_vec <= 20),
         |b AS (SELECT vec_id, emb, $bucketExpr AS bucket FROM e),
         |qb AS (SELECT vec_id AS qid, emb AS qe, bucket FROM b WHERE vec_id < 3),
         |probes AS (SELECT qid, qe, unnest([$probeList]) AS bucket FROM qb),
         |cand AS (SELECT p.qid, p.qe, c.vec_id AS doc_id, c.emb AS ce
         |         FROM probes p JOIN b c USING (bucket) WHERE p.qid <> c.vec_id),
         |avec AS (SELECT qid, doc_id,
         |           CAST(row_number() OVER (PARTITION BY qid
         |             ORDER BY round(list_cosine_similarity(qe, ce), 4) DESC, doc_id) AS INTEGER) AS rank_vec
         |         FROM cand QUALIFY rank_vec <= 20),
         |lq AS (SELECT qs.qid, lex.doc_id, lex.rank_lex FROM qs CROSS JOIN lex),
         |af AS (SELECT COALESCE(v.qid, lq.qid) AS qid, COALESCE(v.doc_id, lq.doc_id) AS doc_id,
         |         CAST(COALESCE(1000000 // (60 + lq.rank_lex), 0)
         |            + COALESCE(1000000 // (60 + v.rank_vec), 0) AS BIGINT) AS fused
         |       FROM avec v FULL OUTER JOIN lq ON v.qid = lq.qid AND v.doc_id = lq.doc_id),
         |atop AS (SELECT qid, doc_id FROM (
         |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid ORDER BY fused DESC, doc_id) AS rnk
         |    FROM af) WHERE rnk <= 10),
         |ef AS (SELECT COALESCE(v.qid, lq.qid) AS qid, COALESCE(v.doc_id, lq.doc_id) AS doc_id,
         |         CAST(COALESCE(1000000 // (60 + lq.rank_lex), 0)
         |            + COALESCE(1000000 // (60 + v.rank_vec), 0) AS BIGINT) AS fused
         |       FROM bvec v FULL OUTER JOIN lq ON v.qid = lq.qid AND v.doc_id = lq.doc_id),
         |etop AS (SELECT qid, doc_id FROM (
         |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid ORDER BY fused DESC, doc_id) AS rnk
         |    FROM ef) WHERE rnk <= 10)
         |SELECT etop.qid,
         |  count(*) AS n_exact,
         |  CAST(sum(CASE WHEN atop.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |  CAST(sum(CASE WHEN atop.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS recall_ppm
         |FROM etop LEFT JOIN atop ON etop.qid = atop.qid AND etop.doc_id = atop.doc_id
         |GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val embs = Tables.embeddings(s, d)
      val queries = embs.filter(col("vec_id") < 3)
      val qids = queries.select(col("vec_id").as("qid"))
      // ONE lexical ranking serves both fusions (r17 opt): the two
      // fused() calls previously each ran the full eager BM25 scoring
      // chain (corpus-pass persist + count + checkpoint, twice) for an
      // identical 20-row top-list — compute it once and share
      val lex = graft.operators.Retrieval.topRanked(
          graft.operators.Retrieval.bm25Scored(docs, terms),
          "score", "rank_lex", 20)
        .select(col("doc_id"), col("rank_lex"))
      def fused(vecRanks: DataFrame): DataFrame = graft.operators.Retrieval
        .hybridSearchRankedLex(lex, qids, vecRanks,
          k = 10, depth = 20, rrfK = 60)
        .select(col("qid"), col("doc_id").as("cid"), col("rank").as("rn"))
      val approx = fused(Ann.lshKnn(embs, queries, k = 20, nBits = nBits)
        .select(col("qid"), col("cid").as("doc_id"), col("rn").as("rank_vec")))
      val exact = fused(Ann.bruteKnn(embs, queries, k = 20)
        .select(col("qid"), col("cid").as("doc_id"), col("rn").as("rank_vec")))
      Ann.recallAtK(approx, exact, k = 10).orderBy("qid")
    }
  }

  // ---- q224: BM25 from the PERSISTED lexical index ------------------------
  // q140 scores BM25 with one corpus scan per query; the deployment
  // form pays ONE indexing pass (Retrieval.lexIndex: posting table
  // bucketed by term + doc-length table + single-row stats) and serves
  // every query from the index with ZERO document scans — the
  // fit/encode/search split the Ann family already has, applied to the
  // lexical side of the RAG stack. df is derived by counting each
  // term's PROBED postings (a term's df IS its posting-list length —
  // no separate df table to drift out of sync). Identical output
  // contract to q140 on different terms; the oracle replays the
  // posting-table derivation. RetrievalSpec pins index == direct
  // row-for-row and asserts the search plan never scans documents.
  val q224 = {
    val terms = Seq("scan", "merge", "filter")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val contrib = "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 " +
      "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    Q(
      "q224_bm25_index",
      s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents),
         |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM d),
         |ad AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
         |post AS (SELECT term, doc_id, CAST(count(*) AS DOUBLE) AS tf
         |         FROM (SELECT doc_id, unnest(w) AS term FROM d) GROUP BY 1, 2),
         |probed AS (SELECT * FROM post WHERE term IN ($termList)),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM probed GROUP BY 1),
         |sc AS (SELECT probed.doc_id, round(sum($contrib), 6) AS score,
         |         CAST(count(*) AS BIGINT) AS n_terms
         |       FROM probed JOIN df USING (term) JOIN dl ON probed.doc_id = dl.doc_id CROSS JOIN ad
         |       GROUP BY 1),
         |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc)
         |SELECT doc_id, score, n_terms, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 10
         |ORDER BY rank""".stripMargin) { (s, d) =>
      val (post, dl, stats) = graft.operators.Retrieval
        .lexIndex(Tables.documents(s, d))
      graft.operators.Retrieval.bm25FromIndex(post, dl, stats, terms, k = 10)
    }
  }

  // ---- q225: FILTERED hybrid retrieval (the full RAG deployment query) ----
  // "Top-k for these probes, ENGLISH documents only" — q222's filtered
  // candidate generation composed with q220's fusion: the lexical side
  // is BM25 over the predicate-pruned corpus (corpus stats, df and the
  // rank list all computed over allowed docs — a post-filtered global
  // ranking would mis-weight df and leave rank holes), the vector side
  // is bruteKnnFiltered with the SAME predicate carried onto the
  // embedding rows by one thin metadata join, and the RRF fusion is
  // unchanged (rank-list-sized, face-agnostic). Probes themselves are
  // unrestricted — a French probe still retrieves English documents,
  // the cross-lingual-query reality. PURE COMPOSITION: zero new
  // operator code; every piece carries its own oracle/spec, and this
  // query pins the composition end to end in DuckDB.
  val q225 = {
    val terms = Seq("hash", "join", "vector")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val contrib = "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 " +
      "/ (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    Q(
      "q225_filtered_hybrid",
      s"""WITH d AS (SELECT doc_id, $WORDS AS w FROM documents WHERE lang = 'en'),
         |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM d),
         |ad AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
         |t AS (SELECT doc_id, unnest(w) AS term FROM d),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
         |       WHERE term IN ($termList) GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id, round(sum($contrib), 6) AS score
         |       FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN ad
         |       GROUP BY 1),
         |lex AS (SELECT doc_id,
         |          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank_lex
         |        FROM sc QUALIFY rank_lex <= 20),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |al AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         |vsims AS (SELECT q.vec_id AS qid, c.vec_id AS doc_id,
         |            round(list_cosine_similarity(q.emb, c.emb), 4) AS sim
         |          FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |          JOIN al ON c.vec_id = al.doc_id
         |          WHERE q.vec_id < 3),
         |vec AS (SELECT qid, doc_id,
         |          CAST(row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, doc_id) AS INTEGER) AS rank_vec
         |        FROM vsims QUALIFY rank_vec <= 20),
         |lq AS (SELECT e.vec_id AS qid, lex.doc_id, lex.rank_lex
         |       FROM e CROSS JOIN lex WHERE e.vec_id < 3),
         |f AS (SELECT COALESCE(v.qid, lq.qid) AS qid,
         |        COALESCE(v.doc_id, lq.doc_id) AS doc_id,
         |        lq.rank_lex, v.rank_vec,
         |        CAST(COALESCE(1000000 // (60 + lq.rank_lex), 0)
         |           + COALESCE(1000000 // (60 + v.rank_vec), 0) AS BIGINT) AS fused
         |      FROM vec v FULL OUTER JOIN lq
         |        ON v.qid = lq.qid AND v.doc_id = lq.doc_id)
         |SELECT qid, doc_id, rank_lex, rank_vec, fused,
         |  CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY fused DESC, doc_id) AS INTEGER) AS rank
         |FROM f QUALIFY rank <= 10
         |ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val embs = Tables.embeddings(s, d)
      val lang = docs.select(col("doc_id").as("vec_id"), col("lang"))
      val queries = embs.filter(col("vec_id") < 3)
      val vec = Ann.bruteKnnFiltered(embs.join(lang, Seq("vec_id")), queries,
          k = 20, pred = col("lang") === "en")
        .select(col("qid"), col("cid").as("doc_id"), col("rn").as("rank_vec"))
      graft.operators.Retrieval.hybridSearchRanked(
        docs.filter(col("lang") === "en"), terms,
        queries.select(col("vec_id").as("qid")), vec,
        k = 10, depth = 20, rrfK = 60)
        .orderBy("qid", "rank")
    }
  }

  // ---- q204: per-source dedup savings report -----------------------------
  // The go/no-go artifact before paying for a corpus-wide dedup pass:
  // per source, documents in near-dup clusters, documents REMOVED under
  // keep-min-id canonicalization, and the token mass freed (integer
  // ppm, HUGEINT-widened — the Mix overflow discipline). Composes the
  // q62 banded pairs through the q121 closure; the oracle replays the
  // identical recursive-CTE closure and aggregates over the same thin
  // (doc_id, source, toks) projection.
  val q204 = Q(
    "q204_dedup_savings",
    s"""WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM ($q62PairsSql)),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM p
       |      UNION SELECT doc_b, doc_a FROM p),
       |reach(id, r) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a),
       |comp AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
       |d AS (SELECT doc_id, source,
       |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks
       | FROM documents),
       |j AS (SELECT d.doc_id, d.source, d.toks, comp.cluster_id
       |      FROM d LEFT JOIN comp ON d.doc_id = comp.id),
       |g AS (SELECT source,
       |  CAST(count(*) AS BIGINT) AS docs_total,
       |  CAST(sum(CASE WHEN cluster_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_dup,
       |  CAST(sum(CASE WHEN cluster_id IS NOT NULL AND doc_id <> cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS docs_removed,
       |  CAST(sum(toks) AS BIGINT) AS tokens_total,
       |  CAST(sum(CASE WHEN cluster_id IS NOT NULL AND doc_id <> cluster_id THEN toks ELSE 0 END) AS BIGINT) AS tokens_removed
       | FROM j GROUP BY 1)
       |SELECT source, docs_total, docs_dup, docs_removed, tokens_total,
       | tokens_removed,
       | CAST(CAST(tokens_removed AS HUGEINT) * 1000000 // tokens_total AS BIGINT) AS removal_ppm
       |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashCandidates(docs).select(col("doc_a"), col("doc_b"))
    graft.operators.Components.savingsBySource(docs, pairs)
      .orderBy("source")
  }

  // ---- q205: cross-source duplicate-leakage matrix -----------------------
  // Which corpus copies from which: q62's near-dup pairs attributed to
  // unordered (source_x, source_y) cells — a hot off-diagonal cell is a
  // mirror site / cross-crawl leak, a hot diagonal cell is internal
  // duplication. est_jaccard is m/32 (exact dyadic double), so the cell
  // mean is integer-exact until ONE rounded division on both engines.
  val q205 = Q(
    "q205_source_leakage",
    s"""WITH pr AS (SELECT doc_a, doc_b, est_jaccard FROM ($q62PairsSql)),
       |mt AS (SELECT doc_id, source FROM documents),
       |px AS (SELECT least(ma.source, mb.source) AS source_x,
       |        greatest(ma.source, mb.source) AS source_y,
       |        CAST(round(est_jaccard * 32, 0) AS BIGINT) AS slots
       |       FROM pr JOIN mt ma ON pr.doc_a = ma.doc_id
       |               JOIN mt mb ON pr.doc_b = mb.doc_id)
       |SELECT source_x, source_y, CAST(count(*) AS BIGINT) AS n_pairs,
       | round(CAST(sum(slots) AS DOUBLE) / (count(*) * 32), 6) AS avg_est_jaccard
       |FROM px GROUP BY 1, 2
       |ORDER BY source_x, source_y""".stripMargin) { (s, d) =>
    Dedup.crossSourceLeakage(Tables.documents(s, d))
      .orderBy("source_x", "source_y")
  }

  // ---- q206: per-language tokenizer fertility ----------------------------
  // The standard multilingual tokenizer evaluation (mT5 §3.2 / Rust et
  // al. ACL'21): subwords-per-word and chars-per-token per language
  // under the trained merge list — the fairness table read before
  // committing a 100 TB encode. Spark runs the native bpe_encode kernel
  // over the DISTINCT-word vocab (|vocab|·M, never corpus·M); the
  // oracle replays the q179/q182 unrolled serial CTEs and joins the
  // same per-(lang, word) usage.
  val q206 = Q(
    "q206_tokenizer_fertility",
    bpeOracleCtes(bpeRounds) +
      s""",
         |sub AS (SELECT word, CAST(len(word) AS BIGINT) AS wchars,
         |        CAST(len(syms) AS BIGINT) AS n_sub FROM v$bpeRounds),
         |dl AS (SELECT lang, coalesce(list_filter($WORDS, x -> x <> ''), []) AS w FROM documents),
         |lw AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS cw
         |       FROM (SELECT lang, unnest(w) AS word FROM dl)
         |       WHERE regexp_full_match(word, '[a-z0-9]+') GROUP BY 1, 2),
         |f AS (SELECT lang, CAST(sum(cw) AS BIGINT) AS n_words,
         |       CAST(sum(cw * n_sub) AS BIGINT) AS n_tokens,
         |       CAST(sum(cw * wchars) AS BIGINT) AS n_chars
         |      FROM lw JOIN sub USING (word) GROUP BY 1)
         |SELECT lang, n_words, n_tokens, n_chars,
         | round(CAST(n_tokens AS DOUBLE) / n_words, 6) AS fertility,
         | round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token
         |FROM f ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // ONE corpus words pass: the per-(lang, word) usage table feeds
    // training (summed over langs — charVocab's alphabet filter makes
    // the training vocabulary identical to a wordFreq-derived one) and
    // the fertility report (r17 opt)
    val usage = graft.operators.Bpe.usageByLang(docs).localCheckpoint(true)
    val merges = graft.operators.Bpe
      .trainMergesBatchedWf(
        usage.groupBy(col("word")).agg(sum(col("cw")).as("freq")),
        rounds = bpeRounds, batch = 3)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    require(merges.length == bpeRounds,
      s"BPE training exhausted after ${merges.length}/$bpeRounds rounds — " +
        "corpus too small for the unrolled oracle; lower bpeRounds")
    graft.operators.Bpe.fertilityFromUsage(usage, merges)
      .orderBy("lang")
  }

  // ---- q207: classifier-based quality filtering --------------------------
  // The model-in-the-loop quality gate (CCNet's fastText classifier,
  // FineWeb-Edu's scorer): label a SEED split (here: four sources stand
  // in for the curated corpus — the q128 evalDocPred posture), learn
  // per-word integer odds weights from it, score every document as the
  // integer weighted mean of its word weights. No logs, no floats —
  // the whole train→deploy composition is exact int64/HUGEINT
  // arithmetic, so it rides the FULL oracle end-to-end (a
  // log-likelihood NB could not: libm ln is not engine-exact).
  // shared seed split + classifier CTE chains (q207 scores, q208/q209
  // deciles): cs = (doc_id, n_scored, score_ppm); the decile chain adds
  // csd = (doc_id, decile) via the distinct-score histogram cumsum —
  // the exact arithmetic Classifier.fitOdds/scoreAgainst/withDeciles
  // run, so all three queries gate the same operator text
  private val clfSeed = Seq("src0", "src1", "src2", "src3")
  private val clfSeedSql = clfSeed.map(s => s"'$s'").mkString(", ")

  private def clfOracleCtes(from: String = "documents",
                            lead: String = "WITH "): String =
    s"""${lead}dw AS (SELECT doc_id, source IN ($clfSeedSql) AS is_pos,
       |        unnest(coalesce(list_filter($WORDS, x -> x <> ''), [])) AS word
       |      FROM $from),
       |fw AS MATERIALIZED (SELECT * FROM dw WHERE regexp_full_match(word, '[a-z0-9]+')),
       |wt AS (SELECT word,
       |        CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS cnt_pos,
       |        CAST(count(*) AS BIGINT) AS cnt_all
       |      FROM fw GROUP BY 1 HAVING count(*) >= 2),
       |w2 AS (SELECT word,
       |        CAST(CAST(cnt_pos AS HUGEINT) * 1000000 // cnt_all AS BIGINT) AS weight_ppm
       |      FROM wt),
       |dcw AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cw FROM fw GROUP BY 1, 2),
       |cs AS MATERIALIZED (SELECT doc_id, CAST(sum(cw) AS BIGINT) AS n_scored,
       |        CAST(sum(cw * weight_ppm) // sum(cw) AS BIGINT) AS score_ppm
       |      FROM dcw JOIN w2 USING (word) GROUP BY 1)""".stripMargin

  private val clfDecileCtes: String =
    s""",
       |h AS (SELECT score_ppm, CAST(count(*) AS BIGINT) AS c FROM cs GROUP BY 1),
       |hc AS (SELECT score_ppm, coalesce(sum(c) OVER (ORDER BY score_ppm
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM h),
       |cn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cs),
       |dec AS (SELECT score_ppm, CAST(cb * 10 // n AS BIGINT) AS decile FROM hc, cn),
       |csd AS (SELECT cs.doc_id, dec.decile FROM cs JOIN dec USING (score_ppm))""".stripMargin

  val q207 = Q(
    "q207_quality_classifier",
    clfOracleCtes() +
      s"""
         |SELECT doc_id, n_scored, score_ppm FROM cs
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Classifier.trainScore(Tables.documents(s, d),
        col("source").isin(clfSeed: _*), minDf = 2)
      .orderBy("doc_id")
  }

  // ---- q208: quality-signal agreement matrix -----------------------------
  // Do the two quality signals agree? Cross-tab of q194's CCNet
  // perplexity buckets (LM signal) against q207's classifier deciles
  // (seed-set signal) — the calibration artifact read before choosing
  // which gate (or both, the CCNet paper's recommendation) filters a
  // 100 TB corpus. Docs with no in-vocabulary classifier words land in
  // decile -1 (absence is its own bucket — the stated q207 contract).
  // FULL oracle: q194's replayed CTE chain joined to q207's, both
  // integer-exact; the cross-tab is counts + token sums only.
  val q208 = {
    val V = 16
    Q(
      "q208_quality_agreement",
      ccnetOracleCtes(V) +
        clfOracleCtes(lead = ",\n") + clfDecileCtes +
        s""",
           |x AS (SELECT bk.bucket,
           |        CAST(coalesce(csd.decile, -1) AS BIGINT) AS clf_decile,
           |        bk.n_tokens
           |      FROM bk LEFT JOIN csd ON bk.doc_id = csd.doc_id)
           |SELECT bucket, clf_decile, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(n_tokens) AS BIGINT) AS tokens_total
           |FROM x GROUP BY 1, 2
           |ORDER BY bucket, clf_decile""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // the LM branch (CCNet counts fit) and the classifier branch
      // (trainScore + decile checkpoint) are INDEPENDENT eager chains
      // over the same corpus — overlap them from the driver pool
      // (guide §2.6) instead of paying both fit latencies serially
      val Seq(ccnet, clf) = graft.operators.Overlap.build(Seq(
        () => graft.operators.LmScore.ccnetBuckets(docs, v = V)
          .select(col("doc_id"), col("n_tokens"), col("bucket")),
        () => graft.operators.Classifier.withDeciles(
          graft.operators.Classifier.trainScore(docs,
            col("source").isin(clfSeed: _*), minDf = 2))))
      ccnet.join(clf.select(col("doc_id"), col("decile")), Seq("doc_id"), "left")
        .select(col("bucket"),
          coalesce(col("decile"), lit(-1L)).as("clf_decile"),
          col("n_tokens"))
        .groupBy(col("bucket"), col("clf_decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens_total"))
        .orderBy("bucket", "clf_decile")
    }
  }

  // ---- q209: corpus build v3 (dedup → classifier gate → CCNet → shards) --
  // q200 plus the stage every 2024-era pipeline added between dedup and
  // perplexity bucketing: the CLASSIFIER gate (q207 — FineWeb-Edu's
  // recipe: dedup first, then the model-based filter, then curriculum).
  // Keep-best survivors train the seed classifier; docs below rank
  // decile 3 drop, as do unscored docs (no in-vocabulary words = no
  // quality evidence — the stated q207 contract); the CCNet LM then
  // fits on the TWICE-filtered corpus and its kept bands lay out into
  // annealed curriculum shards. Every stage's fit artifact is
  // construction-materialized corpus-thin state; the packer never
  // touches text. FULL oracle: q200's chain + the shared classifier
  // CTEs (from = surv) + the decile cut, integer-exact end to end.
  val q209 = {
    val V = 16; val L = 128; val BPS = 4; val SEED = 23L
    val ST = BPS.toLong * L
    val MinDecile = 3
    Q(
      "q209_corpus_build_v3",
      s"""WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM ($q62PairsSql)),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p
         |      UNION SELECT doc_b, doc_a FROM p),
         |reach(id, r) AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a),
         |comp AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
         |qm AS (SELECT doc_id,
         |   CAST(len(w) AS INTEGER) AS n_words,
         |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS sr6,
         |   CASE WHEN len(w) = 0 THEN CAST(0 AS BIGINT) ELSE (2 * CAST(len(list_filter(w, x -> length(x) < 3)) AS BIGINT) * 1000000 + len(w)) // (2 * len(w)) END AS shr6
         |  FROM (SELECT doc_id, $WORDS AS w FROM documents)),
         |ql AS (SELECT doc_id,
         |   CASE WHEN n_words = 0 THEN 0.0 ELSE CAST((2 * (least(CAST(n_words AS BIGINT) * 20000, 4000000) + 3 * sr6 + 3000000 - 3 * shr6) + 1000) // 2000 AS BIGINT) / 10000.0 END AS quality
         |  FROM qm),
         |losers AS (SELECT doc_id FROM (
         |    SELECT comp.id AS doc_id, row_number() OVER
         |      (PARTITION BY cluster_id ORDER BY ql.quality DESC, comp.id) AS rn
         |    FROM comp JOIN ql ON ql.doc_id = comp.id)
         |  WHERE rn > 1),
         |surv AS MATERIALIZED (SELECT d0.doc_id, d0.source, d0.lang, d0.text FROM documents d0
         |         LEFT JOIN losers USING (doc_id) WHERE losers.doc_id IS NULL),
         |${clfOracleCtes(from = "surv", lead = "")}$clfDecileCtes,
         |surv2 AS (SELECT surv.doc_id, surv.lang, surv.text
         |          FROM surv JOIN csd USING (doc_id)
         |          WHERE csd.decile >= $MinDecile),
         |${ccnetOracleCtes(V, from = "surv2", lead = "")},
         |kept AS (SELECT doc_id, n_tokens,
         |          CASE WHEN bucket = 'middle' THEN 0 ELSE 1 END AS band_rank
         |         FROM bk WHERE bucket <> 'tail'),
         |pd AS (SELECT doc_id, n_tokens, band_rank,
         |        ((doc_id % 2147483647) * 2654435761 + $SEED) % 2147483647 AS h FROM kept),
         |pc AS (SELECT doc_id, n_tokens, band_rank, h,
         |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY band_rank, h, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gs
         |       FROM pd),
         |pe AS (SELECT doc_id, gs, n_tokens, gs // $ST AS first_shard,
         |        (gs + n_tokens - 1) // $ST AS last_shard FROM pc),
         |px AS (SELECT pe.*, CAST(sh AS BIGINT) AS shard_id
         |       FROM pe, unnest(range(first_shard, last_shard + 1)) AS u(sh))
         |SELECT shard_id,
         |  CAST(sum(CASE WHEN first_shard = shard_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_starting,
         |  CAST(count(*) AS BIGINT) AS n_docs_touching,
         |  CAST(sum(least(gs + n_tokens, (shard_id + 1) * $ST) - greatest(gs, shard_id * $ST)) AS BIGINT) AS n_tokens,
         |  shard_id * $BPS AS first_bin,
         |  least(max((gs + n_tokens - 1) // $L), (shard_id + 1) * $BPS - 1) AS last_bin
         |FROM px GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val kb = Dedup.keepBest(docs, Dedup.minhashCandidates(docs))
      // cluster-member-sized, materialized ONCE: surv has THREE eager
      // consumers downstream (classifier fit, decile histogram, ccnet
      // scored-thin) — an unmaterialized loser set re-runs the whole
      // keepBest scoring pipeline per consumer
      val losers = kb.filter(col("kept") === 0).select(col("doc_id"))
        .localCheckpoint(true)
      val surv = docs.join(broadcast(losers), Seq("doc_id"), "left_anti")
      // classifier gate on the DEDUPLICATED corpus (fit artifact
      // materializes at construction, the trainScore posture); the
      // unscored (left-semi misses nothing: unscored docs are absent
      // from the decile table, so they drop here by construction)
      val keepIds = graft.operators.Classifier.withDeciles(
          graft.operators.Classifier.trainScore(surv,
            col("source").isin(clfSeed: _*), minDf = 2))
        .filter(col("decile") >= MinDecile)
        .select(col("doc_id"))
      val surv2 = surv.join(keepIds, Seq("doc_id"), "left_semi")
      val kept = graft.operators.LmScore.ccnetBuckets(surv2, v = V)
        .filter(col("bucket") =!= "tail")
        .withColumn("band_rank",
          when(col("bucket") === "middle", 0L).otherwise(1L))
        .select(col("doc_id"), col("n_tokens"), col("band_rank"))
        .localCheckpoint()
      graft.operators.Pack
        .shardManifestCounted(kept, seqLen = L, binsPerShard = BPS,
          seed = SEED, orderPrefix = Seq("band_rank"))
        .orderBy("shard_id")
    }
  }

  // ---- q212: classifier bias audit ----------------------------------------
  // Does the seed classifier just memorize its seed sources? Mean
  // classifier score per source with the seed flag attached — seed
  // sources scoring far above every non-seed source is the known
  // failure mode of seed-set quality classifiers (the reason
  // FineWeb-Edu audits its scorer against held-out raters). Integer
  // mean discipline: sum(score_ppm) runs widened, mean = sum div n —
  // exact on both engines. The source attribution reads a corpus-thin
  // checkpointed (doc_id, source) projection (one in-plan scan).
  val q212 = Q(
    "q212_classifier_bias",
    clfOracleCtes() +
      s""",
         |mt AS (SELECT doc_id, source, source IN ($clfSeedSql) AS is_seed FROM documents),
         |j AS (SELECT mt.source, mt.is_seed, cs.score_ppm FROM cs JOIN mt USING (doc_id))
         |SELECT source, is_seed, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(score_ppm) // count(*) AS BIGINT) AS mean_score_ppm
         |FROM j GROUP BY 1, 2
         |ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val meta = docs.select(col("doc_id"), col("source"),
      col("source").isin(clfSeed: _*).as("is_seed")).localCheckpoint(true)
    graft.operators.Classifier.trainScore(docs, col("source").isin(clfSeed: _*))
      .select(col("doc_id"), col("score_ppm"))
      .join(meta, Seq("doc_id"))
      .groupBy(col("source"), col("is_seed"))
      .agg(count(lit(1)).as("n_docs"),
        expr("cast(sum(cast(score_ppm as decimal(38,0))) div count(1) as bigint)")
          .as("mean_score_ppm"))
      .orderBy("source")
  }

  // ---- q210: matryoshka truncation agreement ------------------------------
  // MRL (Kusupati et al. NeurIPS'22): can retrieval run on the first 16
  // of 64 coordinates? Per query, top-1 under full cosine vs top-1
  // under truncated-prefix cosine (cosine of slices IS renormalized
  // truncation), with the truncated pick's FULL-dim similarity — the
  // quality the cheap index actually delivers. The q64 determinism
  // discipline (round-4 doubles, cid tie-break) makes both picks
  // SQL-replayable; brute posture by declared design (the q64 class).
  val q210 = {
    val D = 16
    Q(
      "q210_matryoshka",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 10),
         |sims AS (SELECT qid, c.vec_id AS cid,
         |          round(list_cosine_similarity(qe, c.emb), 4) AS sim_full,
         |          round(list_cosine_similarity(qe[1:$D], c.emb[1:$D]), 4) AS sim_trunc
         |        FROM q JOIN e c ON qid <> c.vec_id),
         |rk AS (SELECT qid, cid, sim_full,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim_full DESC, cid) AS rf,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim_trunc DESC, cid) AS rt
         |       FROM sims),
         |a AS (SELECT qid,
         |        max(CASE WHEN rf = 1 THEN cid END) AS full_cid,
         |        max(CASE WHEN rf = 1 THEN sim_full END) AS full_sim,
         |        max(CASE WHEN rt = 1 THEN cid END) AS trunc_cid,
         |        max(CASE WHEN rt = 1 THEN sim_full END) AS trunc_full_sim
         |      FROM rk WHERE rf = 1 OR rt = 1 GROUP BY 1)
         |SELECT qid, full_cid, full_sim, trunc_cid, trunc_full_sim,
         | full_cid = trunc_cid AS agree
         |FROM a ORDER BY qid""".stripMargin) { (s, d) =>
      val embs = Tables.embeddings(s, d)
      Ann.matryoshkaAgreement(embs, embs.filter(col("vec_id") < 10), dims = D)
        .orderBy("qid")
    }
  }

  // ---- q211: dedup ROI curve ----------------------------------------------
  // What does each dedup operating point buy? Corpus-wide removal at a
  // sweep of minhash thresholds (every sweep point a m/32 dyadic — the
  // est comparisons are float-exact on both engines): q155 calibrates
  // the threshold against ground truth, this PRICES each choice in
  // docs/tokens removed. One candidate table serves every threshold
  // (the q189 built-once discipline); each threshold pays only its own
  // near-dup-sized pair closure — never a second corpus scan.
  val q211 = {
    val thresholds = Seq(0.5, 0.625, 0.75, 0.875)
    def chain(t: Double): String = {
      val g = math.round(t * 32).toString
      s"""p_$g AS (SELECT doc_a, doc_b FROM pr WHERE est_jaccard >= $t),
         |e_$g AS (SELECT doc_a AS a, doc_b AS b FROM p_$g
         |         UNION SELECT doc_b, doc_a FROM p_$g),
         |r_$g(id, r) AS (
         |  SELECT a, b FROM e_$g
         |  UNION
         |  SELECT r_$g.id, e_$g.b FROM r_$g JOIN e_$g ON r_$g.r = e_$g.a),
         |c_$g AS (SELECT id, least(id, min(r)) AS cluster_id FROM r_$g GROUP BY id),
         |s_$g AS (SELECT CAST($t AS DOUBLE) AS threshold,
         |         (SELECT CAST(count(*) AS BIGINT) FROM p_$g) AS n_pairs,
         |         CAST(count(*) AS BIGINT) AS docs_removed,
         |         CAST(coalesce(sum(d.toks), 0) AS BIGINT) AS tokens_removed
         |       FROM c_$g JOIN d ON c_$g.id = d.doc_id
         |       WHERE c_$g.id <> c_$g.cluster_id)""".stripMargin
    }
    Q(
      "q211_dedup_roi",
      s"""WITH RECURSIVE pr AS MATERIALIZED (SELECT doc_a, doc_b, est_jaccard FROM ($q62PairsSql)),
         |d AS MATERIALIZED (SELECT doc_id,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks
         | FROM documents),
         |tt AS (SELECT CAST(sum(toks) AS BIGINT) AS tokens_total FROM d),
         |${thresholds.map(chain).mkString(",\n")}
         |SELECT threshold, n_pairs, docs_removed, tokens_removed,
         | CAST(CAST(tokens_removed AS HUGEINT) * 1000000
         |   // (SELECT tokens_total FROM tt) AS BIGINT) AS removal_ppm
         |FROM (${thresholds.map(t => s"SELECT * FROM s_${math.round(t * 32)}")
            .mkString(" UNION ALL ")})
         |ORDER BY threshold""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val meta = docs.select(col("doc_id"),
        expr("cast(size(split(trim(text), '\\\\s+')) as bigint)").as("toks"))
        .localCheckpoint(true)
      val pairs = Dedup.minhashCandidates(docs).localCheckpoint(true)
      graft.operators.Components.roiSweep(meta, pairs, thresholds)
        .orderBy("threshold")
    }
  }

  val all: Seq[Q] = Seq(q60, q61, q62, q63, q64, q65, q66, q67, q68, q69, q70, q71, q87, q90, q93, q104, q119, q120, q121, q125, q126, q127, q128, q131, q136, q137, q138, q140, q141, q142, q145, q152, q155, q161, q162, q163, q164, q165, q175, q176, q177, q178, q179, q180, q181, q182, q187, q188, q189, q190, q191, q192, q193, q194, q195, q196, q197, q198, q199, q200, q201, q202, q203, q204, q205, q206, q207, q208, q209, q210, q211, q212, q214, q215, q216, q217, q218, q219, q220, q221, q222, q223, q224, q225)
}
