package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.PlanExpression
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

import graft._

/** Plan-quality sweep: print each query's join strategies and shuffle
  * topology so accidental nested-loop joins / missed broadcasts / lost
  * pushdowns show up as a one-line diff.
  *
  * Counts are STRUCTURAL (tree traversal), not string matches, for two
  * reasons found the hard way:
  *
  *  - The r5 string count of "Exchange hashpartitioning" reported 30
  *    exchanges for q128 when the executed topology has ~8: the plan
  *    STRING reprints a cached index's whole build subtree at every
  *    InMemoryRelation occurrence (3× for the dedup shingle index).
  *    Here each distinct cached relation's build plan is counted ONCE
  *    (it executes once), and AQE wrappers / physical subqueries are
  *    traversed instead of string-scanned.
  *  - The r5 global-window regex required a single non-space token
  *    before ASC/DESC and missed the `Window.partitionBy()` spelling
  *    entirely (q155) — exactly the kind of dodge an audit tool must
  *    not allow. Windows are detected on the catalyst node's empty
  *    partitionSpec, and every detected global window must be
  *    registered in [[boundedWhitelist]] with a bounded-by-construction
  *    justification, or the audit exits non-zero.
  */
object PlanAudit {

  /** Count of un-partitioned Window operators. Catches every spelling —
    * Window.orderBy(...), Window.partitionBy() (empty varargs),
    * multi-token ordering expressions — because it inspects the node's
    * partitionSpec, not the plan text; and catches windows INSIDE
    * cached/persisted subtrees (an operator that persists and returns a
    * materialized frame leaves the outer optimizedPlan as a bare
    * InMemoryRelation leaf — the logical-only check had a structural
    * false negative there) because the physical traversal descends into
    * each cached relation's build plan.
    */
  def globalWindows(df: DataFrame): Int = {
    val logical = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.size
    val physical = structuralCounts(df.queryExecution.executedPlan)._3
    // the outer query's windows appear in BOTH trees (1:1); cached
    // subtrees appear only in the physical traversal — take the max,
    // never the sum, to avoid double-counting the outer ones
    math.max(logical, physical)
  }

  /** Queries allowed to carry a global window, each with the proof that
    * its window input is bounded by construction (rows at the window are
    * O(1)/O(partitions), never corpus-sized — SURVEY §6's ban is on
    * data-sized windows).
    */
  val boundedWhitelist: Map[String, String] = Map(
    "q140_bm25" -> "rank window runs AFTER limit-first top-k: input <= 10 rows",
    "q215_hybrid_rrf" ->
      "all three rank windows run AFTER limit-first top-k (the q140 idiom): two <= 20-row ranker lists + the <= 10-row fused list",
    "q220_hybrid_search" ->
      "lexical rank window runs AFTER limit-first top-k (the q140 idiom): input <= 20 rows; the fused rank window is qid-partitioned over <= 2*depth rows per probe",
    "q223_hybrid_indexed_recall" ->
      "both lexical rank windows run AFTER limit-first top-k (the q140 idiom): input <= 20 rows each; the fused rank windows are qid-partitioned over <= 2*depth rows per probe",
    "q224_bm25_index" ->
      "rank window runs AFTER limit-first top-k (the q140 idiom): input <= 10 rows",
    "q225_filtered_hybrid" ->
      "lexical rank window runs AFTER limit-first top-k over the predicate-pruned corpus (the q220 idiom): input <= 20 rows; fused rank window qid-partitioned over <= 2*depth rows per probe",
    "q155_dedup_threshold_calibration" ->
      "max(f1) over () on the threshold sweep: input = 13 sweep rows",
    "q163_sequence_packing" ->
      "global window on per-partition pack summaries: input <= #partitions rows",
    "q181_shard_manifest" ->
      "global window on per-partition pack summaries: input <= #partitions rows (the q163 two-phase prefix sum)",
    "q190_corpus_build" ->
      "global window on per-partition pack summaries over the BUDGET-sized kept table: input <= #partitions rows",
    "q195_tokenized_packing" ->
      "global window on per-partition pack summaries over the checkpointed counted table: input <= #partitions rows (the q163 two-phase prefix sum)",
    "q196_curriculum_build" ->
      "global window on per-partition pack summaries over the checkpointed kept-band table: input <= #partitions rows (the q163 two-phase prefix sum)",
    "q197_sql_front_door" ->
      "global window on per-partition pack summaries inside the graft_pack branch: input <= #partitions rows (the q163 two-phase prefix sum)",
    "q200_corpus_build_v2" ->
      "global window on per-partition pack summaries over the checkpointed kept-band table: input <= #partitions rows (the q163 two-phase prefix sum)",
    "q208_quality_agreement" ->
      "decile cumsum runs on the DISTINCT-score histogram: input <= 1e6+1 rows by value range (score_ppm is an integer ppm), never corpus rows",
    "q209_corpus_build_v3" ->
      "global window on per-partition pack summaries over the checkpointed kept-band table: input <= #partitions rows (the q163 two-phase prefix sum; the classifier-decile window materializes at construction)")

  /** Queries allowed a BroadcastNestedLoopJoin / CartesianProduct, each
    * with the proof the nested-loop side is bounded. Everything else
    * must equi-join — an unlisted BNLJ is the classic accidental-
    * cross-join scale killer and fails the audit. (The r5 judge checked
    * this list by hand against PLANS; now the audit enforces it.)
    */
  val bnljWhitelist: Map[String, String] = Map(
    "q10_cross_join" -> "the operator under test IS a cross join; dim x dim (5 x 25 rows)",
    "q17_scalar_subquery" -> "scalar subquery: single-row threshold side",
    "q64_embedding_knn_brute" ->
      "DECLARED brute-force correctness baseline; scale path is q65/q87/q138/q142",
    "q216_ann_recall" ->
      "the exact-baseline ranking being graded IS q64's declared brute side (bounded 10-query broadcast); recall is graded against it by definition",
    "q217_nn_label_agreement" ->
      "q64's declared brute side (bounded 25-probe broadcast); any index face substitutes at scale",
    "q210_matryoshka" ->
      "DECLARED brute posture (the q64 class): broadcast query side, one corpus scan ranks both metrics",
    "q211_dedup_roi" ->
      "single-row totals per sweep point (n_pairs count + corpus token total — the q136 idiom), 2 per threshold x 4 thresholds",
    "q198_contrastive_mining" ->
      "bounded planted anchor set (10 rows, broadcast) x corpus — the q64 brute posture; scale path mines candidates via the LSH/IVF family first",
    "q82_tpch_q22" -> "scalar subquery: single-row avg-balance threshold",
    "q87_ivf_ann" -> "bounded planted query set (10 rows) x centroid model",
    "q99_kmv_theta" -> "k-sized sketch state cross join (k = 256 rows)",
    "q123_gap_fill" -> "single-row min/max bounds x generated spine",
    "q136_tfidf" -> "single-row corpus doc-count side",
    "q137_split_drift" -> "single-row per-split totals side",
    "q140_bm25" -> "single-row corpus stats (N, avgdl) side",
    "q215_hybrid_rrf" ->
      "single-row corpus stats (N, avgdl) side — the q140 idiom, once per ranker",
    "q220_hybrid_search" ->
      "three bounded sides: single-row corpus stats (the q140 idiom), the 3-probe brute-cosine broadcast (q64's declared posture — any index face substitutes at scale), and the 3-probe-id x 20-row lexical-list fusion spine",
    "q222_filtered_ann" ->
      "DECLARED brute-force baseline of the FILTERED family (bounded 10-query broadcast x the predicate-pruned corpus); scale path = ivfSearchFiltered/pqSearchFiltered/nswSearchLshFiltered over the persisted index",
    "q224_bm25_index" ->
      "single-row corpus stats side (the q140 idiom), served from the persisted index's stats face",
    "q225_filtered_hybrid" ->
      "q220's bounded sides over the predicate-pruned corpus: single-row filtered-corpus stats, the 3-probe filtered-brute broadcast (q222's declared baseline — the filtered index faces substitute at scale), and the 3-probe-id x 20-row lexical fusion spine",
    "q223_hybrid_indexed_recall" ->
      "q220's bounded sides twice (grading runs BOTH fusions by definition): single-row corpus stats per ranker, the 3-probe brute baseline broadcast (the graded reference), and the 3-probe-id x 20-row lexical fusion spines",
    "q160_setdigest2" -> "k-sized KMV sketch sides (k = 256 rows)",
    "q165_lm_quality" -> "single-row totals (N) and single-row OOV log-prob sides",
    "q175_dsir" -> "single-row smoothing-totals side against the B-sized bucket count table",
    "q176_semdedup" -> "model-sized k-means assignment join (c = 16 centroid rows)",
    "q177_bpe_stats" -> "k-row merge-candidate side (k = 20) against the vocab table",
    "q178_hier_ivf_ann" ->
      "model-sized two-level assignment joins (cSuper = 8 and cChild = 8 centroid rows per level)",
    "q180_semantic_decontam" ->
      "model-sized k-means assignment join on the eval probe side (c = 16 centroid rows)",
    "q184_tpch_q11" -> "single-row total-value threshold side — TPC-H Q11's scalar subquery",
    "q208_quality_agreement" ->
      "single-row scored-doc-count side against the distinct-score histogram (the q136 total idiom)",
    "q193_mix_temperature" ->
      "single-row weight-total side against the stratum-sized (checkpointed) availability table",
    "q201_mix_alpha_sweep" ->
      "q193's single-row weight-total side, once per alpha branch (0.3 / 0.7) against the stratum-sized checkpointed availability tables",
    "q202_contrastive_from_index" ->
      "model-sized joins: the ivfFit/ivfEncode centroid assignment (c = 16 rows) and the queryProbes routing side — the q87 pattern",
    "q187_combined_decontam" ->
      "model-sized k-means assignment joins (c = 16 centroid rows) — the q180 semantic branch's encode + eval probe")

  /** Queries allowed to scan a source table more than once, each with
    * the proof the repetition is intentional — a semantically distinct
    * second pass (self-join role, set-operation branch, exact-vs-sketch
    * contract, thin-keys-then-wide) where each extra pass reads a
    * PRUNED projection that costs less than materializing the shared
    * input — not an accidental recompute of one projection (the r9
    * DSIR class this audit exists to catch; r10 closed that class in
    * q99/q118/q123/q136/q140/q160/q165/q175/q177/q93).
    */
  val multiScanWhitelist: Map[String, String] = {
    val subquery = "scalar/correlated-subquery semantics: a single-row " +
      "threshold side plus the detail side — materializing the corpus " +
      "to save the single-row pass costs more than the pruned rescan"
    val thinKeys = "thin-keys-then-wide: a thin key-selection pass picks " +
      "the top-n keys, the wide pass builds rows only for survivors — " +
      "the r6 q118 byte-diet idiom; the key pass reads 1-2 pruned columns"
    val sketchVsExact = "sketch-vs-exact output contract: the exact " +
      "column is part of the query's result, a semantically separate " +
      "aggregation pipeline over the same table"
    val selfJoin = "self-join semantics: the table plays two (or more) " +
      "distinct roles in the join"
    val fitEncode = "inline fit∘encode∘search oracle shape: training " +
      "pass + encoding pass; the deployment split persists the model/" +
      "index and pays each once (AnnIndexSpec pins the zero-training " +
      "search path)"
    Map(
      "q17_scalar_subquery" -> subquery,
      "q19_correlated_subquery" -> subquery,
      "q20_cte" -> "CTE referenced by two consumers — SQL semantics under test",
      "q82_tpch_q22" -> subquery,
      "q100_array_funcs2" -> thinKeys, "q101_map_funcs2" -> thinKeys,
      "q114_numeric_histogram" -> thinKeys, "q115_jsonpath_wildcard" -> thinKeys,
      "q149_cdf_funcs2" -> thinKeys, "q173_zip_regexp_split" -> thinKeys,
      "q103_geo_polygon" ->
        "per-nation envelope/centroid fit + point-membership test pass — two aggregate projections by contract",
      "q118_sparse_cosine" -> (thinKeys + " (2 scans: key pass + map pass)"),
      "q49_approx_sketches" -> sketchVsExact, "q57_hll_sketch_union" -> sketchVsExact,
      "q95_regression_aggs" ->
        "regression aggregates cross-checked against their window-based expansions — two aggregate pipelines by contract",
      "q134_set_aggs" ->
        "set-aggregate demo joins two independent aggregate projections of the corpus",
      "q135_classification_eval" ->
        "per-class eval side + global-stats side, two aggregate projections",
      "q137_split_drift" ->
        "per-split distributions + whole-corpus reference distribution, compared by contract",
      "q145_domain_quota" ->
        "quota fit (per-domain counts) + quota application pass — the operator's two phases",
      "q152_corpus_mix" ->
        "mix-weight fit (per-source counts) + sampling pass — the operator's two phases",
      "q163_sequence_packing" ->
        "pack-summary pass (per-partition prefix sums) + emit pass — the two-phase distributed prefix sum",
      "q197_sql_front_door" ->
        "two independent table-function branches over one view (pack = its two prefix-sum phases + quality) — the composition a SQL user writes; each branch reads a pruned projection",
      "q181_shard_manifest" ->
        "pack-summary pass (per-partition prefix sums) + emit pass — the two-phase distributed prefix sum",
      "q165_lm_quality" ->
        "model fit + scoring are the two-pass minimum (the DSIR fit/score posture); fit itself is one scan (persisted vocab counts)",
      "q155_dedup_threshold_calibration" ->
        "calibration runs BOTH pipelines by definition: exact truth (shingle self-join, 2 scans) + minhash candidates (1)",
      "q58_set_ops_all" ->
        "INTERSECT ALL/EXCEPT ALL branches: four operand derivations of the table — the operator under test",
      "q61_dedup_ngram_jaccard" -> selfJoin, "q63_dedup_simhash" -> selfJoin,
      "q88_interval_join" -> selfJoin,
      "q64_embedding_knn_brute" ->
        "corpus role + queries-drawn-from-corpus role (bounded planted query side)",
      "q65_embedding_knn_lsh" ->
        "corpus role + queries-drawn-from-corpus role (bounded planted query side)",
      "q216_ann_recall" ->
        "two ranker pipelines by definition (brute baseline + LSH candidate) — the q64 and q65 corpus/query role contracts composed; the grading join itself is rank-list-sized",
      "q217_nn_label_agreement" ->
        "corpus role + bounded probe role (the q64 contract); the label lookups read ONE checkpointed thin (vec_id, label) projection",
      "q220_hybrid_search" ->
        "embeddings x3: corpus role + bounded probe role (the q64 contract) + the 3-row probe-id spine for per-probe fusion — both extra passes are id-pruned to the probe set",
      "q222_filtered_ann" ->
        "corpus role (predicate-pruned at the scan) + bounded probe role drawn from the same table (the q64 contract)",
      "q223_hybrid_indexed_recall" ->
        "embeddings x6: the q216 grading contract (brute baseline + LSH candidate ranker pipelines) composed with the q220 fusion roles (corpus + bounded probe + probe-id spine per ranker) — every extra pass is id-pruned to the 3-probe set",
      "q225_filtered_hybrid" ->
        "documents x2 (predicate-pruned lexical corpus role + the thin (doc_id, lang) metadata projection riding the vector side's filter) and embeddings x3 (the q220 corpus/probe/spine roles) — every extra pass is pruned to 2 columns or the probe set",
      "q219_corpus_diff" ->
        "snapshot-diff contract: old-version role + new-version role of the same table (the registered query derives the new snapshot in ONE array-explode pass; real deployments diff two distinct snapshot tables, one scan each)",
      "q210_matryoshka" ->
        "corpus role + queries-drawn-from-corpus role (bounded planted query side — the q64 shape)",
      "q198_contrastive_mining" ->
        "corpus role + two id-pruned bounded derivations (anchors, their planted twins) drawn from the same table",
      "q71_dedup_embedding_cosine" -> selfJoin,
      "q87_ivf_ann" -> fitEncode, "q138_pq_ann" -> fitEncode,
      "q202_contrastive_from_index" -> (fitEncode +
        "; plus the bounded anchor and planted-twin derivations drawn from the same table (the q198 roles)"),
      "q201_mix_alpha_sweep" ->
        "two alpha parameterizations (0.3 / 0.7) of one counted pass each, unioned by contract — each branch's availability fit is checkpointed so the corpus is read once per branch",
      "q188_pq_ann_rotated" -> fitEncode,
      "q176_semdedup" -> fitEncode, "q178_hier_ivf_ann" -> fitEncode,
      "q180_semantic_decontam" -> (fitEncode +
        "; here the second embeddings scan is the eval probe side drawn from the same table"),
      "q128_decontamination" ->
        "train split + eval split drawn from the same table: two roles by contract",
      "q187_combined_decontam" ->
        "the union of its branches' contracts: documents x2 is q128's train/eval split roles, embeddings x2 is q180's fit∘encode + eval-probe roles — each branch persists its own projection, one scan per role",
      "q124_funnel" ->
        "per-stage type-pruned scans, ADJUDICATED over the 1-scan window form: the window ships every event through one exchange (1.65 MB) where each staged scan map-side-combines to per-user minima before shuffling (0.09 MB) — shuffle bytes dominate at scale",
      "q72_tpch_q7" -> "nation plays two roles (supplier nation, customer nation) — TPC-H Q7 semantics",
      "q73_tpch_q8" -> "nation plays two roles — TPC-H Q8 semantics",
      "q79_tpch_q15" -> "revenue view consumed twice (view + its max) — TPC-H Q15 semantics",
      "q81_tpch_q21" -> "lineitem plays three roles (l1, l2, l3) and orders two — TPC-H Q21 semantics",
      "q93_pipeline_e2e" ->
        "canonical-id pass + detail pass, ADJUDICATED over the 1-scan window form: the window ships corpus TEXT through its exchange where this shape shuffles 32-byte hashes — shuffle bytes dominate at scale")
  }

  private val joinClasses = Set(
    "BroadcastHashJoinExec", "SortMergeJoinExec", "ShuffledHashJoinExec",
    "BroadcastNestedLoopJoinExec", "CartesianProductExec")

  /** Shared structural walker: visits every node of the plan's true
    * execution topology — descends into the AQE wrapper's input plan,
    * physical subquery plans, and each DISTINCT cached relation's
    * build plan exactly once (it executes once).
    */
  private def walk(root: SparkPlan)(f: SparkPlan => Unit): Unit = {
    val seenCaches = mutable.Set[AnyRef]()
    def visit(p: SparkPlan): Unit = p.foreach { node =>
      node match {
        // initialPlan, not inputPlan: exchanges are only inserted by the
        // stage-preparation rules (EnsureRequirements) that produce it
        case a: AdaptiveSparkPlanExec => visit(a.initialPlan)
        case s: InMemoryTableScanExec =>
          if (seenCaches.add(s.relation.cacheBuilder)) visit(s.relation.cachedPlan)
        case _ => f(node)
      }
      node.expressions.foreach(_.foreach {
        case pe: PlanExpression[_] => pe.plan match {
          case sp: SparkPlan => visit(sp)
          case _ => ()
        }
        case _ => ()
      })
    }
    visit(root)
  }

  /** (join-class → count, shuffle-exchange count, un-partitioned-window
    * count) over the plan's true execution topology.
    */
  def structuralCounts(root: SparkPlan): (Map[String, Int], Int, Int) = {
    val joins = mutable.Map.empty[String, Int].withDefaultValue(0)
    var exchanges = 0
    var globalWins = 0
    walk(root) {
      case _: ShuffleExchangeExec => exchanges += 1
      case w: WindowExec if w.partitionSpec.isEmpty => globalWins += 1
      case n if joinClasses(n.getClass.getSimpleName) =>
        val k = n.getClass.getSimpleName.stripSuffix("Exec")
        joins(k) = joins(k) + 1
      case _ => ()
    }
    (joins.toMap, exchanges, globalWins)
  }

  /** Scans per SOURCE TABLE (file-scan leaves, keyed by the parquet
    * file's basename) over the true execution topology — cached builds
    * counted once. A table appearing N ≥ 2 times means the query
    * recomputes a projection of it N times (the r9 DSIR finding: 3
    * corpus scans where 1 + a persisted occurrence table suffices) —
    * at 100 TB a repeated scan IS the dominant cost, so every
    * multi-scan must be whitelisted with its justification or the
    * audit exits non-zero.
    *
    * KNOWN BLIND SPOT (documented, not fixable at this layer):
    * driver-looped training queries (q179 trainMerges — its result is
    * a collected local table; q182's training phase; every ivfFit-
    * style centroid collect) and checkpoint-fronted compositions
    * (q190's mix stage, localCheckpointed so the pack plan stays
    * visible) execute their corpus scans at query CONSTRUCTION,
    * before the returned plan exists — the audit sees a
    * LocalTableScan or only the final apply pass. Scan regressions
    * inside those loops are covered by their operator specs (BpeSpec's
    * vocab-sized-round assertions, AnnIndexSpec's zero-training-jobs
    * count), by each query's shuffle-byte row (a new corpus scan with
    * a shuffle shows there), and by wall-clock in the bench record,
    * not by this counter.
    */
  def tableScans(root: SparkPlan): Map[String, Int] = {
    val scans = mutable.Map.empty[String, Int].withDefaultValue(0)
    walk(root) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        val name = s.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        scans(name) = scans(name) + 1
      case _ => ()
    }
    scans.toMap
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // optional regex filter (same knob as Bench) for single-query checks
    val filter = sys.env.get("SPARK_GRAFT_FILTER").map(_.r)
    var violations = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filter.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        val (joinCounts, exchanges, _) = structuralCounts(df.queryExecution.executedPlan)
        val joins = joinCounts.toSeq.sortBy(_._1).map { case (k, n) => s"$k x$n" }
        val globalWin = globalWindows(df)
        val winFlag =
          if (globalWin == 0) ""
          else boundedWhitelist.get(name) match {
            case Some(reason) => s" globalWindow=$globalWin (bounded: $reason)"
            case None =>
              violations ::= name
              s" globalWindow=$globalWin UNBOUNDED-NOT-WHITELISTED"
          }
        val nlCount = joinCounts.getOrElse("BroadcastNestedLoopJoin", 0) +
          joinCounts.getOrElse("CartesianProduct", 0)
        val nlFlag =
          if (nlCount == 0) ""
          else bnljWhitelist.get(name) match {
            case Some(reason) => s" nestedLoop (bounded: $reason)"
            case None =>
              violations ::= name
              " nestedLoop UNBOUNDED-NOT-WHITELISTED"
          }
        val scans = tableScans(df.queryExecution.executedPlan)
        val scanStr = scans.toSeq.sortBy(_._1)
          .map { case (t, n) => if (n > 1) s"$t x$n" else t }.mkString(",")
        val multi = scans.filter(_._2 > 1)
        val scanFlag =
          if (multi.isEmpty) s" scans=$scanStr"
          else multiScanWhitelist.get(name) match {
            case Some(reason) => s" scans=$scanStr (multi ok: $reason)"
            case None =>
              violations ::= name
              s" scans=$scanStr MULTI-SCAN-NOT-WHITELISTED"
          }
        println(f"[plan] $name%-28s ${joins.mkString(", ")}%-60s shuffles=$exchanges$winFlag$nlFlag$scanFlag")
      } catch {
        case e: Throwable => println(s"[plan] $name ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
    if (violations.nonEmpty) {
      System.err.println(
        s"[plan] FAIL: un-whitelisted global windows / nested-loop joins / multi-scans in: " +
          violations.sorted.mkString(", "))
      sys.exit(1)
    }
  }
}
