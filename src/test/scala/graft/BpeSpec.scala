package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE pair statistics (q177 / graft.operators.Bpe). */
class BpeSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("overlapping stats vs non-overlapping apply: the 'aaa' contract") {
    // "aaa" x3: get_stats counts (a,a) twice per word; a left-to-right
    // merge fuses once per word
    val out = Bpe.pairStats(docs((1L, "aaa aaa aaa")), k = 5).collect()
    val aa = out.find(_.getString(0) == "aa").get
    assert(aa.getLong(1) == 6, "overlapping count: 2 per word x 3")
    assert(aa.getLong(2) == 3, "merge fuses once per word x 3")
  }

  test("pair counts weight by word frequency and rank deterministically") {
    val out = Bpe.pairStats(
      docs((1L, "abab abab cd"), (2L, "abab")), k = 10).collect()
    val byPair = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "abab" x3: pairs ab(2x), ba(1x) per word; merge ab fuses 2x per word
    assert(byPair("ab") == (6L, 6L))
    assert(byPair("ba") == (3L, 3L), "independent per-candidate application: ba fuses once per abab")
    assert(byPair("cd") == (1L, 1L))
    // ranking: n_adjacent desc, then pair asc
    val ranked = out.map(_.getString(0)).toSeq
    assert(ranked.head == "ab")
  }

  test("single-char and empty words contribute no pairs but stay in the vocab table") {
    val wf = Bpe.wordFreq(docs((1L, "a b a"), (2L, ""))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wf == Map("a" -> 2L, "b" -> 1L))
    assert(Bpe.pairStats(docs((1L, "a b a")), k = 5).count() == 0)
  }

  test("stats run on the vocab table, not the corpus (scale shape)") {
    // a corpus with massive repetition of one word: the pair explode
    // sees each DISTINCT word once (freq-weighted), so its row count is
    // vocab-bound, not corpus-bound
    val corpus = docs((1L to 50L).map(i => (i, "table table table")): _*)
    val wf = Bpe.wordFreq(corpus)
    assert(wf.count() == 1)
    val top = Bpe.pairStats(corpus, k = 5).collect()
    assert(top.length == 4) // ta ab bl le
    assert(top.forall(_.getLong(1) == 150L))
  }

  test("top-k candidate ranking plans as TakeOrderedAndProject, not a global sort") {
    val plan = Bpe.pairStats(Tables.documents(spark, sfDir), k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
