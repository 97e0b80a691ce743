package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Text-analysis invariants (the value-level gate is the DuckDB oracle). */
class TextSpec extends SparkSpec {

  test("normalization collapses case and whitespace") {
    import spark.implicits._
    val out = Seq("  Hello   WORLD  ").toDF("text")
      .select(Text.normText(col("text")).as("n")).head().getString(0)
    assert(out == "hello world")
  }

  test("shingles: n words yield n-2 trigrams in order") {
    import spark.implicits._
    val out = Seq("a b c d").toDF("text")
      .select(Text.words(col("text")).as("w"))
      .select(Text.shingles("w").as("s")).head().getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
  }

  test("fingerprint is deterministic and content-sensitive") {
    import spark.implicits._
    val fps = Seq("a b c", "a b c", "a b d").toDF("text")
      .select(Text.words(col("text")).as("w"))
      .select(Text.fingerprint("w").as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("vocabHits counts with repetition") {
    import spark.implicits._
    val n = Seq("the cat the hat").toDF("text")
      .select(Text.words(col("text")).as("w"))
      .select(Text.vocabHits("w", Seq("the", "a")).as("h")).head().getInt(0)
    assert(n == 2)
  }

  test("word_stem edge cases: short words, case folding, non-alpha") {
    import graft.plans.WordStem
    assert(WordStem.stem("") == "")
    assert(WordStem.stem("a") == "a")
    assert(WordStem.stem("by") == "by")
    assert(WordStem.stem("sky") == "sky") // no vowel before y → 1c inert
    // the expression lowercases before stemming
    import spark.implicits._
    val out = Seq("Caresses", "AGREED").toDF("word")
      .select(graft.plans.NativeFunctions.wordStem(col("word")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("caress", "agre"))
  }

  test("word_stem stays codegen'd over the corpus word stream") {
    val df = Tables.documents(spark, sfDir)
      .select(explode(Text.words(col("text"))).as("w"))
      .select(graft.plans.NativeFunctions.wordStem(col("w")).as("stem"))
      .groupBy(col("stem")).count()
    val n = df.collect().length
    assert(n > 0 && n <= 100000)
    // hot path inlines into WholeStageCodegen (doGenCode, no fallback);
    // codegen spans print as "*(id) Op" only in the executed final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(500))
    // stems are never longer than their source words
    val bad = Tables.documents(spark, sfDir)
      .select(explode(Text.words(col("text"))).as("w"))
      .select(col("w"), graft.plans.NativeFunctions.wordStem(col("w")).as("s"))
      .filter(length(col("s")) > length(col("w"))).count()
    assert(bad == 0)
  }
}
