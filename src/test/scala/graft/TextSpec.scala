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
}
