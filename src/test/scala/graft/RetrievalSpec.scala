package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.operators.Retrieval

/** The lexical index faces (r17): Retrieval.lexIndex builds the
  * posting/doc-length/stats tables in one corpus pass, and
  * bm25FromIndex serves queries from them with ZERO document scans —
  * the fit/encode/search deployment split (AnnIndexSpec discipline)
  * applied to the lexical side of the RAG stack. q224 carries the
  * oracle; these pin the equality and the scan-free plan law.
  */
class RetrievalSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)
  private val terms = Seq("scan", "merge", "filter")

  test("bm25FromIndex equals the direct corpus-scan bm25 row-for-row") {
    val (post, dl, stats) = Retrieval.lexIndex(docs)
    val fromIdx = Retrieval.bm25FromIndex(post, dl, stats, terms, k = 10)
      .collect().map(_.toSeq).toSeq
    val direct = Retrieval.bm25(docs, terms, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(fromIdx.nonEmpty && fromIdx == direct,
      s"index face diverged:\n$fromIdx\nvs\n$direct")
  }

  test("persisted-index search never scans the document corpus") {
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("lexidx")
      d.toFile.deleteOnExit(); d.toString
    }
    val (post, dl, stats) = Retrieval.lexIndex(docs)
    post.write.mode("overwrite").parquet(s"$dir/postings")
    dl.write.mode("overwrite").parquet(s"$dir/dl")
    stats.write.mode("overwrite").parquet(s"$dir/stats")
    val q = Retrieval.bm25FromIndex(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/dl"),
      spark.read.parquet(s"$dir/stats"), terms, k = 10)
    // the physical plan's file scans must all point into the index
    // directory — a documents.parquet leaf would mean the "zero corpus
    // re-scan" promise is a lie
    val scanned = q.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains(dir)),
      s"non-index scan leaked into the search plan: $scanned")
    // and the term predicate reaches the posting scan (bucket pruning's
    // logical form): the scan node carries a pushed filter on term
    val postScan = q.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("postings")) => f
    }
    assert(postScan.nonEmpty &&
      postScan.head.dataFilters.exists(_.references.exists(_.name == "term")),
      s"term predicate not pushed to the posting scan: ${postScan.map(_.dataFilters)}")
    // result equality with the direct face through the reloaded tables
    val direct = Retrieval.bm25(docs, terms, k = 10).collect().map(_.toSeq).toSeq
    assert(q.collect().map(_.toSeq).toSeq == direct)
  }
}
