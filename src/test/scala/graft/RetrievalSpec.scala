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

  test("lexIndexAppend: two streamed batches equal the fresh whole-corpus build exactly") {
    // tf is per-(term, doc_id) and batch doc_ids are new by ingestion
    // contract, so the append is EXACT — postings/dl as sets, stats to
    // the bit (dl values are integer-valued doubles: their sums are
    // exact at any accumulation order, so avgdl cannot drift with
    // partition layout — the ivfFit centroid lesson does not apply)
    val d0 = docs.filter(col("doc_id") % 3 =!= 0)
    val b1 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
    val (p0, dl0, _) = Retrieval.lexIndex(d0)
    val (p1, dl1, _) = Retrieval.lexIndexAppend(b1, p0, dl0)
    val (p2, dl2, st2) = Retrieval.lexIndexAppend(b2, p1, dl1)
    val (pf, dlf, stf) = Retrieval.lexIndex(docs)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(p2) == rows(pf), "appended postings != fresh build")
    assert(rows(dl2) == rows(dlf), "appended dl != fresh build")
    assert(rows(st2) == rows(stf), s"stats drifted: ${rows(st2)} vs ${rows(stf)}")
    // and the query face agrees with the direct corpus-scan bm25
    val viaAppended = Retrieval.bm25FromIndex(p2, dl2, st2, terms, k = 10)
      .collect().map(_.toSeq).toSeq
    val direct = Retrieval.bm25(docs, terms, k = 10).collect().map(_.toSeq).toSeq
    assert(viaAppended == direct)
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
