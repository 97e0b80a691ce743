package graft

import org.apache.spark.sql.functions._

/** Source/sink round-trips (§2.4): csv, json, orc, parquet — schema and
  * values must survive; partitioned writes must prune on read (covered
  * in PlanSpec).
  */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def nationSorted = Tables.nation(spark, sfDir).orderBy("n_nationkey")

  test("parquet round-trip preserves schema and rows") {
    val dir = tmp("rt_parquet")
    nationSorted.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema == nationSorted.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nationSorted.collect().toSeq)
  }

  test("orc round-trip preserves schema and rows") {
    val dir = tmp("rt_orc")
    nationSorted.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == nationSorted.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nationSorted.collect().toSeq)
  }

  test("csv round-trip with header + explicit schema preserves rows") {
    val dir = tmp("rt_csv")
    nationSorted.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(nationSorted.schema).csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nationSorted.collect().toSeq)
  }

  test("json round-trip with explicit schema preserves rows") {
    val dir = tmp("rt_json")
    nationSorted.write.mode("overwrite").json(dir)
    val back = spark.read.schema(nationSorted.schema).json(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nationSorted.collect().toSeq)
  }

  test("timestamps survive a parquet round-trip at micros precision") {
    val dir = tmp("rt_ts")
    val ev = Tables.events(spark, sfDir).orderBy("event_id")
    ev.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.orderBy("event_id").collect().toSeq == ev.collect().toSeq)
  }

  test("text source: one line per row, round-trip through write.text") {
    val dir = tmp("rt_text")
    val lines = Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
      .select(regexp_replace(col("text"), "\n", " ").as("value"))
    lines.write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
    assert(back.schema.fieldNames.toSeq === Seq("value"))
    assert(back.orderBy("value").collect().toSeq ===
      lines.orderBy("value").collect().toSeq)
  }

  test("binaryFile source reads payload bytes + file metadata") {
    val dir = tmp("rt_bin")
    // write a couple of raw payload files (the media-ingestion shape)
    val payloads = Tables.documents(spark, sfDir).filter(col("doc_id") < 3)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    payloads.foreach { case (id, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"doc_$id.bin"), bytes)
    }
    val back = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))
    val rows = back.collect()
    assert(rows.length === payloads.length)
    val byName = rows.map(r => r.getString(0).split('/').last ->
      ((r.getLong(1), r.getAs[Array[Byte]](2)))).toMap
    payloads.foreach { case (id, bytes) =>
      val (len, content) = byName(s"doc_$id.bin")
      assert(len === bytes.length.toLong && content.toSeq === bytes.toSeq)
    }
  }
}
