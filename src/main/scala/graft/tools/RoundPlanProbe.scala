package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft._
import graft.operators.Ann
object RoundPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val n = embs.count()
    val bits = math.max(3, math.ceil(math.log(math.sqrt(n.toDouble)) / math.log(2)).toInt)
    val index = Ann.nswLshIndex(embs, bits).persist(); index.count()
    val byCell = index.select(col("cluster"), col("vec_id"), col("ve"))
      .repartition(col("cluster")).persist()
    byCell.count()
    // fake an edges table: ring only (cheap), then one scoring round plan
    val kNbr = 12
    val w = Window.partitionBy(col("cluster")).orderBy(col("h"), col("vec_id"))
    val ranked = byCell.withColumn("h", xxhash64(col("vec_id")))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_c", count(lit(1)).over(Window.partitionBy(col("cluster"))))
    val targets = ranked.select(col("vec_id").as("u"), col("cluster"), col("rn"), col("n_c"),
        explode(expr(s"sequence(1, least($kNbr, n_c - 1))")).as("d"))
      .withColumn("rn_t", (col("rn") - 1 + col("d")) % col("n_c") + 1)
    val pairs = targets.join(
        ranked.select(col("vec_id").as("v"), col("cluster"), col("rn").as("rn_t")),
        Seq("cluster", "rn_t"))
      .filter(col("u") =!= col("v"))
      .select(col("cluster"), col("u"), col("v"))
      .repartition(col("cluster"))
      .dropDuplicates("cluster", "u", "v")
    val scored = pairs
      .join(byCell.select(col("cluster"), col("vec_id").as("u"), col("ve").as("uve")), Seq("cluster", "u"))
      .join(byCell.select(col("cluster"), col("vec_id").as("v"), col("ve").as("vve")), Seq("cluster", "v"))
      .select(col("cluster"), col("u"), col("v"), graft.plans.NativeFunctions.cosineSim(col("uve"), col("vve")).as("sim"))
    scored.write.format("noop").mode("overwrite").save()
    println(scored.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
