package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §2.7). AQE's skew-join
  * splitting handles most cases at runtime; explicit salting remains the
  * tool when one key dominates so heavily that even split partitions
  * overload (power-law keys at 100 TB).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, fanning each hot key across
    * `salts` partitions: the big side gets a deterministic per-row salt
    * (hash of all its columns — no RNG, replay-safe), the small side is
    * replicated once per salt value. Result equals the unsalted join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedBig.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
