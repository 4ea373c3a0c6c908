package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (DESIGN §3 "Joins"): AQE's skew-join split
  * covers sort-merge joins at runtime; these are the declarative
  * fallbacks for hash joins and aggregations when one key dominates
  * (the salting discipline the 100 TB design calls for).
  *
  * Both are result-equivalent to their unsalted forms for ANY salt
  * assignment — the salt only scatters rows of a hot key across `salt`
  * parallel tasks — so they are safe to apply mechanically.
  */
object SkewUtils {
  /** Equi-join `large ⋈ small` on `key`, with the large side's rows
    * scattered across `salt` buckets and the small side replicated
    * `salt` ways. A single hot key becomes `salt` tasks instead of one
    * straggler. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) count aggregation: partial counts per
    * (key, salt) then final sum per key — bounds the largest partial
    * group to ~|hot key|/salt rows. */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame =
    df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("cnt"))
}
