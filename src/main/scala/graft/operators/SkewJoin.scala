package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting utility — the manual fallback for hot-key joins when AQE's
  * skew-join split (enabled in Engine) isn't available or the skew lives
  * in a single key inside one task's reach: the large (skewed) side gets a
  * deterministic salt in [0, n), the small-per-key side is exploded n×,
  * and the join runs on (key, salt) so one hot key fans out across n
  * tasks instead of landing in one.
  *
  * Deterministic: the salt comes from the row's position
  * (`monotonically_increasing_id` = partition index ≪ 33 | row offset) —
  * stable under task retries for a fixed input partitioning, unlike a
  * random draw, and it fans out even when every hot-key row is
  * byte-identical (a content-hash salt would send all duplicates to one
  * task, which is exactly the degenerate case salting exists for). */
object SkewJoin {

  /** Inner equi-join of `skewed` (large, hot-keyed) with `dims`
    * (small per key) on `key`, salted across `n` partitions per key.
    * Inputs must not already carry the internal `__salt` column — a
    * silent overwrite would corrupt caller data, so it's rejected. */
  def saltedJoin(skewed: DataFrame, dims: DataFrame, key: String, n: Int): DataFrame = {
    require(n > 0, s"salt fan-out must be positive, got $n")
    // case-insensitive: withColumn resolves names under the default
    // spark.sql.caseSensitive=false, so "__SALT" would be overwritten too
    require(!(skewed.columns ++ dims.columns).exists(_.equalsIgnoreCase("__salt")),
      "saltedJoin reserves the __salt column (any case); rename it on the input")
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(n.toLong)))
    val exploded = dims.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
