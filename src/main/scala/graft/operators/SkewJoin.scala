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
  * Deterministic: the salt is a hash of the probe row's remaining columns,
  * not a random draw — identical inputs produce identical task placement
  * and results survive retries unchanged (a nondeterministic salt breaks
  * Spark's task-retry model on the map side of a shuffle). */
object SkewJoin {

  /** Inner equi-join of `skewed` (large, hot-keyed) with `dims`
    * (small per key) on `key`, salted across `n` partitions per key. */
  def saltedJoin(skewed: DataFrame, dims: DataFrame, key: String, n: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(n.toLong)))
    val exploded = dims.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
