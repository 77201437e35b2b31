package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sink-side operators (SURVEY §2.1 S5/S6, §2.9 ST8).
  *
  * At 100 TB these write partitioned parquet keyed by the natural
  * partition column; locally they are exercised against temp dirs by
  * `SinksSpec`. */
object Sinks {

  /** S5: append event sink with a per-batch row cap (runs/route.ts:120-130
    * persists at most 250 trace events per run; lib.rs `emit!` appends). */
  def appendEvents(df: DataFrame, path: String, cap: Int = 250): Unit =
    df.limit(cap).write.mode(SaveMode.Append).parquet(path)

  /** ST8: fan-out sink partitioned by key (ws-server.ts:120-156 room-keyed
    * broadcast): consumers read only their key's partition — partition
    * pruning is the read-side analog of per-room delivery. */
  def partitionedSink(df: DataFrame, path: String, key: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(key).parquet(path)

  /** S6: keyed upsert (PDA-keyed account create-or-update, lib.rs:237-251;
    * Prisma create-returning, runs/route.ts:101-118). Last-writer-wins by
    * `versionCol` per `key`; equal-version ties broken deterministically
    * by the LOWEST full-row hash (xxhash64 ascending) to stay idempotent.
    *
    * Parquet has no MERGE, so this is read → union → keep-latest →
    * rewrite via a staging dir and atomic-ish swap. On a table format
    * with MERGE (Delta/Iceberg) this collapses to one statement; the
    * keep-latest window is the engine-level semantics either way. */
  def upsertByKey(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      key: String,
      versionCol: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val existing =
      if (fs.exists(target)) spark.read.parquet(path) else updates.limit(0)
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, xxhash64(struct(col("*"))).asc)
    val merged = existing.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val staging = path + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), target)
  }

  /** Bucketed table writer — the 100 TB co-located-join path: both sides
    * of a recurring fact↔fact equi-join written with the same bucket
    * count on the join key join WITHOUT an exchange (each bucket pair
    * joins locally; at cluster scale this removes the dominant shuffle
    * of repeated large joins). `sortBy` within buckets additionally
    * removes the join's sort step. SinksSpec asserts the shuffle-free
    * plan. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** S7: cached source snapshot with TTL (discovery.ts:15-37: 60 s memo).
    * The TTL is orchestration, not query semantics — the engine-side part
    * is the cache/unpersist lifecycle. */
  final class CachedSource(load: () => DataFrame, ttlMs: Long) {
    private var snapshot: Option[(Long, DataFrame)] = None
    def get(nowMs: Long): DataFrame = synchronized {
      snapshot match {
        case Some((at, df)) if nowMs - at < ttlMs => df
        case prev =>
          prev.foreach(_._2.unpersist())
          val df = load().cache()
          snapshot = Some((nowMs, df))
          df
      }
    }
    def loadedAt: Option[Long] = snapshot.map(_._1)
  }
}
