package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory.
  *
  * One place for every config that affects correctness or scale posture:
  *  - UTC session time zone (oracle parity with DuckDB).
  *  - `nanosAsLong`: the driver's `events.parquet` carries TIMESTAMP(NANOS)
  *    which Spark's vectorized reader rejects; we read it as a Long of
  *    epoch-nanos and derive micro-precision timestamps ourselves
  *    (see [[Tables.events]]).
  *  - AQE on: runtime coalescing + skew-join handling, the thing we rely on
  *    instead of hand-tuned partition counts at the 100 TB target.
  *  - shuffle partitions sized for the local test harness; on a real
  *    cluster this is overridden by AQE's coalescing anyway.
  */
object Engine {

  def session(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // PINNED, not inherited: several loud-overflow guarantees (e.g.
      // Tables.tsAsNanos' TIMESTAMP→nanos multiply on post-2262
      // instants) document "keep ANSI on or this becomes silent
      // corruption". Spark 4's default is already true, but build.sbt
      // forwards arbitrary extra java opts and an image-level
      // spark-defaults.conf can flip defaults — the factory whose
      // charter is "one place for every config that affects
      // correctness" must not leave it to the environment.
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
