package graft

/** The oracle gate hash-checks every query that has a DuckDB twin; the
  * rows-only queries (hash-seeded, float-ordered, Poseidon) get only a
  * row-count check there — so nondeterminism in them would be invisible
  * until results drift between rounds. This spec closes that hole:
  * every rows-only query must produce identical results on a second run
  * in the same session. */
class DeterminismSpec extends SparkSpec {

  test("every rows-only query is deterministic across a shuffle-layout change") {
    // the second run happens under a DIFFERENT shuffle-partition count
    // with the run caches cleared: a back-to-back rerun in the same warm
    // session reproduces the same partition layout and merge order, so
    // it could never surface partition-order-dependent results — the
    // main drift class this spec exists to close (r13 test sweep)
    val rowsOnly = QueryDef.catalogs.filter(_.oracle.isEmpty)
    assert(rowsOnly.nonEmpty)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val diffs = try {
      rowsOnly.flatMap { q =>
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        graft.operators.RunCaches.clearAll()
        val a = q.run(spark, sf001).collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        graft.operators.RunCaches.clearAll()
        val b = q.run(spark, sf001).collect().map(_.toString).sorted.toSeq
        if (a != b) Some(q.name) else None
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.operators.RunCaches.clearAll()
    }
    assert(diffs.isEmpty, s"layout-dependent results: $diffs")
  }
}
