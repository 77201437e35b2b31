package graft

/** Dev tool: print the executed physical plan of catalog queries, compacted
  * to the operator skeleton — the loop used to audit pushdown / join
  * strategy / codegen spans per operator (the 100 TB posture check).
  *
  * Usage: runMain graft.Explain <sfDir> [name1 name2 …]  (no names = all)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = Engine.session(master = "local[4]", shufflePartitions = 8,
      appName = "graft-explain")
    val keep = Seq("Scan", "Join", "Exchange", "HashAggregate", "SortAggregate",
      "ObjectHashAggregate", "WholeStageCodegen", "Window", "TakeOrdered",
      "Sort ", "Expand", "Generate", "MapPartitions", "BroadcastNestedLoop")
    // a typo'd name must fail loudly (TimeIncr's rule), not print
    // nothing and exit 0 with the user auditing a missing section
    val known = QueryDef.catalogs.map(_.name).toSet
    val unknown = names.diff(known)
    require(unknown.isEmpty, s"unknown catalog queries: ${unknown.mkString(", ")}")
    QueryDef.catalogs
      .filter(q => names.isEmpty || names(q.name))
      .foreach { q =>
        println(s"===== ${q.name} =====")
        // cold-plan discipline, like Bench.timeOnce: an earlier query's
        // memoized feature frame / Bloom broadcast would otherwise leave
        // a later query auditing a warm plan (InMemoryTableScan where
        // Bench measures the parquet Scan) — the exact mismatch this
        // pushdown/join-strategy audit tool exists to catch
        graft.operators.RunCaches.clearAll()
        try {
          // EXECUTE first (noop sink), then print: with AQE on, the
          // unexecuted executedPlan is the initial AdaptiveSparkPlan
          // (isFinalPlan=false) — auditing it misses exactly the
          // runtime join-strategy/skew rewrites this tool exists to
          // surface (r13 sweep)
          val qe = q.run(spark, sfDir).queryExecution
          qe.toRdd.count(): Unit
          qe.executedPlan.toString
            .split("\n").filter(l => keep.exists(l.contains)).foreach(println)
        } catch { case e: Throwable => println(s"  ERROR: ${e.getMessage}") }
      }
    spark.stop()
  }
}
