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
    QueryDef.catalogs
      .filter(q => names.isEmpty || names(q.name))
      .foreach { q =>
        println(s"===== ${q.name} =====")
        try {
          val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
          plan.split("\n").filter(l => keep.exists(l.contains)).foreach(println)
        } catch { case e: Throwable => println(s"  ERROR: ${e.getMessage}") }
      }
    spark.stop()
  }
}
