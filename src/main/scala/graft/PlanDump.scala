package graft

/** Dev tool: write each query's `.explain("formatted")` output to
  * `<outDir>/<name>_<suffix>.txt` — the committed before/after plan
  * evidence for optimization rounds (`plans/r<N>/`). The query is
  * EXECUTED first (noop-sink discipline, like [[Explain]]) and the
  * final adaptive plan is appended after the formatted section, so the
  * file carries both the static shape (PushedFilters/ReadSchema per
  * scan, join strategy, Exchange placement) and what AQE actually ran.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,…>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val names = namesCsv.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val known = QueryDef.catalogs.map(q => q.name -> q).toMap
    val unknown = names.filterNot(known.contains)
    require(unknown.isEmpty, s"unknown catalog queries: ${unknown.mkString(", ")}")
    val spark = Engine.session(appName = "graft-plandump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      graft.operators.RunCaches.clearAll()
      val qe = known(n).run(spark, sfDir).queryExecution
      val formatted = qe.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      qe.toRdd.count(): Unit // finalize AQE
      val finalPlan = qe.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        s"===== $n ($suffix) — explain formatted =====\n$formatted\n" +
          s"===== $n ($suffix) — final adaptive plan after execution =====\n" +
          s"$finalPlan\n")
      System.err.println(s"[plandump] $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
