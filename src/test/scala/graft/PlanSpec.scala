package graft

/** Physical-plan regression locks: the scale properties the engine is
  * designed around, asserted on executed plans so a refactor that silently
  * loses pushdown / broadcast / partial aggregation fails CI instead of
  * surfacing as a 100× slowdown at cluster scale. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    QueryDef.catalogs.find(_.name == name).get.run(spark, sf001)
      .queryExecution.executedPlan.toString

  test("q1_agg: shipdate predicate reaches the parquet scan and aggregation is partial") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("partial_sum"))
  }

  test("j2_broadcast_lookup: dim side is broadcast, not shuffled") {
    val p = plan("j2_broadcast_lookup")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("BroadcastExchange"))
  }

  test("p1_projection: scan is pruned to the projected columns") {
    val p = plan("p1_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // narrow read — the full orders schema would include o_orderdate
    assert(readSchema.nonEmpty && !readSchema.contains("o_orderdate"), readSchema)
  }

  test("dd_minhash: keeper election partially aggregates before its exchange") {
    val p = plan("dd_minhash")
    assert(p.contains("partial_min"))
  }

  test("a5_cube_matrix: cube expands then aggregates partially (map-side combine)") {
    val p = plan("a5_cube_matrix")
    assert(p.contains("Expand"))
    assert(p.contains("partial_sum"))
  }

  test("no catalog query plans an unbounded CartesianProduct") {
    val offenders = QueryDef.catalogs.flatMap { q =>
      try {
        val p = q.run(spark, sf001).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(q.name) else None
      } catch { case _: Throwable => None } // execution errors are CatalogSpec's job
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
