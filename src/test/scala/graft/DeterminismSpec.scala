package graft

/** The oracle gate hash-checks every query that has a DuckDB twin; the
  * rows-only queries (hash-seeded, float-ordered, Poseidon) get only a
  * row-count check there — so nondeterminism in them would be invisible
  * until results drift between rounds. This spec closes that hole:
  * every rows-only query must produce identical results on a second run
  * in the same session. */
class DeterminismSpec extends SparkSpec {

  test("every rows-only query is run-to-run deterministic") {
    val rowsOnly = QueryDef.catalogs.filter(_.oracle.isEmpty)
    assert(rowsOnly.nonEmpty)
    val diffs = rowsOnly.flatMap { q =>
      val a = q.run(spark, sf001).collect().map(_.toString).sorted.toSeq
      val b = q.run(spark, sf001).collect().map(_.toString).sorted.toSeq
      if (a != b) Some(q.name) else None
    }
    assert(diffs.isEmpty, s"nondeterministic results: $diffs")
  }
}
