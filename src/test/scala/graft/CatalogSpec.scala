package graft

/** Catalog-wide invariants: every declared operator runs at sf0.001 and
  * produces a sane frame; name/oracle wiring is consistent (the driver's
  * column-name-sorted hash makes aliasing mistakes fatal — catch them
  * here, not in the round gate). */
class CatalogSpec extends SparkSpec {

  test("catalog names are unique and non-empty") {
    val names = QueryDef.catalogs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(names.forall(_.nonEmpty))
  }

  test("SparkEntry maps mirror the catalog") {
    assert(SparkEntry.queries.keySet === QueryDef.catalogs.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ===
      QueryDef.catalogs.filter(_.oracle.isDefined).map(_.name).toSet)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 with rows and unique column names") {
    val failures = QueryDef.catalogs.flatMap { q =>
      try {
        val df = q.run(spark, sf001)
        val cols = df.columns.toSeq
        if (cols.distinct.size != cols.size) Some(s"${q.name}: dup columns $cols")
        else if (df.limit(1).count() == 0) Some(s"${q.name}: empty result")
        else None
      } catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
