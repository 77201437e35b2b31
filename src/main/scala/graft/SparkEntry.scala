package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Everything is generated from [[QueryDef.catalogs]]: one `queries` entry
  * per implemented SURVEY §2 operator, and an `oracleSql` twin for every
  * operator whose semantics are exactly SQL-expressible in DuckDB.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueryDef.catalogs.find(_.name == "q1_agg").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.catalogs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryDef.catalogs.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
