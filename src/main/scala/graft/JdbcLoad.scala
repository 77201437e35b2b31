package graft

/** Loads a parquet tier's JDBC-compatible tables into a relational store
  * (embedded Derby in the sandbox; any JDBC URL works) so the S1 `jdbc:`
  * locator can be measured END-TO-END: after loading, every catalog
  * query runs unchanged with the URL as its table-set locator
  * ([[Tables]] flips the whole catalog on a `jdbc:` prefix), and
  * [[TimeQueries]]/[[Explain]] accept the URL as a tier dir — the
  * jdbc-vs-parquet table and pushdown dump recorded in SURVEY §6.10.
  *
  * The reference's primary store is relational (Postgres via
  * prisma/schema.prisma:10-171); this harness is how that deployment
  * shape gets a recorded number instead of only a spec assertion.
  *
  * Usage:
  * {{{
  * sbt "runMain graft.JdbcLoad /root/testdata/sf0.01 jdbc:derby:/tmp/graft-derby-tier/db;create=true"
  * }}}
  *
  * `embeddings.embedding` is `list<float>`, which has no JDBC type
  * mapping in any stock dialect — it is stored as a BLOB via the
  * fixed-width LE codec ([[graft.functions.FloatVecCodec]]); the
  * [[Tables]] facade decodes a BinaryType embedding column
  * transparently on read, so the vector catalog (similarity tiers,
  * embedding dedup) runs unchanged against the relational store — the
  * reference's one-Postgres-primary deployment shape
  * (prisma/schema.prisma:1-171). Every catalog table round-trips,
  * including `events`' naive timestamps (written as TIMESTAMP, read
  * back zone-free via `preferTimestampNTZ` — SourcesSpec pins the
  * instant equality).
  */
object JdbcLoad {
  /** Derby's VARCHAR ceiling — the explicit width every string column is
    * declared at (CLOB, the dialect default, refuses comparisons). */
  private[graft] val varcharMax = 32672

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: JdbcLoad <parquetDir> <jdbcUrl>")
    val spark = Engine.session(appName = "graft-jdbc-load")
    load(spark, args(0), args(1))
    spark.stop()
  }

  /** The loader body, session-supplied so specs can run it against the
    * shared test session (main owns its own session's lifecycle). */
  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String, url: String): Unit = {
    require(url.startsWith("jdbc:"), s"not a jdbc url: $url")
    GraftExtensions.ensureRegistered(spark)
    for (t <- Tables.catalogTables.toSeq.sorted) {
      val raw = spark.read.parquet(s"$dir/$t.parquet")
      // array<float> columns (embeddings.embedding) become BLOBs via the
      // fixed-width codec — null-element vectors are REFUSED, not
      // silently folded: the codec's null is the right read-time posture
      // for malformed bytes, but a LOAD that nulls a non-null vector
      // would corrupt the store against its parquet source
      val vecCols = raw.schema.fields.collect {
        case f if f.dataType ==
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType, true) ||
          f.dataType == org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType, false) => f.name
      }.toSeq
      val df = vecCols.foldLeft(raw) { (d, c) =>
        d.withColumn(c, org.apache.spark.sql.functions
          .call_function("float_vec_to_binary",
            org.apache.spark.sql.functions.col(c)))
      }
      val t0 = System.nanoTime()
      // string columns are declared VARCHAR explicitly: Spark's Derby
      // dialect defaults StringType to CLOB, and Derby refuses CLOB
      // comparisons — every pushed string predicate (st1's
      // event_type = 'vote') would fail AT THE SCAN. A real relational
      // primary (the reference's Postgres) declares text/varchar, so
      // VARCHAR is also the faithful stand-in; 32672 is Derby's max.
      val strFields = raw.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType)
        .map(_.name).toSeq
      // ONE preflight aggregate per table (review r16 — this was three
      // separate scans): max string length per VARCHAR column (a longer
      // value fails mid-load with a truncation error whose cause is
      // otherwise silent — ADVICE r14), the null-element count per
      // vector column (the codec cannot represent a null element, and a
      // load that silently nulls a non-null vector would corrupt the
      // store against its parquet source), and the row count for the
      // log line. Everything is named and refused BEFORE any row is
      // written. (No bare block here: `{…}` adjacent to the previous
      // expression parses as a block ARGUMENT to it.)
      locally {
        import org.apache.spark.sql.functions.{call_function, col, count, length, lit, max, sum, when}
        val aggs: Seq[org.apache.spark.sql.Column] =
          strFields.map(c => max(length(col(c)))) ++
            vecCols.map(c => sum(when(col(c).isNotNull &&
              call_function("float_vec_to_binary", col(c)).isNull, 1L)
              .otherwise(0L))) :+ count(lit(1))
        val pre = raw.agg(aggs.head, aggs.tail: _*).head()
        strFields.zipWithIndex.foreach { case (c, i) =>
          val m = if (pre.isNullAt(i)) 0 else pre.getInt(i)
          require(m <= varcharMax,
            s"$t.$c max string length $m exceeds VARCHAR($varcharMax) " +
              "(Derby's max) — map this column to CLOB manually or keep it " +
              "off pushed comparisons; refusing a load that would truncate")
        }
        vecCols.zipWithIndex.foreach { case (c, i) =>
          // sum over an empty table is null, not 0
          val bad = if (pre.isNullAt(strFields.length + i)) 0L
            else pre.getLong(strFields.length + i)
          require(bad == 0L,
            s"$t.$c: $bad non-null vector(s) hold a null element — the " +
              "fixed-width codec cannot represent it; clean the source " +
              "rather than load a silently-nulled vector")
        }
        val rows = pre.getLong(strFields.length + vecCols.length)
        val strCols = strFields.map(f => s"$f VARCHAR($varcharMax)")
        val w = df.write.mode("overwrite").format("jdbc")
          .option("url", url).option("dbtable", t)
        (if (strCols.isEmpty) w
         else w.option("createTableColumnTypes", strCols.mkString(", "))).save()
        System.err.println(f"[jdbcload] $t: $rows rows in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s" +
          (if (vecCols.nonEmpty) s" (${vecCols.mkString(", ")} as BLOB)" else ""))
      }
    }
  }
}
