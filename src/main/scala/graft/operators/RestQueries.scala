package graft.operators

import graft.QueryDef
import graft.sources.RestSource
import org.apache.spark.sql.functions._

/** S3 catalog queries through the [[graft.sources.RestSource]] DSv2
  * connector — the reference's indexer read patterns
  * (`lib/indexer.ts:64-82` getAgents: orderBy stake desc + limit +
  * offset; `lib/hive-api.ts:95-124` filtered list endpoints), evaluated
  * with the where/orderBy/limit/offset pushed INTO the source. The
  * snapshot is generated deterministically from the sf dir's documents
  * table, so both queries oracle-check against DuckDB over the same
  * parquet. */
object RestQueries {

  private val docSchema =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  private def rest(s: org.apache.spark.sql.SparkSession, dir: String,
      pageSize: Int = 2000) =
    s.read.format("graft.sources.RestSource")
      .option("path", RestSource.snapshot(s, dir, "documents"))
      .option("schema", docSchema)
      .option("pageSize", pageSize.toString)
      .load()

  /** The getAgents shape: where + orderBy/orderDirection + limit/offset
    * as ONE pushed endpoint request (indexer.ts:64-82). */
  val s3RestTopn = QueryDef(
    "s3_rest_topn",
    (s, dir) => rest(s, dir)
      .filter(col("lang") === lit("en"))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .offset(10)
      .limit(50),
    oracle = Some("""
      SELECT doc_id, n_chars FROM documents
      WHERE lang = 'en'
      ORDER BY n_chars DESC, doc_id ASC
      LIMIT 50 OFFSET 10"""))

  /** Unordered filtered ingest: the connector plans one page partition
    * per `pageSize` rows — the parallel limit/offset page-walk of a full
    * endpoint sync; the where still rides each request. */
  val s3RestPaged = QueryDef(
    "s3_rest_paged",
    (s, dir) => rest(s, dir, pageSize = 500)
      .filter(col("n_chars") > lit(500L))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")),
    oracle = Some("""
      SELECT doc_id, lang FROM documents
      WHERE n_chars > 500 ORDER BY doc_id"""))

  val defs: Seq[QueryDef] = Seq(s3RestTopn, s3RestPaged)
}
