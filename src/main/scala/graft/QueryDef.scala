package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operation (SURVEY.md §2 row).
  *
  * @param name    stable id, becomes the key in [[SparkEntry.queries]]
  * @param run     the Spark-first implementation over the sf dir's tables
  * @param oracle  equivalent ANSI SQL for DuckDB over the same parquet
  *                tables; None for ops whose semantics are not exactly
  *                SQL-expressible (approximate / hash-seeded ops) — the
  *                driver then records a weaker rows-only check.
  * @param headline included in the Bench timing suite when true.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    headline: Boolean = false)

object QueryDef {
  /** All operator catalogs, merged for SparkEntry / Bench / Verify. */
  def catalogs: Seq[QueryDef] =
    graft.operators.Relational.defs ++
      graft.operators.Relational2.defs ++
      graft.operators.Text.defs ++
      graft.operators.Similarity.defs ++
      graft.operators.BinaryOps.defs ++
      graft.operators.Governance.defs ++
      graft.operators.Multimodal.defs ++
      graft.operators.RestQueries.defs ++
      graft.operators.Crypto.defs ++
      graft.operators.StreamingTwins.defs ++
      graft.operators.ScaleOps.defs ++
      Seq(graft.operators.PipelineE2E.pipeE2e)
}
