package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** THE floor-division epoch-bucketing idiom, shared by every operator
  * that derives a time bucket or an in-bucket offset from an integral
  * epoch column (nanos→ms, ms→hour, ms→day, band buckets, …).
  *
  * Why floor and not SQL's truncating `div`/`%`: the reference derives
  * epochs with JS `Math.floor` (e.g. client.ts:1753-1762), which floors
  * a pre-1970 value to the PREVIOUS bucket where truncation rounds it
  * toward zero — a different bucket for the same instant, and a
  * NEGATIVE `%` offset that `< threshold` phase gates silently accept
  * (the st2 commit-window bug class, fixed piecemeal in rounds 12-13
  * across Crypto/StreamingTwins/StreamOps before this helper existed).
  * `pmod` is Spark's floor-mod, so `(x - pmod(x, m)) div m` is exact
  * integral floor-div with no double round-trip.
  *
  * Oracle caveat, verified against DuckDB 1.x in-container: DuckDB's
  * `epoch_ms()` and `//` both TRUNCATE toward zero, so oracle SQL that
  * needs floor semantics on possibly-negative values must spell
  * `((x % m + m) % m)` for the offset and
  * `(x - ((x % m + m) % m)) // m` for the bucket (the forms the st1/st2
  * oracles use). For the driver corpus this is moot — every `events.ts`
  * is post-2023 — so the floor-vs-truncate distinction is pinned by
  * specs (StreamingSpec "ST2b pre-1970"), not by the oracle gate.
  *
  * Scala-side (typed Dataset) code should use `Math.floorDiv` /
  * `Math.floorMod` directly — same semantics, already one canonical
  * stdlib spelling.
  */
object FloorTime {
  /** SQL fragment for `floor(x / m)` over integral expressions. */
  def floorDivSql(x: String, m: Long): String =
    s"(($x) - pmod(($x), ${m}L)) div ${m}L"

  /** SQL fragment for the always-non-negative in-bucket offset. */
  def floorModSql(x: String, m: Long): String = s"pmod(($x), ${m}L)"

  /** `floor(x / m)` as a Column over an integral column/expression. */
  def floorDiv(x: String, m: Long): Column = expr(floorDivSql(x, m))

  /** `x mod m` in `[0, m)` as a Column over an integral column/expression. */
  def floorMod(x: String, m: Long): Column = expr(floorModSql(x, m))
}
