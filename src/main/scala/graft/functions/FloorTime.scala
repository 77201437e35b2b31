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
  * `pmod` is Spark's floor-mod; the div helper corrects a truncating
  * `div` by the remainder's sign, exact over the whole Long domain.
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
  /** SQL fragment for `floor(x / m)` over integral expressions, `m > 0`.
    *
    * Truncate-then-correct, NOT the `(x - pmod(x, m)) div m` subtraction
    * form: `pmod` is non-negative, so the subtraction underflows Long
    * for x within `m` of Long.MinValue and wraps to a garbage positive
    * bucket, where this form matches `Math.floorDiv` over the whole Long
    * domain (the quotient is always representable for m > 0; truncating
    * `div`/`%` themselves cannot overflow except the m = −1 corner these
    * positive-literal helpers exclude). */
  def floorDivSql(x: String, m: Long): String = {
    require(m > 0, s"FloorTime divisors must be positive, got $m")
    s"(($x) div ${m}L) - (case when ($x) % ${m}L < 0 then 1 else 0 end)"
  }

  /** SQL fragment for the always-non-negative in-bucket offset. */
  def floorModSql(x: String, m: Long): String = {
    require(m > 0, s"FloorTime divisors must be positive, got $m")
    s"pmod(($x), ${m}L)"
  }

  /** SQL fragment for the floor-aligned bucket START, `floorDiv(x,m)*m`
    * — the window-start idiom (`x - pmod(x, m)` rewritten overflow-
    * aware). Inherent domain edge: for x within `pmod(x, m)` of
    * Long.MinValue the true aligned start is below Long.MinValue and NOT
    * representable; this form wraps there (as any Long-typed answer
    * must). Callers bucketing by floorDiv instead of the start are
    * immune — prefer [[floorDivSql]] unless the start value itself is
    * the output. */
  def floorAlignSql(x: String, m: Long): String =
    s"(${floorDivSql(x, m)}) * ${m}L"

  /** `floor(x / m)` as a Column over an integral column/expression. */
  def floorDiv(x: String, m: Long): Column = expr(floorDivSql(x, m))

  /** `x mod m` in `[0, m)` as a Column over an integral column/expression. */
  def floorMod(x: String, m: Long): Column = expr(floorModSql(x, m))

  /** Floor-aligned bucket start as a Column (see [[floorAlignSql]]). */
  def floorAlign(x: String, m: Long): Column = expr(floorAlignSql(x, m))
}
