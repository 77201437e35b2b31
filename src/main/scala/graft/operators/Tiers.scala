package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared tier constants with a single definition site. */
object Tiers {

  /** Stake-duration multiplier cascade
    * (app/[locale]/stake/page.tsx:143-149): ≥180d → 2.0×, ≥90d → 1.5×,
    * ≥30d → 1.2×, else 1.0×, in basis points. One definition shared by
    * w6_tier_multiplier, a7_pool_totals, and f_vote_weight — a threshold
    * change lands in every operator at once instead of drifting across
    * three hand-maintained cascades. */
  def multiplierBps(ageDays: Column): Column =
    when(ageDays >= lit(180L), lit(20000L))
      .when(ageDays >= lit(90L), lit(15000L))
      .when(ageDays >= lit(30L), lit(12000L))
      .otherwise(lit(10000L))
}
