package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.FloorTime
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic batch twins of the ST-series streaming operators
  * (SURVEY.md §2.9). Each declares the *result semantics* of a streaming
  * computation as a batch query over the `events` table, so the DuckDB
  * oracle can check it exactly; the live Structured Streaming versions of
  * the same semantics live in [[graft.streaming]] and are asserted
  * equivalent to these twins in the test suite.
  *
  * Epoch math is integer ns/ms arithmetic throughout (`ts` is epoch-nanos;
  * reference epoch-day = floor(unix_ms/86400000),
  * reputation-prover-impl.ts:143). ST3 ≡ `a3_epoch_agg`, ST5 ≡
  * `so2_dedup_keyed` (declared in Relational).
  */
object StreamingTwins {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  /** ST1 deadline-window tally with late-data rejection (kamiyo
    * fast-voting lib.rs:93-176): votes land in 1-hour windows; the
    * tally's deadline is window_start + 45 min — later rows are rejected
    * as the on-chain `VotingEnded` path does (lib.rs:103). Quorum ≥ 2 and
    * integer approval pct (lib.rs:145-149). */
  val st1DeadlineTally = QueryDef(
    "st1_deadline_tally",
    (s, dir) => T(s, dir).events
      .filter(col("event_type").isin("purchase", "error"))
      // FLOOR bucketing ([[graft.functions.FloorTime]]), not truncation:
      // the live twin derives window_hour from window() starts, which
      // are floor-aligned, and the reference rule is floor(unix_ms / …)
      // — bare div would put a pre-1970 event in a different (and
      // off-by-one) bucket than the stream reports for the same row
      .withColumn("window_hour", FloorTime.floorDiv("ts_ms", 3600000L))
      .withColumn("late", FloorTime.floorMod("ts_ms", 3600000L) >= lit(2700000L))
      .groupBy(col("window_hour"))
      .agg(
        count_if(!col("late") && col("event_type") === lit("purchase")).as("votes_for"),
        count_if(!col("late") && col("event_type") === lit("error")).as("votes_against"),
        count_if(col("late")).as("late_dropped"))
      .withColumn("total", col("votes_for") + col("votes_against"))
      .withColumn("approval_pct",
        when(col("total") > lit(0L), expr("(votes_for * 100) div total"))
          .otherwise(lit(0L)))
      .withColumn("passed", col("total") >= lit(2L) && col("approval_pct") >= lit(50L))
      .orderBy(col("window_hour")),
    oracle = Some("""
      WITH v AS (
        -- floor-mod forms: DuckDB // and % truncate toward zero, so the
        -- bare operators would diverge from the Spark side's pmod floor
        -- bucketing on pre-1970 rows
        SELECT (epoch_ms(ts) - ((epoch_ms(ts) % 3600000 + 3600000) % 3600000))
                 // 3600000 AS window_hour,
          ((epoch_ms(ts) % 3600000 + 3600000) % 3600000) >= 2700000 AS late,
          event_type
        FROM events WHERE event_type IN ('purchase','error')),
      t AS (
        SELECT window_hour,
          COUNT(*) FILTER (WHERE NOT late AND event_type = 'purchase') AS votes_for,
          COUNT(*) FILTER (WHERE NOT late AND event_type = 'error') AS votes_against,
          COUNT(*) FILTER (WHERE late) AS late_dropped
        FROM v GROUP BY 1)
      SELECT window_hour, votes_for, votes_against, late_dropped,
        votes_for + votes_against AS total,
        CASE WHEN votes_for + votes_against > 0
          THEN (votes_for * 100) // (votes_for + votes_against) ELSE 0 END AS approval_pct,
        votes_for + votes_against >= 2 AND
          (CASE WHEN votes_for + votes_against > 0
            THEN (votes_for * 100) // (votes_for + votes_against) ELSE 0 END) >= 50 AS passed
      FROM t ORDER BY window_hour"""),
    headline = true)

  /** ST2 commit-reveal session result (swarm-types.ts:104-136): per key,
    * commit phase counts `view` events; `winning_bid` is the max reveal
    * (`purchase`) value and `first_reveal_event` the lowest reveal
    * event_id — two INDEPENDENT aggregates, not an argmax (the id is the
    * first reveal, not the winning reveal's; oracle and the streaming
    * CommitRevealState implement the same pair). The argmax-with-tiebreak
    * form lives in ST2b ([[st2DeadlineWinner]]'s `winner_event`). */
  val st2CommitReveal = QueryDef(
    "st2_commit_reveal",
    (s, dir) => T(s, dir).events
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        count_if(col("event_type") === lit("view")).as("n_commits"),
        count_if(col("event_type") === lit("purchase")).as("n_reveals"),
        max(when(col("event_type") === lit("purchase"), col("value"))).as("winning_bid"),
        min(when(col("event_type") === lit("purchase"), col("event_id")))
          .as("first_reveal_event"))
      .withColumn("has_winner", col("n_reveals") > lit(0L))
      .orderBy(col("user_id")),
    oracle = Some("""
      SELECT user_id,
        COUNT(*) FILTER (WHERE event_type = 'view') AS n_commits,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_reveals,
        MAX(value) FILTER (WHERE event_type = 'purchase') AS winning_bid,
        MIN(event_id) FILTER (WHERE event_type = 'purchase') AS first_reveal_event,
        COUNT(*) FILTER (WHERE event_type = 'purchase') > 0 AS has_winner
      FROM events WHERE event_type IN ('view','purchase')
      GROUP BY user_id ORDER BY user_id"""))

  /** ST2b commit-reveal with DUAL DEADLINES (the full lifecycle of
    * lib.rs:93-176 + swarm-types.ts:104-136): sessions are (user, hour);
    * commits (`view`) accepted only in the first 30 min, reveals
    * (`purchase`) only in [30, 45) — anything else is rejected like the
    * on-chain `VotingEnded` error; winner = max reveal bid, ties to the
    * lowest event_id (the running-max semantics of
    * swarm-types.ts:118-119). */
  val st2DeadlineWinner = QueryDef(
    "st2_deadline_winner",
    (s, dir) => T(s, dir).events
      .filter(col("event_type").isin("view", "purchase"))
      // floor forms (st1's rule, [[graft.functions.FloorTime]]):
      // truncating div/% misbuckets pre-1970 rows and — worse — yields a
      // NEGATIVE offset that the `< 30 min` commit gate ACCEPTS for an
      // event just before an hour boundary, where the floor offset
      // (always in [0, 1h)) rejects it
      .withColumn("window_hour", FloorTime.floorDiv("ts_ms", 3600000L))
      .withColumn("off_ms", FloorTime.floorMod("ts_ms", 3600000L))
      .withColumn("phase",
        when(col("event_type") === lit("view") && col("off_ms") < lit(1800000L),
          lit("commit"))
          .when(col("event_type") === lit("purchase") &&
            col("off_ms") >= lit(1800000L) && col("off_ms") < lit(2700000L),
            lit("reveal"))
          .otherwise(lit("rejected")))
      .groupBy(col("user_id"), col("window_hour"))
      .agg(
        count_if(col("phase") === lit("commit")).as("n_commits"),
        count_if(col("phase") === lit("reveal")).as("n_reveals"),
        count_if(col("phase") === lit("rejected")).as("n_rejected"),
        max(when(col("phase") === lit("reveal"), col("value"))).as("winning_bid"),
        // winner = lexicographic min over (-bid, event_id): highest bid,
        // ties to the earliest event — null (non-reveal) rows skipped.
        // The null-BID guard matters separately from the phase guard: a
        // reveal row with NULL value would produce a non-null struct
        // whose null nv field sorts FIRST in Spark's struct min (DuckDB
        // sorts it last), electing the null bid as winner and diverging
        // from winning_bid's MAX(value), which skips nulls (r13 sweep)
        min(when(col("phase") === lit("reveal") && col("value").isNotNull,
          struct((-col("value")).as("nv"), col("event_id").as("eid"))))
          .as("ws"))
      .withColumn("winner_event", col("ws.eid")).drop("ws")
      .withColumn("revealed", col("n_reveals") > lit(0L))
      .orderBy(col("user_id"), col("window_hour")),
    oracle = Some("""
      WITH p AS (
        SELECT user_id,
          (epoch_ms(ts) - ((epoch_ms(ts) % 3600000 + 3600000) % 3600000))
            // 3600000 AS window_hour,
          event_id, value,
          CASE WHEN event_type = 'view'
                AND ((epoch_ms(ts) % 3600000 + 3600000) % 3600000) < 1800000
                 THEN 'commit'
               WHEN event_type = 'purchase'
                AND ((epoch_ms(ts) % 3600000 + 3600000) % 3600000) >= 1800000
                AND ((epoch_ms(ts) % 3600000 + 3600000) % 3600000) < 2700000
                 THEN 'reveal'
               ELSE 'rejected' END AS phase
        FROM events WHERE event_type IN ('view','purchase'))
      SELECT user_id, window_hour,
        COUNT(*) FILTER (WHERE phase = 'commit') AS n_commits,
        COUNT(*) FILTER (WHERE phase = 'reveal') AS n_reveals,
        COUNT(*) FILTER (WHERE phase = 'rejected') AS n_rejected,
        MAX(value) FILTER (WHERE phase = 'reveal') AS winning_bid,
        (MIN(struct_pack(nv := -value, eid := event_id))
          FILTER (WHERE phase = 'reveal' AND value IS NOT NULL)).eid AS winner_event,
        COUNT(*) FILTER (WHERE phase = 'reveal') > 0 AS revealed
      FROM p GROUP BY user_id, window_hour
      ORDER BY user_id, window_hour"""))

  /** ST4 sliding activity window (useHiveVizState.ts:37-50, burns24h
    * swarm-types.ts:429-437): activity in the trailing 24h before the
    * as-of instant 2024-01-30T00:00Z; members with ≥1 event are active. */
  val st4SlidingActivity = QueryDef(
    "st4_sliding_activity",
    (s, dir) => T(s, dir).events
      .filter(col("ts_ms") >= lit(1706486400000L) && // 2024-01-29T00:00Z
        col("ts_ms") < lit(1706572800000L)) // 2024-01-30T00:00Z
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("events_24h"),
        max(col("ts_ms")).as("last_seen_ms"))
      .withColumn("active", col("events_24h") > lit(0L))
      .orderBy(col("user_id")),
    oracle = Some("""
      SELECT user_id, COUNT(*) AS events_24h, MAX(epoch_ms(ts)) AS last_seen_ms,
        COUNT(*) > 0 AS active
      FROM events
      WHERE epoch_ms(ts) >= 1706486400000 AND epoch_ms(ts) < 1706572800000
      GROUP BY user_id ORDER BY user_id"""))

  /** ST6 bounded replay buffer (useAgentStream.ts:8,45-48 cap 500;
    * message-store.ts:25-27 cap 1000): per-key buffer capped at 3 here —
    * report kept vs evicted counts and the retained ids oldest-first. */
  val st6BoundedBuffer = QueryDef(
    "st6_bounded_buffer",
    (s, dir) => {
      // recency at MILLISECOND resolution + event_id tiebreak — the same
      // total order the streaming twin keeps (Ev carries ts_ms, and the
      // reference's message timestamps are JS epoch-millis). Ordering by
      // the raw nanos ts instead would diverge from the stream on two
      // same-millisecond events whose nano order disagrees with id order.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms").desc, col("event_id").desc)
      T(s, dir).events
        .withColumn("rn", row_number().over(w))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_seen"),
          count_if(col("rn") <= lit(3)).as("n_kept"),
          count_if(col("rn") > lit(3)).as("n_evicted"),
          // CSV string, not array<long>: the driver's pandas canonicalizer
          // cannot hash ndarray cells (and DuckDB's twin stringifies too)
          concat_ws(",",
            sort_array(collect_list(when(col("rn") <= lit(3), col("event_id"))))
              .cast("array<string>"))
            .as("buffer_ids"))
        .orderBy(col("user_id"))
    },
    oracle = Some("""
      WITH r AS (
        SELECT user_id, event_id,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, COUNT(*) AS n_seen,
        COUNT(*) FILTER (WHERE rn <= 3) AS n_kept,
        COUNT(*) FILTER (WHERE rn > 3) AS n_evicted,
        array_to_string(list_sort(list(event_id) FILTER (WHERE rn <= 3)), ',') AS buffer_ids
      FROM r GROUP BY user_id ORDER BY user_id"""))

  /** ST7 TTL retention / prune (message-store.ts:47-64, 7-day TTL): cutoff
    * = global max ts − 7 days; report kept vs pruned per event type. */
  val st7TtlRetention = QueryDef(
    "st7_ttl_retention",
    (s, dir) => {
      val ev = T(s, dir).events
      val cutoff = ev.agg(max(col("ts_ms")).as("max_ms"))
        .select((col("max_ms") - lit(7L * 86400000L)).as("cutoff_ms"))
      ev.crossJoin(broadcast(cutoff))
        .groupBy(col("event_type"))
        .agg(
          count_if(col("ts_ms") >= col("cutoff_ms")).as("n_kept"),
          count_if(col("ts_ms") < col("cutoff_ms")).as("n_pruned"))
        .orderBy(col("event_type"))
    },
    oracle = Some("""
      SELECT event_type,
        COUNT(*) FILTER (WHERE epoch_ms(ts) >=
          (SELECT MAX(epoch_ms(ts)) - 604800000 FROM events)) AS n_kept,
        COUNT(*) FILTER (WHERE epoch_ms(ts) <
          (SELECT MAX(epoch_ms(ts)) - 604800000 FROM events)) AS n_pruned
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** ST9 daily running spend vs limit (lib/hive-api.ts:44-62): per
    * (user, epoch-day) purchase spend in integer cents against a 500.00
    * daily limit; spendPct = min(100, spend*100 div limit) as the
    * reference's `Math.min(100, ...)` clamp. */
  val st9DailyLimit = QueryDef(
    "st9_daily_limit",
    (s, dir) => T(s, dir).events
      .filter(col("event_type") === lit("purchase"))
      // floor bucketing on the nanos column — same rule as st1's
      // window_hour (the live dailyLimit buckets by window() starts)
      .withColumn("epoch_day", FloorTime.floorDiv("ts", 86400000000000L))
      // guarded cents (Relational.centsV): NaN/Inf/overflow amounts fold
      // to null instead of an ANSI cast throw — the guard st12 carries,
      // applied to the identical expression here (r13 third sweep); the
      // live dailyLimit and the oracle carry the same fold
      .withColumn("cents", Relational.centsV(col("value")))
      .groupBy(col("user_id"), col("epoch_day"))
      .agg(sum(col("cents")).as("spend_c"), count(lit(1)).as("n_draws"))
      // div 500 + 0-floor, the live dailyLimit's overflow-free clamp
      // (rationale there); oracle carries the same form
      .withColumn("spend_pct",
        least(lit(100L), greatest(lit(0L), expr("spend_c div 500"))))
      .withColumn("over_limit", col("spend_c") > lit(50000L))
      .orderBy(col("user_id"), col("epoch_day")),
    oracle = Some("""
      SELECT user_id,
        (epoch_ms(ts) - ((epoch_ms(ts) % 86400000 + 86400000) % 86400000))
          // 86400000 AS epoch_day,
        CAST(SUM(CASE WHEN ABS(ROUND(value * 100)) < 9223372036854775808.0
               THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS spend_c,
        COUNT(*) AS n_draws,
        CAST(LEAST(100, GREATEST(0, SUM(CASE WHEN ABS(ROUND(value * 100)) < 9223372036854775808.0
               THEN CAST(ROUND(value * 100) AS BIGINT) END) // 500)) AS BIGINT) AS spend_pct,
        SUM(CASE WHEN ABS(ROUND(value * 100)) < 9223372036854775808.0
               THEN CAST(ROUND(value * 100) AS BIGINT) END) > 50000 AS over_limit
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2 ORDER BY user_id, epoch_day"""))

  /** ST11 gap sessionization: reconstruct connection sessions from the
    * member event stream — the analytics view of the channel server's
    * membership lifecycle (ws-server.ts:128-136 joinedAt / token-expiry;
    * a member whose events stop for the gap has left). A new session
    * starts when the inactivity gap reaches 30 min (`>=` split). The
    * live stream in [[graft.streaming.StreamOps.gapSessions]] converges
    * to this twin exactly — note the native `session_window` MERGES at
    * an exactly-gap boundary, so the streaming side runs it with a
    * 1 ms-short gap to realize this `>=` rule (rationale there). Classic islands form: per-user lag → new-session flag →
    * running sum — the per-user sequential window hash-partitions across
    * users, so it scales horizontally. */
  val st11GapSessions = QueryDef(
    "st11_gap_sessions",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      T(s, dir).events
        .select(col("user_id"), col("event_id"), col("ts_ms"))
        .withColumn("prev", lag(col("ts_ms"), 1).over(w))
        .withColumn("new_sess",
          (col("prev").isNull || col("ts_ms") - col("prev") >= lit(1800000L))
            .cast("long"))
        .withColumn("sess_no", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_no"))
        .agg(
          min(col("ts_ms")).as("session_start_ms"),
          max(col("ts_ms")).as("session_end_ms"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("sess_no"))
    },
    oracle = Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
      l AS (
        SELECT *, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
        FROM e),
      f AS (
        SELECT *, CASE WHEN prev IS NULL OR ts_ms - prev >= 1800000
                       THEN 1 ELSE 0 END AS new_sess
        FROM l),
      s AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM f)
      SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
        MIN(ts_ms) AS session_start_ms,
        MAX(ts_ms) AS session_end_ms,
        COUNT(*) AS n_events
      FROM s GROUP BY user_id, sess_no
      ORDER BY user_id, sess_no"""))

  /** ST12 rapid-reversal (wash-trade) flag — the analytic twin of the
    * transfer hook's per-owner TransferState machine
    * (transfer-hook.ts:35-46 state fields, :143-167 decode;
    * `s2_decode_transfer_state` reads the stored form of this state).
    * Events are transfers by owner = user_id; direction outbound =
    * purchase/click (spend-shaped types), amount in integer cents.
    *
    * Per owner, ordered by time: an outbound transfer followed by an
    * inbound one within `cooldown_seconds` (300 s) is a rapid reversal —
    * `rapid_reversals` is the running count, the lag/sequence-pattern
    * detector the engine previously lacked. `transfers_in_window` /
    * `volume_in_window` are the running caps within the rate-limit
    * window (1 h; epoch-aligned — the on-chain variant anchors the
    * window at the first transfer, a self-referential reset that is not
    * expressible as a finite SQL window; epoch alignment keeps identical
    * monitoring semantics and an exact oracle). Flagged when reversals
    * reach 3 or either windowed cap (10 transfers / 1000.00 volume)
    * is exceeded — HookConfig's maxTransfersPerWindow /
    * maxVolumePerWindow shape.
    *
    * Scale: both windows hash-partition on owner; no global sort, no
    * driver state — per-owner sequential scans parallelize across the
    * key space exactly like st11's islands form. */
  val st12RapidReversal = QueryDef(
    "st12_rapid_reversal",
    (s, dir) => {
      val byOwner = Window.partitionBy(col("owner"))
        .orderBy(col("ts_ms"), col("event_id"))
      val run = byOwner.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inWindow = Window.partitionBy(col("owner"), col("window_start_ms"))
        .orderBy(col("ts_ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir).events
        .select(
          col("user_id").as("owner"), col("event_id"), col("ts_ms"),
          col("event_type").isin("purchase", "click").as("outbound"),
          // guarded cents cast: a bare round(..).cast("long") throws
          // under ANSI on NaN (round passes non-finite through) and on
          // |cents| ≥ 2^63, where integer-or-null is the semantics all
          // three engines (this twin, the stream kernel, DuckDB) can
          // express exactly — abs(r) < 2^63 is false for NaN/±Inf on
          // both SQL engines (DuckDB sorts NaN above everything), and
          // CaseWhen evaluates the ANSI cast only on guarded rows
          // (r13 sweep; same class as f_json_extract's bounded cast)
          when(abs(round(col("value") * lit(100), 0)) <
              lit(9.223372036854776e18),
            round(col("value") * lit(100), 0).cast("long")).as("amount_c"))
        .withColumn("prev_out", lag(col("outbound"), 1).over(byOwner))
        .withColumn("prev_ts", lag(col("ts_ms"), 1).over(byOwner))
        .withColumn("is_reversal",
          coalesce(col("prev_out") && !col("outbound") &&
            (col("ts_ms") - col("prev_ts")) <= lit(300000L), lit(false)))
        .withColumn("rapid_reversals",
          sum(col("is_reversal").cast("long")).over(run))
        .withColumn("window_start_ms", FloorTime.floorAlign("ts_ms", 3600000L))
        .withColumn("transfers_in_window", count(lit(1)).over(inWindow))
        .withColumn("volume_in_window", sum(col("amount_c")).over(inWindow))
        .withColumn("is_flagged",
          col("rapid_reversals") >= lit(3L) ||
            col("transfers_in_window") > lit(10L) ||
            col("volume_in_window") > lit(100000L))
        .select(col("owner"), col("event_id"), col("ts_ms"), col("outbound"),
          col("is_reversal"), col("rapid_reversals"), col("window_start_ms"),
          col("transfers_in_window"), col("volume_in_window"), col("is_flagged"))
        .orderBy(col("owner"), col("ts_ms"), col("event_id"))
    },
    oracle = Some("""
      WITH e AS (
        SELECT user_id AS owner, event_id, epoch_ms(ts) AS ts_ms,
          event_type IN ('purchase','click') AS outbound,
          -- same abs(round) < 2^63 guard as the Spark twin: NaN/±Inf
          -- fail the comparison (DuckDB sorts NaN above everything) and
          -- out-of-range cents fold to NULL instead of erroring the
          -- whole oracle query on the CAST
          CASE WHEN ABS(ROUND(value * 100)) < 9223372036854775808.0
               THEN CAST(ROUND(value * 100) AS BIGINT) END AS amount_c
        FROM events),
      l AS (
        SELECT *,
          lag(outbound) OVER w AS prev_out,
          lag(ts_ms) OVER w AS prev_ts
        FROM e WINDOW w AS (PARTITION BY owner ORDER BY ts_ms, event_id)),
      r AS (
        SELECT *,
          COALESCE(prev_out AND NOT outbound
                   AND ts_ms - prev_ts <= 300000, FALSE) AS is_reversal,
          -- floor-mod, NOT bare %: DuckDB % truncates toward zero while
          -- the Spark side uses pmod (floor semantics, matching the
          -- streaming twin's Math.floorMod), so a pre-1970 ts_ms would
          -- land in a different window under bare % (r13 sweep)
          ts_ms - ((ts_ms % 3600000 + 3600000) % 3600000) AS window_start_ms
        FROM l),
      a AS (
        SELECT *,
          SUM(CASE WHEN is_reversal THEN 1 ELSE 0 END)
            OVER (PARTITION BY owner ORDER BY ts_ms, event_id
                  ROWS UNBOUNDED PRECEDING) AS rapid_reversals,
          COUNT(*) OVER ww AS transfers_in_window,
          SUM(amount_c) OVER ww AS volume_in_window
        FROM r WINDOW ww AS (PARTITION BY owner, window_start_ms
                             ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING))
      SELECT owner, event_id, ts_ms, outbound, is_reversal,
        CAST(rapid_reversals AS BIGINT) AS rapid_reversals, window_start_ms,
        CAST(transfers_in_window AS BIGINT) AS transfers_in_window,
        CAST(volume_in_window AS BIGINT) AS volume_in_window,
        rapid_reversals >= 3 OR transfers_in_window > 10
          OR volume_in_window > 100000 AS is_flagged
      FROM a ORDER BY owner, ts_ms, event_id"""))

  val defs: Seq[QueryDef] = Seq(
    st1DeadlineTally, st2CommitReveal, st2DeadlineWinner, st4SlidingActivity,
    st6BoundedBuffer, st7TtlRetention, st9DailyLimit, st11GapSessions,
    st12RapidReversal)
}
