package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.FloorTime
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Second tranche of SURVEY §2 coverage: the join/agg shapes not in
  * [[Relational]] (J3/J5/J8, A4/A7/A8/A13), the generator/UDTF surface,
  * and typed-JSON projection. Same oracle-parity conventions as
  * [[Relational]]. */
object Relational2 {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  /** J3 stream→dim join, batch twin (useHiveVizState.ts:52-69: new draw
    * events matched to member dim by agentId). The live streaming version
    * is [[graft.streaming.StreamOps]]-composable: events stream ⋈ static
    * customer dim — Spark broadcasts the static side per micro-batch. */
  val j3StreamStatic = QueryDef(
    "j3_stream_static",
    (s, dir) => {
      val t = T(s, dir)
      t.events
        // NO forced broadcast: customer SCALES with SF (j2's rule — a
        // broadcast() hint on a scaling side becomes a hard 8 GB failure
        // at the 100 TB posture, where unhinted the optimizer broadcasts
        // only while the dim actually fits and degrades to a shuffle
        // join beyond that; r13 sweep)
        .join(t.customer, col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_members"))
        .orderBy(col("c_mktsegment"))
    },
    oracle = Some("""
      SELECT c_mktsegment, COUNT(*) AS n_events,
        COUNT(DISTINCT user_id) AS n_members
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J5 identity-link 1:1 bridge join with multiplier
    * (swarm-types.ts:170-179, client.ts:1426-1490): two entity spaces
    * linked by equal ids; linked weight = own stake + 2× linked stake,
    * in integer cents. */
  val j5IdentityLink = QueryDef(
    "j5_identity_link",
    (s, dir) => {
      val t = T(s, dir)
      t.customer.select(col("c_custkey"),
        round(col("c_acctbal") * lit(100), 0).cast("long").as("c_bal_c"))
        .join(t.supplier.select(col("s_suppkey"),
          round(col("s_acctbal") * lit(100), 0).cast("long").as("s_bal_c")),
          col("c_custkey") === col("s_suppkey"))
        .select(col("c_custkey").as("link_id"),
          (col("c_bal_c") + col("s_bal_c") * lit(2L)).as("weighted_stake_c"))
        .orderBy(col("link_id"))
    },
    oracle = Some("""
      SELECT c_custkey AS link_id,
        CAST(ROUND(c_acctbal * 100) AS BIGINT)
          + CAST(ROUND(s_acctbal * 100) AS BIGINT) * 2 AS weighted_stake_c
      FROM customer JOIN supplier ON c_custkey = s_suppkey
      ORDER BY link_id"""))

  /** J8 scan-lookup by secondary (non-key) column (registry.ts:190-204
    * getByAddress linear scan): predicate on a non-indexed attribute. */
  val j8SecondaryLookup = QueryDef(
    "j8_secondary_lookup",
    (s, dir) => T(s, dir).part
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .orderBy(col("p_partkey")),
    oracle = Some("""
      SELECT p_partkey, p_name, p_brand FROM part
      WHERE p_name LIKE '%widget%' ORDER BY p_partkey"""))

  /** A4 group-count by category + global average (TrustGraphScene.tsx:
    * 146-170: node count per tier; avgTrust = round(avg(weight))). */
  val a4GroupCountAvg = QueryDef(
    "a4_group_count_avg",
    (s, dir) => {
      val t = T(s, dir)
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_nodes"),
          sum(round(col("s_acctbal") * lit(100), 0).cast("long")).as("sum_c"))
        // integer-cents average, INTEGER-exact half-up: round(avg(double))
        // made a .5-boundary group's verdict a function of float
        // SUMMATION ORDER, and the decimal form that replaced it was
        // double-rounded — Spark's decimal division collapses to scale 6
        // (HALF_UP) before the outer round, so a group of >10^4 rows
        // with fractional part .4999995 rounded up where an exact
        // divide rounds down (r13 third sweep). Half-up over integers
        // has no intermediate: round(S / (100n)) = (S + 50n) div (100n)
        // for S ≥ 0, negated-magnitude for S < 0 (away-from-zero ties,
        // both engines' ROUND), exact at any group size. Both div
        // operands are non-negative per branch, so Spark's
        // truncate-toward-zero div and DuckDB's floor // agree.
        .withColumn("avg_trust",
          when(col("sum_c") >= lit(0L),
            expr("(sum_c + 50 * n_nodes) div (100 * n_nodes)"))
            .otherwise(-expr("(-sum_c + 50 * n_nodes) div (100 * n_nodes)")))
        .select(col("n_name"), col("n_nodes"), col("avg_trust"))
        .orderBy(col("n_name"))
    },
    oracle = Some("""
      WITH g AS (
        SELECT n_name, COUNT(*) AS n_nodes,
          CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_c
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name)
      SELECT n_name, n_nodes,
        CASE WHEN sum_c >= 0 THEN (sum_c + 50 * n_nodes) // (100 * n_nodes)
             ELSE -((-sum_c + 50 * n_nodes) // (100 * n_nodes)) END AS avg_trust
      FROM g ORDER BY n_name"""))

  /** A7 pool totals: totalStaked + duration-weighted total in bps integer
    * math (stake/page.tsx:92-102 with the W6 multiplier cascade). The
    * as-of deadline sits INSIDE the data's order-date range (orders run
    * to 2001-08-01) so ages span <30 through ≥180 and ALL FOUR tiers of
    * the cascade are live under the oracle gate — the previous
    * 2001-12-31 deadline made every age ≥152 days, leaving the
    * 12000/10000 branches permanently unexercised on both sides. */
  val a7PoolTotals = QueryDef(
    "a7_pool_totals",
    (s, dir) => T(s, dir).orders
      .withColumn("stake_c", round(col("o_totalprice") * lit(100), 0).cast("long"))
      .withColumn("age_days",
        datediff(lit("2001-08-15").cast("date"), col("o_orderdate").cast("date")).cast("long"))
      .withColumn("mult_bps", Tiers.multiplierBps(col("age_days")))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(col("stake_c")).cast("long").as("total_staked_c"),
        sum(expr("(stake_c * mult_bps) div 10000")).cast("long").as("total_weighted_c"))
      .orderBy(col("o_orderpriority")),
    oracle = Some("""
      WITH s AS (
        SELECT o_orderpriority,
          CAST(ROUND(o_totalprice * 100) AS BIGINT) AS stake_c,
          CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-08-15') >= 180 THEN 20000
               WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-08-15') >= 90 THEN 15000
               WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-08-15') >= 30 THEN 12000
               ELSE 10000 END AS mult_bps
        FROM orders)
      SELECT o_orderpriority,
        CAST(SUM(stake_c) AS BIGINT) AS total_staked_c,
        CAST(SUM((stake_c * mult_bps) // 10000) AS BIGINT) AS total_weighted_c
      FROM s GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** A8 monotonic entity counters (swarm-types.ts:15-17 agentCount /
    * signalCount / actionCount): per-nation registry counters maintained
    * from two entity relations. */
  val a8Counters = QueryDef(
    "a8_counters",
    (s, dir) => {
      val t = T(s, dir)
      val c = t.customer.select(col("c_nationkey").as("nk")).withColumn("kind", lit("customer"))
      val su = t.supplier.select(col("s_nationkey").as("nk")).withColumn("kind", lit("supplier"))
      c.unionByName(su)
        .groupBy(col("nk"))
        .agg(
          count_if(col("kind") === lit("customer")).as("customer_count"),
          count_if(col("kind") === lit("supplier")).as("supplier_count"),
          count(lit(1)).as("entity_count"))
        .orderBy(col("nk"))
    },
    oracle = Some("""
      SELECT nk,
        COUNT(*) FILTER (WHERE kind = 'customer') AS customer_count,
        COUNT(*) FILTER (WHERE kind = 'supplier') AS supplier_count,
        COUNT(*) AS entity_count
      FROM (SELECT c_nationkey AS nk, 'customer' AS kind FROM customer
            UNION ALL
            SELECT s_nationkey AS nk, 'supplier' AS kind FROM supplier)
      GROUP BY nk ORDER BY nk"""))

  /** A13 count + pagination envelope (hive-api.ts:203-215 {draws, total}):
    * page slice carrying the unpaginated total as a column. */
  val a13PageEnvelope = QueryDef(
    "a13_page_envelope",
    (s, dir) => {
      val t = T(s, dir)
      val total = t.orders.agg(count(lit(1)).as("total"))
      t.orders
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .crossJoin(broadcast(total))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    },
    oracle = Some("""
      SELECT o_orderkey, o_totalprice, (SELECT COUNT(*) FROM orders) AS total
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))

  /** Generator/UDTF surface (plan/route.ts:47-126: 1 mission → N step
    * rows, capped 12): explode first 12 tokens with ordinality. */
  val udtfExplodeSteps = QueryDef(
    "udtf_explode_steps",
    (s, dir) => T(s, dir).documents
      .filter(col("doc_id") < lit(50L))
      .select(col("doc_id"),
        posexplode(slice(split(col("text"), " "), 1, 12)))
      .select(col("doc_id"), (col("pos") + lit(1)).cast("long").as("step_idx"),
        col("col").as("step_word"))
      .orderBy(col("doc_id"), col("step_idx")),
    oracle = Some("""
      SELECT doc_id,
        CAST(generate_subscripts(l, 1) AS BIGINT) AS step_idx,
        unnest(l) AS step_word
      FROM (SELECT doc_id, list_slice(string_split(text, ' '), 1, 12) AS l
            FROM documents WHERE doc_id < 50)
      ORDER BY doc_id, step_idx"""))

  /** Typed JSON parse with per-field defaults (critique/route.ts:50-85;
    * from_json into a declared struct, defaulted when absent/invalid). */
  val fJsonStruct = QueryDef(
    "f_json_struct",
    // the oracle mirrors from_json's TYPED semantics via the RAW json
    // text (json_extract, not _string): a JSON string "7" or float 1.9
    // does NOT coerce into the declared bigint field (from_json nulls
    // the row; a bare CAST of the string form would return 7 / throw),
    // so the integer-shape regexp over the raw token is the equivalence.
    // TRY_CAST, not CAST, behind the regexp: an out-of-Long-range
    // integer token (e.g. 20 digits) passes the shape test but
    // permissive from_json nulls it → -1, while a plain CAST would
    // error the whole oracle query (ADVICE r12)
    (s, dir) => graft.QueryDef.kernelSorted(
      T(s, dir).events.select(col("event_id"), col("props")),
      col("event_id")) {
      _.withColumn("j", from_json(col("props"), lit("struct<k: bigint>")))
        .select(col("event_id"),
          coalesce(col("j.k"), lit(-1L)).as("k_or_default"))
    },
    oracle = Some("""
      SELECT event_id,
        COALESCE(CASE WHEN json_valid(props) THEN
          CASE WHEN regexp_matches(
                 CAST(json_extract(props, '$.k') AS VARCHAR), '^-?[0-9]+$')
               THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END
        END, -1) AS k_or_default
      FROM events ORDER BY event_id"""))

  /** Dirty-JSON recovery (swarm-llm.server.ts:17-37): every LLM
    * plan/critique/oracle response in the reference goes through
    * `extractJson` — strict parse, else the first-'{'-to-last-'}' slice,
    * else null. The fixture derives four deterministic response shapes
    * from `props` (clean JSON / prose-wrapped JSON / no JSON at all /
    * braces that never parse), so every branch of the scan is
    * oracle-checked; the recovered text then feeds the usual typed
    * extraction. The DuckDB twin restates the scan with position
    * arithmetic + `json_valid` (the same acceptance set as the strict
    * validator behind [[graft.functions.Udfs.jsonScan]]). */
  val fJsonScan = QueryDef(
    "f_json_scan",
    (s, dir) => {
      val m = pmod(col("event_id"), lit(4L))
      val dirty = when(m === 0L, col("props"))
        .when(m === 1L, concat(lit("Sure! Here is the JSON you asked for:\n"),
          col("props"), lit("\nHope that helps.")))
        .when(m === 2L, lit("Sorry, I cannot produce structured output."))
        .otherwise(concat(lit("Result: {oops "), col("props"), lit(" trailing }")))
      graft.QueryDef.kernelSorted(
        T(s, dir).events.select(col("event_id"), col("props")),
        col("event_id")) {
        _.withColumn("json_out", graft.functions.Udfs.jsonScanUdf(dirty))
          // same bounded integer-shape guard as f_json_extract: a bare
          // ANSI cast would throw on a non-integral or out-of-range token
          // under the arbitrary-store tier (DuckDB's bare CAST errors the
          // oracle in the same scenario), where integer-or-null is the
          // semantics both engines express exactly (ADVICE r12 sibling)
          .withColumn("k_str", get_json_object(col("json_out"), "$.k"))
          .select(col("event_id"), col("json_out"),
            when(col("k_str").rlike("^-?[0-9]{1,18}$"),
              col("k_str").cast("long")).as("k"))
      }
    },
    oracle = Some("""
      WITH d AS (
        SELECT event_id,
          CASE event_id % 4
            WHEN 0 THEN props
            WHEN 1 THEN 'Sure! Here is the JSON you asked for:' || chr(10) ||
                        props || chr(10) || 'Hope that helps.'
            WHEN 2 THEN 'Sorry, I cannot produce structured output.'
            ELSE 'Result: {oops ' || props || ' trailing }'
          END AS raw
        FROM events),
      -- Java String.trim strips EVERY char <= 0x20 (not just the five
      -- classic whitespace chars — e.g. a leading 0x01 goes too), so the
      -- twin must strip the full [\x00-\x20] range; a chr-list trim that
      -- stopped at \r diverged on exotic control-char padding (r13 sweep)
      t AS (SELECT event_id,
              regexp_replace(raw, '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g') AS s
            FROM d),
      b AS (SELECT event_id, s, strpos(s, '{') AS st,
              CASE WHEN strpos(reverse(s), '}') = 0 THEN 0
                   ELSE length(s) - strpos(reverse(s), '}') + 1 END AS en
            FROM t),
      x AS (SELECT event_id,
              CASE WHEN s = '' THEN NULL
                   WHEN json_valid(s) THEN s
                   WHEN st = 0 OR en = 0 OR en <= st THEN NULL
                   WHEN json_valid(substr(s, st, en - st + 1))
                     THEN substr(s, st, en - st + 1)
                   ELSE NULL END AS json_out
            FROM b)
      SELECT event_id, json_out,
        CASE WHEN regexp_matches(
               json_extract_string(json_out, '$.k'), '^-?[0-9]{1,18}$')
             THEN CAST(json_extract_string(json_out, '$.k') AS BIGINT)
        END AS k
      FROM x ORDER BY event_id"""))

  /** Countdown decomposition d/h/m (governance/[id]/page.tsx:18-25):
    * remaining time to a fixed deadline, split by integer division. */
  val fCountdown = QueryDef(
    "f_countdown",
    (s, dir) => T(s, dir).events
      .withColumn("remaining_s",
        greatest(lit(0L), expr("(1706659200000 - ts_ms) div 1000")))
      .select(
        col("event_id"),
        expr("remaining_s div 86400").as("days"),
        expr("(remaining_s % 86400) div 3600").as("hours"),
        expr("(remaining_s % 3600) div 60").as("minutes"))
      .orderBy(col("event_id")),
    oracle = Some("""
      WITH r AS (
        SELECT event_id,
          GREATEST(0, (1706659200000 - epoch_ms(ts)) // 1000) AS remaining_s
        FROM events)
      SELECT event_id,
        remaining_s // 86400 AS days,
        (remaining_s % 86400) // 3600 AS hours,
        (remaining_s % 3600) // 60 AS minutes
      FROM r ORDER BY event_id"""))

  /** A5 cube variant (lib/hive-api.ts:365-373): the type×day earnings
    * matrix as a real CUBE — cell values, row totals, column totals and
    * the grand total in one pass with partial aggregation (SURVEY §2.4
    * names `cube` as the natural form of the reference's hand-rolled
    * conditional-sum matrix). Rolled-up dimensions are labelled 'ALL'. */
  val a5CubeMatrix = QueryDef(
    "a5_cube_matrix",
    (s, dir) => T(s, dir).events
      // floor bucketing, a3's rule — bare div truncates pre-1970 rows
      // into a different day cell than a3/the streaming window() starts
      .withColumn("epoch_day",
        FloorTime.floorDiv("ts", 86400000000000L))
      .cube(col("event_type"), col("epoch_day"))
      // the rollup label comes from grouping(), NOT coalesce: a genuine
      // NULL event_type would otherwise be relabeled 'ALL' too, colliding
      // with the rollup rows on the sort key and making the ordered
      // compare flap between equal-key rows; data NULLs stay NULL (and
      // sort pinned nulls-last, DuckDB's default)
      .agg(
        // guarded value→decimal (Relational.decV): NaN/Inf/out-of-range
        // event amounts fold to null on both engines instead of an ANSI
        // cast throw (r13 third sweep — the whole events.value family)
        sum(Relational.decV(col("value"))).cast("double").as("sum_value"),
        count(lit(1)).as("n"),
        grouping(col("event_type")).as("g_et"),
        grouping(col("epoch_day")).as("g_ed"))
      .select(
        when(col("g_et") === 1, lit("ALL"))
          .otherwise(col("event_type")).as("event_type"),
        when(col("g_ed") === 1, lit("ALL"))
          .otherwise(col("epoch_day").cast("string")).as("epoch_day"),
        col("sum_value"), col("n"))
      .orderBy(col("event_type").asc_nulls_last, col("epoch_day").asc_nulls_last),
    oracle = Some("""
      WITH e AS (
        SELECT event_type,
          (epoch_ms(ts) - ((epoch_ms(ts) % 86400000 + 86400000) % 86400000))
            // 86400000 AS epoch_day, value
        FROM events)
      SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS event_type,
        CASE WHEN GROUPING(epoch_day) = 1 THEN 'ALL'
             ELSE CAST(epoch_day AS VARCHAR) END AS epoch_day,
        CAST(SUM(CASE WHEN ABS(value) < 1e16 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_value,
        COUNT(*) AS n
      FROM e GROUP BY CUBE(event_type, epoch_day)
      ORDER BY event_type NULLS LAST, epoch_day NULLS LAST"""))

  /** Heuristic planner expansion (plan/route.ts:47-126): one mission row
    * generates its ordered step rows — the deterministic fallback the
    * reference uses when the LLM planner is unavailable. Faithful to the
    * reference's structure: the single-member special case, the
    * per-pattern step templates (pipeline 3, debate 4, red_team 4), the
    * `?? members[i]` fallback chains for writer/editor/publisher/judge
    * slots, and the maxSteps slice (`:125`). Missions/patterns/member
    * counts derive deterministically from documents. */
  val udtfPlanExpand = QueryDef(
    "udtf_plan_expand",
    (s, dir) => {
      def step(no: Int, title: String, slot: Column) =
        struct(lit(no).as("no"), lit(title).as("title"), slot.cast("long").as("slot"))
      val n = col("n_members")
      val editorSlot = when(n >= 2, lit(1)).otherwise(lit(0))
      val pubSlot = when(n >= 3, lit(2)).otherwise(n - 1)
      val judgeSlot = when(n >= 3, lit(2)).otherwise(n - 1)
      val steps =
        when(n === 1, array(step(1, "Complete mission", lit(0))))
          .when(col("pattern") === lit("pipeline"), array(
            step(1, "Draft", lit(0)),
            step(2, "Review", editorSlot),
            step(3, "Finalize", pubSlot)))
          .when(col("pattern") === lit("debate"), array(
            step(1, "Proposal A", lit(0)),
            step(2, "Proposal B", lit(1)),
            step(3, "Judge", judgeSlot),
            step(4, "Final", judgeSlot)))
          .otherwise(array( // red_team
            step(1, "Draft", lit(0)),
            step(2, "Red team", lit(1)),
            step(3, "Patch", lit(0)),
            step(4, "Finalize", pubSlot)))
      T(s, dir).documents
        .select(col("doc_id"),
          element_at(array(lit("pipeline"), lit("debate"), lit("red_team")),
            (pmod(col("doc_id"), lit(3)) + lit(1)).cast("int")).as("pattern"),
          (pmod(col("doc_id"), lit(4)) + lit(1)).cast("int").as("n_members"),
          when(pmod(col("doc_id"), lit(5)) === lit(0), lit(3))
            .otherwise(lit(12)).as("max_steps"))
        .select(col("doc_id"), col("pattern"), col("max_steps"),
          explode(steps).as("st"))
        .filter(col("st.no") <= col("max_steps")) // the slice(0, maxSteps)
        .select(col("doc_id"), col("pattern"),
          col("st.no").cast("long").as("step_no"),
          col("st.title").as("title"),
          col("st.slot").as("assignee_slot"))
        .orderBy(col("doc_id"), col("step_no"))
    },
    oracle = Some("""
      WITH m AS (
        SELECT doc_id,
          ['pipeline','debate','red_team'][CAST(doc_id % 3 AS INT) + 1] AS pattern,
          CAST(doc_id % 4 AS INT) + 1 AS n_members,
          CASE WHEN doc_id % 5 = 0 THEN 3 ELSE 12 END AS max_steps
        FROM documents),
      s AS (
        SELECT doc_id, pattern, max_steps,
          unnest(CASE
            WHEN n_members = 1 THEN
              [{'no': 1, 'title': 'Complete mission', 'slot': 0}]
            WHEN pattern = 'pipeline' THEN [
              {'no': 1, 'title': 'Draft', 'slot': 0},
              {'no': 2, 'title': 'Review',
               'slot': CASE WHEN n_members >= 2 THEN 1 ELSE 0 END},
              {'no': 3, 'title': 'Finalize',
               'slot': CASE WHEN n_members >= 3 THEN 2 ELSE n_members - 1 END}]
            WHEN pattern = 'debate' THEN [
              {'no': 1, 'title': 'Proposal A', 'slot': 0},
              {'no': 2, 'title': 'Proposal B', 'slot': 1},
              {'no': 3, 'title': 'Judge',
               'slot': CASE WHEN n_members >= 3 THEN 2 ELSE n_members - 1 END},
              {'no': 4, 'title': 'Final',
               'slot': CASE WHEN n_members >= 3 THEN 2 ELSE n_members - 1 END}]
            ELSE [
              {'no': 1, 'title': 'Draft', 'slot': 0},
              {'no': 2, 'title': 'Red team', 'slot': 1},
              {'no': 3, 'title': 'Patch', 'slot': 0},
              {'no': 4, 'title': 'Finalize',
               'slot': CASE WHEN n_members >= 3 THEN 2 ELSE n_members - 1 END}]
          END) AS st
        FROM m)
      SELECT doc_id, pattern,
        CAST(st.no AS BIGINT) AS step_no, st.title AS title,
        CAST(st.slot AS BIGINT) AS assignee_slot
      FROM s WHERE st.no <= max_steps
      ORDER BY doc_id, step_no"""))

  /** Particle/trail generator UDTF (TrustGraphScene.tsx:216-247): one
    * graph edge generates its interpolated particle rows — count
    * `max(3, floor(NODES_PER_EDGE × dist/6))` with NODES_PER_EDGE = 6
    * (`:181,:224`), particle n at `t = n/(N+1)` lerped between the
    * endpoints (`:226-228`). Re-expressed integer-exact: endpoints live on
    * a deterministic integer grid derived from supplier keys, the lerp is
    * ×1000 fixed-point computed as a weighted sum `(a·(N+1−n) + b·n)·1000
    * div (N+1)` — numerator non-negative, so sign semantics are moot
    * (and both `div` and DuckDB's `//` TRUNCATE toward zero anyway —
    * verified `-7 // 4 = -1`; an earlier comment here claimed `//`
    * floors, contradicting the Relational.scala header) — and the only
    * float op is the
    * IEEE-correctly-rounded `sqrt` of an exact integer, identical in both
    * engines. (The reference's per-particle seeded jitter `:230-236` is
    * display-only noise and intentionally dropped — positions here are the
    * deterministic base positions.) */
  val udtfParticles = QueryDef(
    "udtf_particles",
    (s, dir) => {
      val e = T(s, dir).supplier.select(
        col("s_suppkey").as("edge_id"),
        pmod(col("s_suppkey") * lit(7L), lit(17L)).as("x0"),
        pmod(col("s_suppkey") * lit(5L), lit(13L)).as("y0"),
        pmod(col("s_suppkey") * lit(3L), lit(11L)).as("z0"),
        pmod(col("s_nationkey") * lit(11L), lit(17L)).as("x1"),
        pmod(col("s_nationkey") * lit(9L), lit(13L)).as("y1"),
        pmod(col("s_nationkey") * lit(13L), lit(11L)).as("z1"))
      e.withColumn("d2",
          expr("(x1-x0)*(x1-x0) + (y1-y0)*(y1-y0) + (z1-z0)*(z1-z0)"))
        .withColumn("n_particles",
          greatest(lit(3L), floor(lit(6.0) * sqrt(col("d2").cast("double")) / lit(6.0))))
        .select(col("edge_id"), col("x0"), col("y0"), col("z0"),
          col("x1"), col("y1"), col("z1"), col("n_particles"),
          explode(sequence(lit(1L), col("n_particles"))).as("particle_no"))
        .select(col("edge_id"), col("particle_no"),
          expr("(particle_no * 1000) div (n_particles + 1)").as("t_m"),
          expr("((x0 * (n_particles + 1 - particle_no) + x1 * particle_no) * 1000) div (n_particles + 1)").as("px_m"),
          expr("((y0 * (n_particles + 1 - particle_no) + y1 * particle_no) * 1000) div (n_particles + 1)").as("py_m"),
          expr("((z0 * (n_particles + 1 - particle_no) + z1 * particle_no) * 1000) div (n_particles + 1)").as("pz_m"))
        .orderBy(col("edge_id"), col("particle_no"))
    },
    oracle = Some("""
      WITH e AS (
        SELECT s_suppkey AS edge_id,
          (s_suppkey * 7) % 17 AS x0, (s_suppkey * 5) % 13 AS y0,
          (s_suppkey * 3) % 11 AS z0,
          (s_nationkey * 11) % 17 AS x1, (s_nationkey * 9) % 13 AS y1,
          (s_nationkey * 13) % 11 AS z1
        FROM supplier),
      d AS (
        SELECT *, (x1-x0)*(x1-x0) + (y1-y0)*(y1-y0) + (z1-z0)*(z1-z0) AS d2
        FROM e),
      n AS (
        SELECT *, GREATEST(3, CAST(FLOOR(6 * SQRT(d2) / 6) AS BIGINT)) AS n_particles
        FROM d),
      p AS (
        SELECT edge_id, x0, y0, z0, x1, y1, z1, n_particles,
          unnest(range(1, n_particles + 1)) AS particle_no
        FROM n)
      SELECT edge_id, particle_no,
        (particle_no * 1000) // (n_particles + 1) AS t_m,
        ((x0 * (n_particles + 1 - particle_no) + x1 * particle_no) * 1000) // (n_particles + 1) AS px_m,
        ((y0 * (n_particles + 1 - particle_no) + y1 * particle_no) * 1000) // (n_particles + 1) AS py_m,
        ((z0 * (n_particles + 1 - particle_no) + z1 * particle_no) * 1000) // (n_particles + 1) AS pz_m
      FROM p ORDER BY edge_id, particle_no"""))

  val defs: Seq[QueryDef] = Seq(
    j3StreamStatic, j5IdentityLink, j8SecondaryLookup,
    a4GroupCountAvg, a7PoolTotals, a8Counters, a13PageEnvelope,
    udtfExplodeSteps, udtfPlanExpand, udtfParticles, fJsonStruct, fJsonScan,
    fCountdown, a5CubeMatrix)
}
