package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Governance/account surface: typed little-endian account decoders for the
  * reference's real record layouts, the Groth16 *structural* verify_proof,
  * and the composed vote_weight operator.
  *
  * Layouts (all offsets after the 8-byte Anchor discriminator):
  *  - FastAction, 145 bytes — programs/kamiyo-fast-voting/src/lib.rs:194-213:
  *    action_id u64 | action_hash [32] | description_hash [32] | creator [32]
  *    | threshold u8 | votes_for u32 | votes_against u32 | vote_count u32
  *    | created_slot u64 | deadline_slot u64 | executed bool | result u8
  *    | padding u8 | bump u8 — integers little-endian, as the SDK parsers
  *    read them (client.ts:539-602 readUInt32LE/readBigUInt64LE).
  *  - FastVote, 114 bytes — lib.rs:215-227: fast_action [32] | voter [32]
  *    | voter_commitment [32] | vote_value bool | voted_slot u64 | bump u8.
  *  - AgentRegistry — client.ts:539-602 parseRegistryManually: authority [32]
  *    | agents_root [32] | agent_count u32 | signal_count u32
  *    | swarm_action_count u32 | epoch u64 | min_stake u64
  *    | min_signal_confidence u8 | bump u8 | paused u8.
  *
  * The test tables carry no binary columns, so each decode query constructs
  * the record from typed columns (exact layout, LE ints, real 32-byte
  * digests for hash/pubkey fields), then decodes it back at fixed offsets;
  * the DuckDB oracle selects the original values, so any encode/decode
  * asymmetry — wrong offset, wrong endianness, wrong width — fails the
  * hash check. The integer codec is the native
  * [[graft.functions.LEDecode]]/[[graft.functions.LEEncode]] expression
  * pair (r21; previously per-byte `hex`/`unhex`/`conv`/`substring`
  * builtin chains), the 32-byte fields stay single-slice builtins — no
  * UDF anywhere, so at 100 TB the decode stage fuses into whole-stage
  * codegen over the scan.
  */
object Governance {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  // --- little-endian fixed-width codec (expression-level, codegen'd) ---

  /** Encode a long as `nBytes` little-endian bytes. Values wider than
    * the field wrap to their low bytes (u8/u32 record semantics). Since
    * r21 this is the native [[graft.functions.LEEncode]] expression —
    * the old builtin chain (`unhex(concat(substring(lpad(hex(pmod(…)))…`)
    * built ~2n intermediate strings per field per row; the native
    * expression emits the bytes in one codegen'd loop, bit-identical
    * (ExpressionsSpec pins it against the old chain). */
  private def encLE(colExpr: String, nBytes: Int): String =
    s"le_encode($colExpr, $nBytes)"

  /** Decode `nBytes` little-endian bytes at 1-based `off` into a long.
    *
    * Range note: the layouts below declare every 8-byte (u64) field —
    * slot numbers, ids, counters — below 2^63, so LongType holds them
    * exactly. A high-bit u64 is unrepresentable in a long; `try_cast`
    * makes it an explicit null sentinel in ANSI and legacy modes alike
    * (a plain cast would throw under Spark 4's default ANSI and silently
    * null under legacy — neither is a stable contract). Full-range
    * readBigUInt64LE semantics would decode to decimal(20,0); no
    * reference field uses the high bit. Pinned by AccountsSpec. */
  private def decLE(recCol: String, off: Int, nBytes: Int): Column =
    decLEAt(recCol, off.toString, nBytes)

  /** [[decLE]] with a DYNAMIC offset expression (count-prefixed layouts
    * address trailing fields past a variable-length body). One body for
    * both: decodePubkeyList previously inlined this expression, forking
    * the u64/u8 decode semantics from any future decLE fix. */
  private def decLEAt(recCol: String, offExpr: String, nBytes: Int): Column =
    expr(decLESql(recCol, offExpr, nBytes))

  /** SQL-text form of [[decLEAt]] — for layouts whose later offsets
    * embed an earlier decoded field (the pubkey list's count-driven
    * tail), where the sub-expression must be INLINED into the offset.
    * Since r21 the native [[graft.functions.LEDecode]] expression: the
    * old per-byte builtin chain (`try_cast(conv(hex(concat(substring ×
    * n)), 16, 10) AS bigint)`) allocated ~3n+3 intermediate objects per
    * field per row — the s2 decode family's dominant per-row cost (a
    * 14-field record paid it 14×). Bit-identical semantics including
    * the null edges (truncated record → low bytes; no byte → null;
    * high-bit u64 → null), pinned by ExpressionsSpec against the old
    * chain and by the unchanged AccountsSpec round-trips + oracle. */
  private def decLESql(recCol: String, offExpr: String, nBytes: Int): String =
    s"le_decode($recCol, ($offExpr), $nBytes)"

  /** 32-byte field at `off`, rendered lowercase hex for comparison. */
  private def dec32hex(recCol: String, off: Int): Column =
    lower(hex(expr(s"substring($recCol, $off, 32)")))

  /** 32-byte digest of a string expression (sha2 hex → bytes). */
  private def digest32(e: String): String = s"unhex(sha2($e, 256))"

  /** Decode-side field list for a FastAction record column — used by the
    * catalog query and driven directly (with ByteBuffer-LE-built records)
    * by the round-trip spec, which pins the endianness independently. */
  def fastActionFields(rec: String): Seq[Column] = Seq(
    length(col(rec)).cast("long").as("rec_len"), // pinned 145 (lib.rs LEN)
    decLE(rec, 9, 8).as("action_id"),
    dec32hex(rec, 17).as("action_hash_hex"),
    dec32hex(rec, 49).as("description_hash_hex"),
    dec32hex(rec, 81).as("creator_hex"),
    decLE(rec, 113, 1).as("threshold"),
    decLE(rec, 114, 4).as("votes_for"),
    decLE(rec, 118, 4).as("votes_against"),
    decLE(rec, 122, 4).as("vote_count"),
    decLE(rec, 126, 8).as("created_slot"),
    decLE(rec, 134, 8).as("deadline_slot"),
    (decLE(rec, 142, 1) === lit(1L)).as("executed"),
    decLE(rec, 143, 1).as("result"),
    decLE(rec, 145, 1).as("bump"))

  def fastVoteFields(rec: String): Seq[Column] = Seq(
    length(col(rec)).cast("long").as("rec_len"), // pinned 114 (lib.rs LEN)
    dec32hex(rec, 9).as("fast_action_hex"),
    dec32hex(rec, 41).as("voter_hex"),
    dec32hex(rec, 73).as("voter_commitment_hex"),
    (decLE(rec, 105, 1) === lit(1L)).as("vote_value"),
    decLE(rec, 106, 8).as("voted_slot"),
    decLE(rec, 114, 1).as("bump"))

  /** Decode-side field list for a pubkey-list record column — the
    * VARIABLE layout (count-driven offsets: bump sits after the
    * count-sized pubkey tail). Used by the catalog query and driven
    * directly by the round-trip spec with ByteBuffer-LE-built records,
    * like every fixed-layout decoder — the spec previously re-derived
    * these expressions inline, which tested its own copy instead of
    * the engine's (r13 test sweep). `pk` is the decoded pubkey-hex
    * ARRAY; the query explodes it, the spec asserts it whole. */
  def pubkeyListFields(rec: String): Seq[Column] = {
    val cnt = decLESql(rec, "41", 4)
    Seq(
      dec32hex(rec, 9).as("admin_hex"),
      expr(cnt).as("cnt"),
      decLEAt(rec, s"45 + cast(($cnt) as int) * 32", 1).as("bump"),
      // slice-over-greatest, not sequence(1, cnt): Spark's sequence
      // DESCENDS when start > stop, so cnt=0 would yield [1,0], not []
      expr(s"""transform(
           slice(sequence(1, greatest(cast(($cnt) as int), 1)), 1, cast(($cnt) as int)),
           i -> lower(hex(substring($rec, 45 + (i - 1) * 32, 32))))""").as("pk"))
  }

  def registryFields(rec: String): Seq[Column] = Seq(
    length(col(rec)).cast("long").as("rec_len"), // pinned 103 (8+32+32+4*3+8*2+1*3)
    dec32hex(rec, 9).as("authority_hex"),
    dec32hex(rec, 41).as("agents_root_hex"),
    decLE(rec, 73, 4).as("agent_count"),
    decLE(rec, 77, 4).as("signal_count"),
    decLE(rec, 81, 4).as("swarm_action_count"),
    decLE(rec, 85, 8).as("epoch"),
    decLE(rec, 93, 8).as("min_stake"),
    decLE(rec, 101, 1).as("min_signal_confidence"),
    decLE(rec, 102, 1).as("bump"),
    (decLE(rec, 103, 1) =!= lit(0L)).as("paused"))

  /** S2 typed decode: FastAction 145-byte record (lib.rs:194-213).
    * Synthesized per order, decoded field-by-field at the exact offsets. */
  val decodeFastAction = QueryDef(
    "s2_decode_fast_action",
    // the global sort runs on the RAW key BELOW the synthesize+decode
    // projection: action_id decodes to exactly o_orderkey, and sorting
    // the projected alias instead would put the Sort ABOVE the heavy
    // Project — the range exchange then evaluates the whole 3×sha256
    // encode + 14-field decode TWICE (boundary-sampling pass + shuffle
    // pass; the r14 sf10 profile measured two identical ~300
    // task-second stages). Sorted-then-projected, the sampler touches
    // only the scan and the decode runs once, post-exchange: sf10
    // 21.6 → ~11 s, same rows, same order, same oracle. Via the shared
    // kernelSorted (r19): the explicit-count range exchange is exempt
    // from the AQE coalesce that would otherwise narrow the decode
    // stage (the crypto_commitment find, applied family-wide).
    (s, dir) => graft.QueryDef.kernelSorted(
      T(s, dir).orders, col("o_orderkey")) { sorted => sorted
      .withColumn("threshold_u8", pmod(col("o_orderkey"), lit(100L)) + lit(1L))
      .withColumn("vfor_u32", pmod(col("o_custkey"), lit(1000L)))
      .withColumn("vagainst_u32", pmod(col("o_orderkey"), lit(997L)))
      .withColumn("created_u64", col("o_orderkey") * lit(7L))
      .withColumn("executed_u8", pmod(col("o_orderkey"), lit(2L)))
      .withColumn("result_u8", pmod(col("o_orderkey"), lit(3L)))
      .withColumn("bump_u8", pmod(col("o_orderkey"), lit(256L)))
      .withColumn("rec", expr(s"""concat(
        unhex('6772616674464163'),
        ${encLE("o_orderkey", 8)},
        ${digest32("cast(o_orderkey as string)")},
        ${digest32("o_orderpriority")},
        ${digest32("cast(o_custkey as string)")},
        ${encLE("threshold_u8", 1)},
        ${encLE("vfor_u32", 4)},
        ${encLE("vagainst_u32", 4)},
        ${encLE("vfor_u32 + vagainst_u32", 4)},
        ${encLE("created_u64", 8)},
        ${encLE("created_u64 + 75", 8)},
        ${encLE("executed_u8", 1)},
        ${encLE("result_u8", 1)},
        unhex('00'),
        ${encLE("bump_u8", 1)})"""))
      .select(fastActionFields("rec"): _*) },
    oracle = Some("""
      SELECT CAST(145 AS BIGINT) AS rec_len,
        o_orderkey AS action_id,
        sha256(CAST(o_orderkey AS VARCHAR)) AS action_hash_hex,
        sha256(o_orderpriority) AS description_hash_hex,
        sha256(CAST(o_custkey AS VARCHAR)) AS creator_hex,
        o_orderkey % 100 + 1 AS threshold,
        o_custkey % 1000 AS votes_for,
        o_orderkey % 997 AS votes_against,
        o_custkey % 1000 + o_orderkey % 997 AS vote_count,
        o_orderkey * 7 AS created_slot,
        o_orderkey * 7 + 75 AS deadline_slot,
        o_orderkey % 2 = 1 AS executed,
        o_orderkey % 3 AS result,
        o_orderkey % 256 AS bump
      FROM orders ORDER BY action_id"""))

  /** S2 typed decode: FastVote 114-byte record (lib.rs:215-227). */
  val decodeFastVote = QueryDef(
    "s2_decode_fast_vote",
    (s, dir) => T(s, dir).customer
      .withColumn("vote_u8", pmod(col("c_custkey"), lit(2L)))
      .withColumn("slot_u64", col("c_custkey") * lit(11L) + lit(5L))
      .withColumn("bump_u8", pmod(col("c_custkey") * lit(3L), lit(256L)))
      .withColumn("rec", expr(s"""concat(
        unhex('6772616674465674'),
        ${digest32("cast(c_custkey as string)")},
        ${digest32("c_name")},
        ${digest32("c_mktsegment")},
        ${encLE("vote_u8", 1)},
        ${encLE("slot_u64", 8)},
        ${encLE("bump_u8", 1)})"""))
      .select(fastVoteFields("rec") :+ col("c_custkey"): _*)
      .orderBy(col("c_custkey")),
    oracle = Some("""
      SELECT CAST(114 AS BIGINT) AS rec_len,
        sha256(CAST(c_custkey AS VARCHAR)) AS fast_action_hex,
        sha256(c_name) AS voter_hex,
        sha256(c_mktsegment) AS voter_commitment_hex,
        c_custkey % 2 = 1 AS vote_value,
        c_custkey * 11 + 5 AS voted_slot,
        (c_custkey * 3) % 256 AS bump,
        c_custkey
      FROM customer ORDER BY c_custkey"""))

  /** S2 typed decode: AgentRegistry record (client.ts:539-602 manual
    * parse: u32 counters, u64 epoch/min_stake, u8 tail flags). */
  val decodeRegistry = QueryDef(
    "s2_decode_registry",
    (s, dir) => T(s, dir).nation
      .withColumn("agent_cnt", col("n_nationkey") * lit(3L))
      .withColumn("signal_cnt", col("n_nationkey") * lit(5L))
      .withColumn("action_cnt", col("n_nationkey") * lit(7L))
      .withColumn("epoch_u64", lit(19000L) + col("n_nationkey"))
      .withColumn("min_stake_u64", (col("n_nationkey") + lit(1L)) * lit(1000000L))
      .withColumn("conf_u8", pmod(col("n_nationkey"), lit(100L)))
      .withColumn("bump_u8", lit(255L) - col("n_nationkey"))
      .withColumn("paused_u8", pmod(col("n_nationkey"), lit(2L)))
      .withColumn("rec", expr(s"""concat(
        unhex('6772616674526567'),
        ${digest32("n_name")},
        ${digest32("cast(n_regionkey as string)")},
        ${encLE("agent_cnt", 4)},
        ${encLE("signal_cnt", 4)},
        ${encLE("action_cnt", 4)},
        ${encLE("epoch_u64", 8)},
        ${encLE("min_stake_u64", 8)},
        ${encLE("conf_u8", 1)},
        ${encLE("bump_u8", 1)},
        ${encLE("paused_u8", 1)})"""))
      .select(col("n_nationkey").as("registry_id") +: registryFields("rec"): _*)
      .orderBy(col("registry_id")),
    oracle = Some("""
      SELECT n_nationkey AS registry_id,
        CAST(103 AS BIGINT) AS rec_len,
        sha256(n_name) AS authority_hex,
        sha256(CAST(n_regionkey AS VARCHAR)) AS agents_root_hex,
        n_nationkey * 3 AS agent_count,
        n_nationkey * 5 AS signal_count,
        n_nationkey * 7 AS swarm_action_count,
        19000 + n_nationkey AS epoch,
        (n_nationkey + 1) * 1000000 AS min_stake,
        n_nationkey % 100 AS min_signal_confidence,
        255 - n_nationkey AS bump,
        n_nationkey % 2 <> 0 AS paused
      FROM nation ORDER BY registry_id"""))

  // --- transfer-hook account decodes (transfer-hook.ts) ---

  /** TransferState, 78 bytes — packages/hive-sdk/src/swarmteams/
    * transfer-hook.ts:35-46 (layout), :143-167 (manual LE parse):
    * owner [32] | last_transfer_time u64 | last_transfer_outbound bool
    * | last_transfer_amount u64 | transfers_in_window u16
    * | volume_in_window u64 | window_start u64 | rapid_reversals u8
    * | is_flagged bool | bump u8 — after the 8-byte discriminator.
    * This is the per-owner anti-wash-trade state the reference's hook
    * maintains on-chain; [[StreamingTwins.st12RapidReversal]] recomputes it
    * from raw transfer events. */
  def transferStateFields(rec: String): Seq[Column] = Seq(
    length(col(rec)).cast("long").as("rec_len"), // pinned 78
    dec32hex(rec, 9).as("owner_hex"),
    decLE(rec, 41, 8).as("last_transfer_time"),
    (decLE(rec, 49, 1) === lit(1L)).as("last_transfer_outbound"),
    decLE(rec, 50, 8).as("last_transfer_amount"),
    decLE(rec, 58, 2).as("transfers_in_window"),
    decLE(rec, 60, 8).as("volume_in_window"),
    decLE(rec, 68, 8).as("window_start"),
    decLE(rec, 76, 1).as("rapid_reversals"),
    (decLE(rec, 77, 1) === lit(1L)).as("is_flagged"),
    decLE(rec, 78, 1).as("bump"))

  /** HookConfig, 85 bytes — transfer-hook.ts:12-23 (layout), :85-105
    * (manual LE parse): admin [32] | enabled bool | cooldown_seconds u64
    * | rate_limit_window u64 | max_transfers_per_window u16
    * | max_volume_per_window u64 | burn_enabled bool | burn_rate_bps u64
    * | total_burned u64 | bump u8. */
  def hookConfigFields(rec: String): Seq[Column] = Seq(
    length(col(rec)).cast("long").as("rec_len"), // pinned 85
    dec32hex(rec, 9).as("admin_hex"),
    (decLE(rec, 41, 1) === lit(1L)).as("enabled"),
    decLE(rec, 42, 8).as("cooldown_seconds"),
    decLE(rec, 50, 8).as("rate_limit_window"),
    decLE(rec, 58, 2).as("max_transfers_per_window"),
    decLE(rec, 60, 8).as("max_volume_per_window"),
    (decLE(rec, 68, 1) === lit(1L)).as("burn_enabled"),
    decLE(rec, 69, 8).as("burn_rate_bps"),
    decLE(rec, 77, 8).as("total_burned"),
    decLE(rec, 85, 1).as("bump"))

  /** S2 typed decode: TransferState record (transfer-hook.ts:143-167).
    * Synthesized per customer, decoded back at the exact offsets. */
  val decodeTransferState = QueryDef(
    "s2_decode_transfer_state",
    (s, dir) => T(s, dir).customer
      .withColumn("time_u64", lit(1700000000L) + col("c_custkey") * lit(13L))
      .withColumn("out_u8", pmod(col("c_custkey"), lit(2L)))
      .withColumn("amount_u64", col("c_custkey") * lit(997L) + lit(11L))
      .withColumn("txw_u16", pmod(col("c_custkey"), lit(50L)))
      .withColumn("vol_u64", col("c_custkey") * lit(5003L))
      .withColumn("wstart_u64",
        col("time_u64") - pmod(col("c_custkey") * lit(13L), lit(3600L)))
      .withColumn("rev_u8", pmod(col("c_custkey"), lit(7L)))
      .withColumn("flag_u8",
        when(col("rev_u8") >= lit(5L), lit(1L)).otherwise(lit(0L)))
      .withColumn("bump_u8", pmod(col("c_custkey"), lit(256L)))
      .withColumn("rec", expr(s"""concat(
        unhex('6772616674547853'),
        ${digest32("cast(c_custkey as string)")},
        ${encLE("time_u64", 8)},
        ${encLE("out_u8", 1)},
        ${encLE("amount_u64", 8)},
        ${encLE("txw_u16", 2)},
        ${encLE("vol_u64", 8)},
        ${encLE("wstart_u64", 8)},
        ${encLE("rev_u8", 1)},
        ${encLE("flag_u8", 1)},
        ${encLE("bump_u8", 1)})"""))
      .select(col("c_custkey") +: transferStateFields("rec"): _*)
      .orderBy(col("c_custkey")),
    oracle = Some("""
      SELECT c_custkey, CAST(78 AS BIGINT) AS rec_len,
        sha256(CAST(c_custkey AS VARCHAR)) AS owner_hex,
        1700000000 + c_custkey * 13 AS last_transfer_time,
        c_custkey % 2 = 1 AS last_transfer_outbound,
        c_custkey * 997 + 11 AS last_transfer_amount,
        c_custkey % 50 AS transfers_in_window,
        c_custkey * 5003 AS volume_in_window,
        1700000000 + c_custkey * 13 - (c_custkey * 13) % 3600 AS window_start,
        c_custkey % 7 AS rapid_reversals,
        c_custkey % 7 >= 5 AS is_flagged,
        c_custkey % 256 AS bump
      FROM customer ORDER BY c_custkey"""))

  /** S2 typed decode: HookConfig record (transfer-hook.ts:85-105). */
  val decodeHookConfig = QueryDef(
    "s2_decode_hook_config",
    (s, dir) => T(s, dir).nation
      .withColumn("en_u8", pmod(col("n_nationkey"), lit(2L)))
      .withColumn("cool_u64", lit(300L) + col("n_nationkey"))
      .withColumn("rlw_u64", lit(3600L) * (pmod(col("n_nationkey"), lit(4L)) + lit(1L)))
      .withColumn("maxtx_u16", lit(10L) + col("n_nationkey"))
      .withColumn("maxvol_u64", (col("n_nationkey") + lit(1L)) * lit(1000000L))
      .withColumn("burn_u8", when(pmod(col("n_nationkey"), lit(3L)) === lit(0L), lit(1L)).otherwise(lit(0L)))
      .withColumn("bps_u64", col("n_nationkey") * lit(25L))
      .withColumn("burned_u64", col("n_nationkey") * lit(123457L))
      .withColumn("bump_u8", lit(255L) - col("n_nationkey"))
      .withColumn("rec", expr(s"""concat(
        unhex('6772616674486b43'),
        ${digest32("n_name")},
        ${encLE("en_u8", 1)},
        ${encLE("cool_u64", 8)},
        ${encLE("rlw_u64", 8)},
        ${encLE("maxtx_u16", 2)},
        ${encLE("maxvol_u64", 8)},
        ${encLE("burn_u8", 1)},
        ${encLE("bps_u64", 8)},
        ${encLE("burned_u64", 8)},
        ${encLE("bump_u8", 1)})"""))
      .select(col("n_nationkey").as("config_id") +: hookConfigFields("rec"): _*)
      .orderBy(col("config_id")),
    oracle = Some("""
      SELECT n_nationkey AS config_id, CAST(85 AS BIGINT) AS rec_len,
        sha256(n_name) AS admin_hex,
        n_nationkey % 2 = 1 AS enabled,
        300 + n_nationkey AS cooldown_seconds,
        3600 * (n_nationkey % 4 + 1) AS rate_limit_window,
        10 + n_nationkey AS max_transfers_per_window,
        (n_nationkey + 1) * 1000000 AS max_volume_per_window,
        n_nationkey % 3 = 0 AS burn_enabled,
        n_nationkey * 25 AS burn_rate_bps,
        n_nationkey * 123457 AS total_burned,
        255 - n_nationkey AS bump
      FROM nation ORDER BY config_id"""))

  /** S2 count-prefixed record-array decode — the common Solana list
    * layout (BurnExemptList / PlatformWhitelist, transfer-hook.ts:108-137):
    * admin [32] | count u32 | count × pubkey [32] | bump u8, after the
    * discriminator. The element offset is COUNT-DRIVEN (45 + 32·i) and
    * bump sits after the variable tail (45 + 32·count) — both decoded
    * from the record itself, so a wrong count corrupts every downstream
    * field and fails the oracle. One output row per element
    * (posexplode_outer keeps count=0 lists as a null-element row, like
    * an empty whitelist still having its admin/bump read). */
  val decodePubkeyList = QueryDef(
    "s2_decode_pubkey_list",
    (s, dir) => T(s, dir).nation
      .withColumn("cnt_u32", pmod(col("n_nationkey"), lit(5L)))
      .withColumn("bump_u8", pmod(col("n_nationkey") * lit(7L), lit(256L)))
      .withColumn("rec", expr(s"""concat(
        unhex('6772616674506b4c'),
        ${digest32("n_name")},
        ${encLE("cnt_u32", 4)},
        coalesce(unhex(array_join(transform(
          slice(sequence(1, greatest(cast(cnt_u32 as int), 1)), 1, cast(cnt_u32 as int)),
          i -> sha2(concat('pk', cast(n_nationkey as string), ':',
                           cast(i - 1 as string)), 256)), '')),
          cast(unhex('') as binary)),
        ${encLE("bump_u8", 1)})"""))
      // decode side: everything below reads ONLY `rec`, through the
      // shared pubkeyListFields (one definition, spec-driven directly)
      .select((col("n_nationkey").as("list_id") +: pubkeyListFields("rec")): _*)
      .select(col("list_id"), col("admin_hex"), col("cnt"), col("bump"),
        posexplode_outer(col("pk")))
      .select(col("list_id"), col("admin_hex"), col("cnt"), col("bump"),
        col("pos").cast("long").as("idx"), col("col").as("pubkey_hex"))
      .orderBy(col("list_id"), col("idx")),
    oracle = Some("""
      WITH base AS (
        SELECT n_nationkey AS list_id, sha256(n_name) AS admin_hex,
          n_nationkey % 5 AS cnt, (n_nationkey * 7) % 256 AS bump
        FROM nation)
      SELECT list_id, admin_hex, cnt, bump,
        u.idx, sha256('pk' || CAST(list_id AS VARCHAR) || ':'
                      || CAST(u.idx AS VARCHAR)) AS pubkey_hex
      FROM base LEFT JOIN LATERAL
        (SELECT unnest(range(cnt)) AS idx) u ON TRUE
      ORDER BY list_id, idx"""))

  /** Groth16 structural verify_proof (shadow-id-gate.ts:127-156): the
    * check cascade the reference applies before handing off to a real ZK
    * verifier —
    *   1. commitment must match ^[a-f0-9]{64}$ else 'Invalid commitment format'
    *   2. proof must be exactly 256 bytes else 'Invalid proof length'
    *   3. marker-prefixed structural proofs: rejected when require_crypto
    *      (production), accepted-with-warning otherwise
    *   4. non-structural proofs fall to the ZK verifier, which this query
    *      deliberately models as ABSENT — the reference's own
    *      verifier-unavailable mode ('Cryptographic verification
    *      required but verifier not available', shadow-id-gate.ts:184-191).
    *      The verifier-PRESENT path is the round-11 sibling
    *      [[graft.operators.Crypto.cryptoGroth16Verify]] (real BN254
    *      pairing check); this one stays oracle-exact on the cascade.
    * Result struct {valid, threshold, cryptographic, error} flattened to
    * columns. Proof fixtures are synthesized per document to cover every
    * branch; both engines build identical bytes, so the cascade — byte
    * lengths, marker comparison, regex — is what the oracle checks. */
  val verifyProof = QueryDef(
    "crypto_verify_proof",
    (s, dir) => {
      val marker = "STRUCTURAL_PROOF_NOT_CRYPTOGRAPHIC"
      T(s, dir).documents
        .withColumn("commitment",
          when(pmod(col("doc_id"), lit(5L)) === lit(0L),
            upper(concat(md5(col("text")), md5(col("text"))))) // fails the regex
            .otherwise(concat(md5(col("text")), md5(col("text")))))
        .withColumn("proof",
          when(pmod(col("doc_id"), lit(4L)) === lit(0L),
            expr("substring(unhex(repeat(sha2(text, 256), 8)), 1, 100)")) // short
            .when(pmod(col("doc_id"), lit(4L)) === lit(1L),
              encode(rpad(lit(marker), 256, "X"), "UTF-8")) // structural
            .otherwise(expr("unhex(repeat(sha2(text, 256), 8))"))) // "crypto"
        .withColumn("threshold", pmod(col("doc_id"), lit(100L)))
        .withColumn("require_crypto", pmod(col("doc_id"), lit(3L)) === lit(0L))
        .withColumn("is_structural",
          expr("substring(proof, 1, 34)") === encode(lit(marker), "UTF-8"))
        // fmt_ok/len_ok materialized ONCE, exactly like the oracle's `c`
        // CTE: the same regex/length rules previously appeared inline
        // three times each across valid/threshold_out/error, and a
        // missed copy on edit would silently de-sync the columns
        .withColumn("fmt_ok", col("commitment").rlike("^[a-f0-9]{64}$"))
        .withColumn("len_ok", length(col("proof")) === lit(256))
        .select(
          col("doc_id"),
          when(!col("fmt_ok") || !col("len_ok"), lit(false))
            .when(col("is_structural") && col("require_crypto"), lit(false))
            .when(col("is_structural"), lit(true))
            .otherwise(lit(false)).as("valid"),
          when(!col("fmt_ok") || !col("len_ok"), lit(0L))
            .otherwise(col("threshold")).as("threshold_out"),
          lit(false).as("cryptographic"), // offline: no ZK verifier available
          when(!col("fmt_ok"), lit("Invalid commitment format"))
            .when(!col("len_ok"), lit("Invalid proof length"))
            .when(col("is_structural") && col("require_crypto"),
              lit("Structural proofs not accepted in production mode"))
            .when(col("is_structural"),
              lit("Warning: structural proof accepted (development mode only)"))
            .otherwise(lit(
              "Cryptographic verification required but verifier not available"))
            .as("error"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH p AS (
        SELECT doc_id,
          CASE WHEN doc_id % 5 = 0 THEN upper(md5(text) || md5(text))
               ELSE md5(text) || md5(text) END AS commitment,
          CASE WHEN doc_id % 4 = 0
                 THEN from_hex(substring(repeat(sha256(text), 8), 1, 200))
               WHEN doc_id % 4 = 1
                 THEN encode(rpad('STRUCTURAL_PROOF_NOT_CRYPTOGRAPHIC', 256, 'X'))
               ELSE from_hex(repeat(sha256(text), 8)) END AS proof,
          doc_id % 100 AS threshold,
          doc_id % 3 = 0 AS require_crypto
        FROM documents),
      c AS (
        SELECT doc_id, threshold, require_crypto,
          regexp_matches(commitment, '^[a-f0-9]{64}$') AS fmt_ok,
          octet_length(proof) = 256 AS len_ok,
          substring(hex(proof), 1, 68) =
            hex(encode('STRUCTURAL_PROOF_NOT_CRYPTOGRAPHIC')) AS is_structural
        FROM p)
      SELECT doc_id,
        CASE WHEN NOT fmt_ok THEN FALSE
             WHEN NOT len_ok THEN FALSE
             WHEN is_structural AND require_crypto THEN FALSE
             WHEN is_structural THEN TRUE
             ELSE FALSE END AS valid,
        CASE WHEN NOT fmt_ok THEN 0
             WHEN NOT len_ok THEN 0
             ELSE threshold END AS threshold_out,
        FALSE AS cryptographic,
        CASE WHEN NOT fmt_ok THEN 'Invalid commitment format'
             WHEN NOT len_ok THEN 'Invalid proof length'
             WHEN is_structural AND require_crypto
               THEN 'Structural proofs not accepted in production mode'
             WHEN is_structural
               THEN 'Warning: structural proof accepted (development mode only)'
             ELSE 'Cryptographic verification required but verifier not available' END AS error
      FROM c ORDER BY doc_id"""))

  /** vote_weight composed operator (lib/governance.ts:282-302): token
    * balance left-outer stake position; weight = balance +
    * staked × duration-tier bps / 10000, all integer math; an absent
    * stake position means balance-only (the `:290` guard). Stake
    * positions are each customer's earliest order (staked = cents of
    * o_totalprice, stake start = o_orderdate), duration measured to a
    * fixed as-of date; tier thresholds 30/90/180 days as
    * stake/page.tsx:143-149. */
  val voteWeight = QueryDef(
    "f_vote_weight",
    (s, dir) => {
      val t = T(s, dir)
      val balances = t.customer.select(
        col("c_custkey").as("address"),
        // round before the long cast: Spark's double->long cast truncates
        // while DuckDB's rounds, so 123.45*100 = 12344.999... would diverge
        round(col("c_acctbal") * lit(100), 0).cast("long").as("balance_c"))
      val stakes = t.orders
        .groupBy(col("o_custkey"))
        // the EARLIEST order is the stake position, as documented: keyed
        // on (o_orderdate, o_orderkey), not o_orderkey alone — order
        // keys are not date-ordered in this data, so a key-only min
        // picked a wrong (often later) order for most customers
        .agg(min_by(
          struct(round(col("o_totalprice") * lit(100), 0).cast("long").as("staked_c"),
            col("o_orderdate").cast("date").as("start")),
          struct(col("o_orderdate"), col("o_orderkey"))).as("pos"))
        .select(col("o_custkey").as("address"),
          col("pos.staked_c").as("staked_c"), col("pos.start").as("start"))
      balances.join(stakes, Seq("address"), "left_outer")
        // as-of AFTER the data's last order date (orders extend to
        // 2001-08): the reference computes duration = now − start, which
        // is never negative — the old 1998-12-31 as-of predated 40% of
        // stake starts, collapsing them to the base tier through a
        // semantically impossible negative duration
        .withColumn("duration_days",
          datediff(lit("2002-01-01").cast("date"), col("start")).cast("long"))
        .withColumn("mult_bps", Tiers.multiplierBps(col("duration_days")))
        .withColumn("weight",
          col("balance_c") + coalesce(
            expr("(staked_c * mult_bps) div 10000"), lit(0L)))
        .select(col("address"), col("balance_c"),
          coalesce(col("staked_c"), lit(0L)).as("staked_c"),
          // no coalesce: multiplierBps is TOTAL (otherwise-clause), so
          // even a no-orders customer's null duration yields 10000
          col("mult_bps"),
          col("weight"))
        .orderBy(col("address"))
    },
    oracle = Some("""
      WITH ranked AS (
        SELECT o_custkey, o_totalprice, o_orderdate,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders),
      stakes AS (
        SELECT o_custkey AS address,
          CAST(ROUND(o_totalprice * 100) AS BIGINT) AS staked_c,
          CAST(o_orderdate AS DATE) AS start
        FROM ranked WHERE rn = 1),
      j AS (
        SELECT c.c_custkey AS address,
          CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS balance_c,
          s.staked_c,
          date_diff('day', s.start, DATE '2002-01-01') AS duration_days
        FROM customer c LEFT JOIN stakes s ON s.address = c.c_custkey)
      SELECT address, balance_c,
        COALESCE(staked_c, 0) AS staked_c,
        CAST(CASE WHEN duration_days >= 180 THEN 20000
                  WHEN duration_days >= 90 THEN 15000
                  WHEN duration_days >= 30 THEN 12000
                  ELSE 10000 END AS BIGINT) AS mult_bps,
        balance_c + COALESCE(
          (staked_c * (CASE WHEN duration_days >= 180 THEN 20000
                            WHEN duration_days >= 90 THEN 15000
                            WHEN duration_days >= 30 THEN 12000
                            ELSE 10000 END)) // 10000, 0) AS weight
      FROM j ORDER BY address"""))

  /** Escalating slash rate + dispute refund schedule in one settlement
    * pass. Slash: min(1000 + 500×violations, 5000) bps
    * (swarm-types.ts:395-397). Refund: quality ≥80 → 0%, ≥65 → 35%,
    * ≥50 → 75%, else 100% of the escrowed amount
    * (private-escrow.ts:404-427) — amounts in integer cents with
    * truncating division so the oracle check is float-free (the
    * reference computes the split in floating point over the same
    * percentages). Violations = error events, escrow = purchase cents,
    * quality score derived deterministically per user. */
  val slashRefund = QueryDef(
    "f_slash_refund",
    (s, dir) => T(s, dir).events
      .groupBy(col("user_id"))
      .agg(
        count_if(col("event_type") === lit("error")).as("violations"),
        // guarded cents (Relational.centsV): a NaN/Inf/overflow purchase
        // amount folds to null on both engines instead of throwing the
        // ANSI long cast (r13 third sweep, the events.value family)
        sum(when(col("event_type") === lit("purchase"),
          graft.operators.Relational.centsV(col("value")))).as("amount_c"))
      .withColumn("amount_c", coalesce(col("amount_c"), lit(0L)))
      .withColumn("slash_bps",
        least(lit(5000L), lit(1000L) + lit(500L) * col("violations")))
      .withColumn("quality_score", pmod(col("user_id") * lit(7L), lit(101L)))
      .withColumn("refund_pct",
        when(col("quality_score") >= lit(80L), lit(0L))
          .when(col("quality_score") >= lit(65L), lit(35L))
          .when(col("quality_score") >= lit(50L), lit(75L))
          .otherwise(lit(100L)))
      .withColumn("agent_refund_c", expr("(amount_c * refund_pct) div 100"))
      .withColumn("provider_payout_c", col("amount_c") - col("agent_refund_c"))
      .select(col("user_id"), col("violations"), col("slash_bps"),
        col("quality_score"), col("refund_pct"),
        col("amount_c"), col("agent_refund_c"), col("provider_payout_c"))
      // nulls-last: Spark's plain asc sorts nulls FIRST where DuckDB's
      // ORDER BY defaults LAST — one null user_id from the nullable
      // jdbc: store tier would land at opposite ends (a1 pins the same
      // guard on the identical all-events grouping; r13 third sweep)
      .orderBy(col("user_id").asc_nulls_last),
    oracle = Some("""
      WITH a AS (
        SELECT user_id,
          COUNT(*) FILTER (WHERE event_type = 'error') AS violations,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
            AND ABS(ROUND(value * 100)) < 9223372036854775808.0
            THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS BIGINT) AS amount_c
        FROM events GROUP BY user_id),
      b AS (
        SELECT *,
          LEAST(5000, 1000 + 500 * violations) AS slash_bps,
          (user_id * 7) % 101 AS quality_score
        FROM a),
      c AS (
        SELECT *,
          CASE WHEN quality_score >= 80 THEN 0
               WHEN quality_score >= 65 THEN 35
               WHEN quality_score >= 50 THEN 75
               ELSE 100 END AS refund_pct
        FROM b)
      SELECT user_id, violations, slash_bps, quality_score, refund_pct,
        amount_c,
        CAST((amount_c * refund_pct) // 100 AS BIGINT) AS agent_refund_c,
        CAST(amount_c - ((amount_c * refund_pct) // 100) AS BIGINT) AS provider_payout_c
      FROM c ORDER BY user_id"""))

  /** Shadow-ID reputation gate pipeline (shadow-id-gate.ts): raw account
    * score renormalized clamp(0,100,(raw+1000)/20) (`:313-314`), tier
    * cascade none/bronze/silver/gold/platinum (`:42-48,320-326`), and the
    * effective rate limit floor(baseLimit × tier multiplier) with
    * lite=1/active=10 bases and 0.5/1/1.5/2/3 multipliers (`:52-63,
    * 256-270` — ×10 integer form, floors identically since every product
    * is binary-exact). Raw spans negatives here so every tier branch is
    * exercised (the reference's u16 input always lands ≥ 50 and relies
    * on the same clamp). */
  val repGate = QueryDef(
    "f_rep_gate",
    (s, dir) => T(s, dir).customer
      .withColumn("raw", pmod(col("c_custkey") * lit(137L), lit(3000L)) - lit(1000L))
      .withColumn("score",
        least(lit(100.0), greatest(lit(0.0), (col("raw") + lit(1000L)) / lit(20.0))))
      .withColumn("rep_tier",
        when(col("score") >= lit(86.0), lit("platinum"))
          .when(col("score") >= lit(66.0), lit("gold"))
          .when(col("score") >= lit(41.0), lit("silver"))
          .when(col("score") >= lit(1.0), lit("bronze"))
          .otherwise(lit("none")))
      .withColumn("shadow_tier",
        when(pmod(col("c_custkey"), lit(2L)) === lit(0L), lit("lite"))
          .otherwise(lit("active")))
      .withColumn("base_limit",
        when(col("shadow_tier") === lit("lite"), lit(1L)).otherwise(lit(10L)))
      .withColumn("mult_x10",
        when(col("rep_tier") === lit("none"), lit(5L))
          .when(col("rep_tier") === lit("bronze"), lit(10L))
          .when(col("rep_tier") === lit("silver"), lit(15L))
          .when(col("rep_tier") === lit("gold"), lit(20L))
          .otherwise(lit(30L)))
      .withColumn("rate_limit", expr("(base_limit * mult_x10) div 10"))
      .select(col("c_custkey"), col("raw"), col("score"), col("rep_tier"),
        col("shadow_tier"), col("rate_limit"))
      .orderBy(col("c_custkey")),
    oracle = Some("""
      WITH a AS (
        SELECT c_custkey, (c_custkey * 137) % 3000 - 1000 AS raw
        FROM customer),
      b AS (
        SELECT c_custkey, raw,
          LEAST(100.0, GREATEST(0.0, (raw + 1000) / 20.0)) AS score,
          CASE WHEN c_custkey % 2 = 0 THEN 'lite' ELSE 'active' END AS shadow_tier
        FROM a),
      c AS (
        SELECT *,
          CASE WHEN score >= 86 THEN 'platinum'
               WHEN score >= 66 THEN 'gold'
               WHEN score >= 41 THEN 'silver'
               WHEN score >= 1 THEN 'bronze'
               ELSE 'none' END AS rep_tier,
          CASE WHEN shadow_tier = 'lite' THEN 1 ELSE 10 END AS base_limit
        FROM b)
      SELECT c_custkey, raw, score, rep_tier, shadow_tier,
        (base_limit * (CASE rep_tier WHEN 'none' THEN 5 WHEN 'bronze' THEN 10
          WHEN 'silver' THEN 15 WHEN 'gold' THEN 20 ELSE 30 END)) // 10 AS rate_limit
      FROM c ORDER BY c_custkey"""))

  /** Proposal pass/fail in BPS form (lib/governance.ts:308-320): quorum
    * from a config relation (broadcast single-row dim, the decoded
    * GovernanceConfig analog), then approvalBps = for×10000/total
    * truncating — the BN.div semantics — against approvalThresholdBps.
    * A2 covers the on-chain 100-based percentage; this is the SDK's
    * 10000-based variant with config-driven thresholds and the
    * failure-reason string. */
  val proposalPassed = QueryDef(
    "a2b_approval_bps",
    (s, dir) => {
      val votes = T(s, dir).events
        .filter(col("event_type").isin("purchase", "error"))
        .groupBy(col("user_id").as("proposal_id"))
        .agg(
          count_if(col("event_type") === lit("purchase")).as("votes_for"),
          count_if(col("event_type") === lit("error")).as("votes_against"))
      val config = s.range(1).select(
        lit(40L).as("quorum_threshold"), lit(6000L).as("approval_threshold_bps"))
      votes.crossJoin(broadcast(config))
        .withColumn("total", col("votes_for") + col("votes_against"))
        .withColumn("approval_bps",
          when(col("total") > lit(0L), expr("(votes_for * 10000) div total"))
            .otherwise(lit(0L)))
        // quorum progress, clamped (governance/[id]/page.tsx:172-183:
        // quorumPercent = min(100, total*100/quorum))
        .withColumn("quorum_pct",
          least(lit(100L), expr("(total * 100) div quorum_threshold")))
        .withColumn("passed",
          col("total") >= col("quorum_threshold") &&
            col("approval_bps") >= col("approval_threshold_bps"))
        .withColumn("reason",
          when(col("total") < col("quorum_threshold"), lit("Quorum not reached"))
            .when(col("approval_bps") < col("approval_threshold_bps"),
              lit("Approval threshold not met"))
            .otherwise(lit("Passed")))
        .select(col("proposal_id"), col("votes_for"), col("votes_against"),
          col("total"), col("approval_bps"), col("quorum_pct"),
          col("passed"), col("reason"))
        // nulls-last for DuckDB parity, same as a2's identical grouping
        .orderBy(col("proposal_id").asc_nulls_last)
    },
    oracle = Some("""
      WITH v AS (
        SELECT user_id AS proposal_id,
          COUNT(*) FILTER (WHERE event_type = 'purchase') AS votes_for,
          COUNT(*) FILTER (WHERE event_type = 'error') AS votes_against
        FROM events WHERE event_type IN ('purchase','error')
        GROUP BY user_id),
      c AS (
        SELECT *, votes_for + votes_against AS total,
          CASE WHEN votes_for + votes_against > 0
            THEN (votes_for * 10000) // (votes_for + votes_against)
            ELSE 0 END AS approval_bps
        FROM v)
      SELECT proposal_id, votes_for, votes_against, total, approval_bps,
        LEAST(100, (total * 100) // 40) AS quorum_pct,
        total >= 40 AND approval_bps >= 6000 AS passed,
        CASE WHEN total < 40 THEN 'Quorum not reached'
             WHEN approval_bps < 6000 THEN 'Approval threshold not met'
             ELSE 'Passed' END AS reason
      FROM c ORDER BY proposal_id"""))

  /** Capability base-price map lookup (index.ts:269-282): a literal
    * MapType dimension consulted per row with a default for unknown
    * capabilities — the map-literal form of a broadcast dim lookup
    * (market segments stand in for capability names). */
  val priceMap = QueryDef(
    "f_price_map",
    (s, dir) => {
      val prices = map(
        lit("BUILDING"), lit(120L), lit("AUTOMOBILE"), lit(80L),
        lit("MACHINERY"), lit(100L), lit("HOUSEHOLD"), lit(60L))
      T(s, dir).customer
        .select(col("c_custkey"), col("c_mktsegment"),
          coalesce(element_at(prices, col("c_mktsegment")), lit(50L))
            .as("base_price"))
        .orderBy(col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_custkey, c_mktsegment,
        CASE c_mktsegment WHEN 'BUILDING' THEN 120 WHEN 'AUTOMOBILE' THEN 80
          WHEN 'MACHINERY' THEN 100 WHEN 'HOUSEHOLD' THEN 60
          ELSE 50 END AS base_price
      FROM customer ORDER BY c_custkey"""))

  /** Critique-loop continuation gate (critique/route.ts:50-85): score
    * clamp round(min(100, max(0, raw))), the forced-stop rules
    * (ok ⇒ stop; remaining_steps ≤ 0 ⇒ stop; else the model's own
    * shouldContinue), and the per-step budget clamp
    * min(budget, maxBudgetPerStep) for positive budgets — the bounded
    * continuation that keeps the reference's critique loop finite.
    * Budgets in integer cents for oracle exactness. */
  val critiqueGate = QueryDef(
    "f_critique_gate",
    (s, dir) => T(s, dir).events
      .select(col("event_id"),
        (col("value") * lit(3) - lit(50)).as("score_raw"),
        (pmod(col("event_id"), lit(5L)) === lit(0L)).as("ok"),
        (pmod(col("event_id"), lit(2L)) === lit(1L)).as("should_continue_in"),
        (pmod(col("event_id"), lit(4L)) - lit(1L)).as("remaining_steps"),
        // guarded like Relational.centsV (this site divides by 7 so it
        // inlines the same fold): NaN/Inf/overflow → null, not a throw;
        // the score clamp above needs no guard — LEAST/GREATEST sort
        // NaN/Inf greatest on both engines, so the clamp absorbs them
        when(abs(round(col("value") * lit(100) / lit(7), 0)) <
            lit(9.223372036854776e18),
          round(col("value") * lit(100) / lit(7), 0).cast("long"))
          .as("budget_raw_c"))
      .withColumn("score",
        round(least(lit(100.0), greatest(lit(0.0), col("score_raw"))), 0).cast("long"))
      .withColumn("should_continue",
        when(col("ok"), lit(false))
          .when(col("remaining_steps") <= lit(0L), lit(false))
          .otherwise(col("should_continue_in")))
      .withColumn("budget_c",
        when(col("budget_raw_c") > lit(0L),
          least(col("budget_raw_c"), lit(1000L))).otherwise(lit(null))) // cap 10.00
      .select(col("event_id"), col("score"), col("should_continue"),
        col("remaining_steps"), col("budget_c"))
      .orderBy(col("event_id")),
    oracle = Some("""
      WITH r AS (
        SELECT event_id,
          value * 3 - 50 AS score_raw,
          event_id % 5 = 0 AS ok,
          event_id % 2 = 1 AS should_continue_in,
          event_id % 4 - 1 AS remaining_steps,
          CASE WHEN ABS(ROUND(value * 100 / 7)) < 9223372036854775808.0
               THEN CAST(ROUND(value * 100 / 7) AS BIGINT) END AS budget_raw_c
        FROM events)
      SELECT event_id,
        CAST(ROUND(LEAST(100.0, GREATEST(0.0, score_raw))) AS BIGINT) AS score,
        CASE WHEN ok THEN FALSE
             WHEN remaining_steps <= 0 THEN FALSE
             ELSE should_continue_in END AS should_continue,
        remaining_steps,
        CASE WHEN budget_raw_c > 0 THEN LEAST(budget_raw_c, 1000)
             ELSE NULL END AS budget_c
      FROM r ORDER BY event_id"""))

  val defs: Seq[QueryDef] = Seq(
    decodeFastAction, decodeFastVote, decodeRegistry,
    decodeTransferState, decodeHookConfig, decodePubkeyList,
    verifyProof, voteWeight,
    slashRefund, repGate, proposalPassed, priceMap, critiqueGate)
}
