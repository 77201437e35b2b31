package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest
import org.apache.spark.sql.functions._

/** Account-decoder round-trips with independently-encoded records — the
  * mirror of the reference's account-size regression checks
  * (tests/fast-voting.test.ts:540-562). The records here are built with
  * java.nio ByteBuffer in LITTLE_ENDIAN order, completely outside the
  * engine's own encode path, so a decoder that read big-endian (or at a
  * wrong offset) would fail even though the fused encode→decode catalog
  * queries round-trip. */
class AccountsSpec extends SparkSpec {

  import spark.implicits._

  private def sha(s: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("FastAction decode: 145-byte ByteBuffer-LE record (lib.rs:194-213)") {
    val buf = ByteBuffer.allocate(145).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("graftFAc".getBytes("UTF-8")) // 8-byte discriminator
    buf.putLong(0x0102030405060708L)      // action_id — asymmetric byte pattern
    val aHash = sha("action"); val dHash = sha("desc"); val creator = sha("creator")
    buf.put(aHash); buf.put(dHash); buf.put(creator)
    buf.put(67.toByte)                    // threshold
    buf.putInt(300)                       // votes_for
    buf.putInt(0x01020304)                // votes_against — asymmetric
    buf.putInt(300 + 0x01020304)          // vote_count
    buf.putLong(5000L)                    // created_slot
    buf.putLong(5075L)                    // deadline_slot
    buf.put(1.toByte)                     // executed
    buf.put(2.toByte)                     // result
    buf.put(0.toByte)                     // padding
    buf.put(254.toByte)                   // bump
    assert(buf.position() === 145)        // the reference's LEN check

    val df = Seq(Tuple1(buf.array())).toDF("rec")
      .select(graft.operators.Governance.fastActionFields("rec"): _*)
    val r = df.collect()(0)
    assert(r.getAs[Long]("rec_len") === 145L)
    assert(r.getAs[Long]("action_id") === 0x0102030405060708L) // BE would give 0x0807060504030201
    assert(r.getAs[String]("action_hash_hex") === hex(aHash))
    assert(r.getAs[String]("description_hash_hex") === hex(dHash))
    assert(r.getAs[String]("creator_hex") === hex(creator))
    assert(r.getAs[Long]("threshold") === 67L)
    assert(r.getAs[Long]("votes_for") === 300L)
    assert(r.getAs[Long]("votes_against") === 0x01020304L)
    assert(r.getAs[Long]("vote_count") === 300L + 0x01020304L)
    assert(r.getAs[Long]("created_slot") === 5000L)
    assert(r.getAs[Long]("deadline_slot") === 5075L)
    assert(r.getAs[Boolean]("executed"))
    assert(r.getAs[Long]("result") === 2L)
    assert(r.getAs[Long]("bump") === 254L)
  }

  test("u64 decode range: 2^63-1 exact, high-bit u64 is an explicit null sentinel") {
    def rec(actionId: Long): Array[Byte] = {
      val buf = ByteBuffer.allocate(145).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("graftFAc".getBytes("UTF-8"))
      buf.putLong(actionId)
      buf.put(new Array[Byte](145 - buf.position()))
      buf.array()
    }
    val df = Seq(Tuple1(rec(Long.MaxValue)), Tuple1(rec(-1L))) // -1L = 0xFFFF…FF u64
      .toDF("rec")
      .select(graft.operators.Governance.fastActionFields("rec"): _*)
    val ids = df.collect().map(r =>
      if (r.isNullAt(r.fieldIndex("action_id"))) None
      else Some(r.getAs[Long]("action_id")))
    // full LongType range decodes exactly; 2^64-1 (≥ 2^63, unrepresentable)
    // surfaces as null — never a wrapped negative, never an ANSI throw
    assert(ids.toSet === Set(Some(Long.MaxValue), None))
  }

  test("FastVote decode: 114-byte ByteBuffer-LE record (lib.rs:215-227)") {
    val buf = ByteBuffer.allocate(114).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("graftFVt".getBytes("UTF-8"))
    val fa = sha("fa"); val voter = sha("voter"); val comm = sha("comm")
    buf.put(fa); buf.put(voter); buf.put(comm)
    buf.put(1.toByte)              // vote_value
    buf.putLong(0x00000000CAFEL)   // voted_slot
    buf.put(7.toByte)              // bump
    assert(buf.position() === 114)

    val r = Seq(Tuple1(buf.array())).toDF("rec")
      .select(graft.operators.Governance.fastVoteFields("rec"): _*)
      .collect()(0)
    assert(r.getAs[Long]("rec_len") === 114L)
    assert(r.getAs[String]("fast_action_hex") === hex(fa))
    assert(r.getAs[String]("voter_hex") === hex(voter))
    assert(r.getAs[String]("voter_commitment_hex") === hex(comm))
    assert(r.getAs[Boolean]("vote_value"))
    assert(r.getAs[Long]("voted_slot") === 0xCAFEL)
    assert(r.getAs[Long]("bump") === 7L)
  }

  test("AgentRegistry decode: ByteBuffer-LE record (client.ts:539-602)") {
    val buf = ByteBuffer.allocate(103).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("graftReg".getBytes("UTF-8"))
    val auth = sha("auth"); val root = sha("root")
    buf.put(auth); buf.put(root)
    buf.putInt(42)            // agent_count
    buf.putInt(0x00010203)    // signal_count — asymmetric
    buf.putInt(9)             // swarm_action_count
    buf.putLong(19123L)       // epoch
    buf.putLong(1000000L)     // min_stake
    buf.put(55.toByte)        // min_signal_confidence
    buf.put(255.toByte)       // bump
    buf.put(1.toByte)         // paused
    assert(buf.position() === 103)

    val r = Seq(Tuple1(buf.array())).toDF("rec")
      .select(graft.operators.Governance.registryFields("rec"): _*)
      .collect()(0)
    assert(r.getAs[String]("authority_hex") === hex(auth))
    assert(r.getAs[String]("agents_root_hex") === hex(root))
    assert(r.getAs[Long]("agent_count") === 42L)
    assert(r.getAs[Long]("signal_count") === 0x00010203L)
    assert(r.getAs[Long]("swarm_action_count") === 9L)
    assert(r.getAs[Long]("epoch") === 19123L)
    assert(r.getAs[Long]("min_stake") === 1000000L)
    assert(r.getAs[Long]("min_signal_confidence") === 55L)
    assert(r.getAs[Long]("bump") === 255L)
    assert(r.getAs[Boolean]("paused"))
  }

  test("TransferState decode: 78-byte ByteBuffer-LE record (transfer-hook.ts:143-167)") {
    val buf = ByteBuffer.allocate(78).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("graftTxS".getBytes("UTF-8"))   // 8-byte discriminator
    val owner = sha("owner")
    buf.put(owner)
    buf.putLong(0x0102030405060708L)        // last_transfer_time — asymmetric
    buf.put(1.toByte)                       // last_transfer_outbound
    buf.putLong(777_000_000L)               // last_transfer_amount
    buf.putShort(0x0201.toShort)            // transfers_in_window u16 — asymmetric
    buf.putLong(5_000_003L)                 // volume_in_window
    buf.putLong(1_700_000_000L)             // window_start
    buf.put(4.toByte)                       // rapid_reversals
    buf.put(0.toByte)                       // is_flagged
    buf.put(251.toByte)                     // bump
    assert(buf.position() === 78)

    val r = Seq(Tuple1(buf.array())).toDF("rec")
      .select(graft.operators.Governance.transferStateFields("rec"): _*)
      .collect()(0)
    assert(r.getAs[Long]("rec_len") === 78L)
    assert(r.getAs[String]("owner_hex") === hex(owner))
    assert(r.getAs[Long]("last_transfer_time") === 0x0102030405060708L)
    assert(r.getAs[Boolean]("last_transfer_outbound"))
    assert(r.getAs[Long]("last_transfer_amount") === 777_000_000L)
    assert(r.getAs[Long]("transfers_in_window") === 0x0201L) // BE would give 0x0102
    assert(r.getAs[Long]("volume_in_window") === 5_000_003L)
    assert(r.getAs[Long]("window_start") === 1_700_000_000L)
    assert(r.getAs[Long]("rapid_reversals") === 4L)
    assert(!r.getAs[Boolean]("is_flagged"))
    assert(r.getAs[Long]("bump") === 251L)
  }

  test("HookConfig decode: 85-byte ByteBuffer-LE record (transfer-hook.ts:85-105)") {
    val buf = ByteBuffer.allocate(85).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("graftHkC".getBytes("UTF-8"))
    val admin = sha("admin")
    buf.put(admin)
    buf.put(1.toByte)             // enabled
    buf.putLong(300L)             // cooldown_seconds
    buf.putLong(3600L)            // rate_limit_window
    buf.putShort(0x0304.toShort)  // max_transfers_per_window u16 — asymmetric
    buf.putLong(1_000_000L)       // max_volume_per_window
    buf.put(0.toByte)             // burn_enabled
    buf.putLong(125L)             // burn_rate_bps
    buf.putLong(987_654_321L)     // total_burned
    buf.put(253.toByte)           // bump
    assert(buf.position() === 85)

    val r = Seq(Tuple1(buf.array())).toDF("rec")
      .select(graft.operators.Governance.hookConfigFields("rec"): _*)
      .collect()(0)
    assert(r.getAs[Long]("rec_len") === 85L)
    assert(r.getAs[String]("admin_hex") === hex(admin))
    assert(r.getAs[Boolean]("enabled"))
    assert(r.getAs[Long]("cooldown_seconds") === 300L)
    assert(r.getAs[Long]("rate_limit_window") === 3600L)
    assert(r.getAs[Long]("max_transfers_per_window") === 0x0304L)
    assert(r.getAs[Long]("max_volume_per_window") === 1_000_000L)
    assert(!r.getAs[Boolean]("burn_enabled"))
    assert(r.getAs[Long]("burn_rate_bps") === 125L)
    assert(r.getAs[Long]("total_burned") === 987_654_321L)
    assert(r.getAs[Long]("bump") === 253L)
  }

  test("pubkey-list decode: ByteBuffer-LE records across counts 0..17, count-driven offsets") {
    // the variable-layout shape: bump sits AFTER the count-sized tail, so
    // a wrong count misreads every element and the trailing byte
    def rec(n: Int, bump: Int): Array[Byte] = {
      val buf = ByteBuffer.allocate(8 + 32 + 4 + 32 * n + 1)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.put("graftPkL".getBytes("UTF-8"))
      buf.put(sha("admin"))
      buf.putInt(n)
      (0 until n).foreach(i => buf.put(sha(s"pk$i")))
      buf.put(bump.toByte)
      buf.array()
    }
    // drive the ENGINE's decoder (Governance.pubkeyListFields), not a
    // re-derived copy of its expressions: the old inline exprs validated
    // only themselves, so a symmetric offset/endianness mistake in the
    // engine's decode could never fail here (r13 test sweep)
    val df = Seq(0, 1, 2, 17).map(n => (n.toLong, rec(n, 200 + n)))
      .toDF("n", "rec")
      .select((col("n") +: graft.operators.Governance.pubkeyListFields("rec")): _*)
    val rows = df.collect()
    for (r <- rows) {
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("cnt") === n)
      assert(r.getAs[Long]("bump") === 200L + n)
      assert(r.getAs[String]("admin_hex") === hex(sha("admin")))
      val pks = r.getSeq[String](r.fieldIndex("pk"))
      assert(pks.size === n.toInt)
      pks.zipWithIndex.foreach { case (p, i) => assert(p === hex(sha(s"pk$i"))) }
    }
  }

  test("verify_proof covers every branch of the shadow-id-gate cascade") {
    val out = graft.operators.Governance.verifyProof.run(spark, sf001)
      .select($"error", $"valid").distinct().collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out.contains("Invalid commitment format"))
    assert(out.contains("Invalid proof length"))
    assert(out.get("Structural proofs not accepted in production mode") === Some(false))
    assert(out.get("Warning: structural proof accepted (development mode only)") === Some(true))
    // the reference's exact verifier-absent message (shadow-id-gate.ts:
    // 184-191), not a paraphrase — the other branches are verbatim too
    assert(out.get(
      "Cryptographic verification required but verifier not available") === Some(false))
  }

  test("vote_weight: stake tiers and the missing-position fallback (governance.ts:282-302)") {
    // fixture: customer 5 has no stake position at all (the :290 guard);
    // the others hit each duration tier against the 2002-01-01 as-of
    // date (after the data's last order date, so durations are never
    // negative — the reference's now − start shape)
    val dir = tempDir("graft-vw").toString
    Seq((1L, 10.00), (2L, 20.00), (3L, 30.00), (4L, 40.00), (5L, 50.00))
      .toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq( // (orderkey, custkey, totalprice, orderdate)
      (10L, 1L, 100.00, "2001-12-26"), //   6 days → 10000 bps
      (20L, 2L, 100.00, "2001-11-02"), //  60 days → 12000
      (30L, 3L, 100.00, "2001-08-02"), // 152 days → 15000
      (45L, 4L, 100.00, "2000-06-01"), // 579 days → 20000; HIGHER key but
                                       // EARLIEST date — must be the stake
      (40L, 4L, 999.00, "2001-12-31")) // lower key, later date — ignored
                                       // (the stake is the earliest ORDER,
                                       // keyed (date, key), not min key)
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .withColumn("o_orderdate", $"o_orderdate".cast("date"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Governance.voteWeight.run(spark, dir).collect()
      .map(r => r.getAs[Long]("address") ->
        ((r.getAs[Long]("mult_bps"), r.getAs[Long]("weight")))).toMap
    assert(out(1L) === ((10000L, 1000L + 10000L)))           // 10.00 + 100.00×1.0
    assert(out(2L) === ((12000L, 2000L + 12000L)))           // 20.00 + 100.00×1.2
    assert(out(3L) === ((15000L, 3000L + 15000L)))           // 30.00 + 100.00×1.5
    assert(out(4L) === ((20000L, 4000L + 20000L)))           // 40.00 + 100.00×2.0
    assert(out(5L) === ((10000L, 5000L)))                    // no stake → balance only
  }
}
