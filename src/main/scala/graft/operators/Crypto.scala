package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Crypto/commitment operators (SURVEY §2.8 crypto, §2.10): Poseidon
  * commitments, nullifier derivation + replay dedup, Merkle root +
  * membership. Deterministic pure-JVM kernels → rows-only checks (DuckDB
  * has no Poseidon); the structural/algebraic properties are pinned by
  * CryptoSpec instead. */
object Crypto {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  /** Null-safe 2-input Poseidon: reference-type UDF params receive null
    * through (no auto null-skip), and a null input here means an upstream
    * null key (events admit NULL user_id — p6_validation classifies
    * exactly that case), which must surface as a null commitment row, not
    * an executor NullPointerException. */
  private def poseidon2Udf = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) Option.empty[Array[Byte]]
    else Some(graft.functions.Poseidon.toBytes32(graft.functions.Poseidon.hash2(
      graft.functions.Poseidon.fromBytes32(a), graft.functions.Poseidon.fromBytes32(b)))))

  /** Poseidon commitment per row (client.ts:147-173 commitment =
    * Poseidon(owner, agent, …)): commit customer ids with an md5-derived
    * blinding factor; emitted as hex. */
  val cryptoCommitment = QueryDef(
    "crypto_commitment",
    (s, dir) => {
      val f = poseidon2Udf
      T(s, dir).customer
        .select(col("c_custkey"),
          lower(hex(f(
            unhex(lpad(hex(col("c_custkey")), 64, "0")),
            unhex(md5(col("c_name")))))).as("commitment"))
        .orderBy(col("c_custkey"))
    },
    oracle = None)

  /** Nullifier one-use-per-epoch dedup (client.ts:1753-1762,
    * agent_reputation.circom:105-113): nullifier = Poseidon(user, epoch);
    * first event per nullifier wins, replays counted. */
  val cryptoNullifierDedup = QueryDef(
    "crypto_nullifier_dedup",
    (s, dir) => {
      val f = poseidon2Udf
      T(s, dir).events
        .withColumn("epoch_day", expr("ts div 86400000000000"))
        .withColumn("nullifier", lower(hex(f(
          unhex(lpad(hex(col("user_id")), 64, "0")),
          unhex(lpad(hex(col("epoch_day")), 64, "0"))))))
        // a NULL user_id yields a null nullifier — an unattributable event
        // cannot claim a one-use slot, mirroring the reference's invalid-
        // commitment rejection (lib.rs:105)
        .filter(col("nullifier").isNotNull)
        .groupBy(col("nullifier"))
        .agg(min(col("event_id")).as("first_use"),
          (count(lit(1)) - lit(1)).as("replays_rejected"))
        .orderBy(col("nullifier"))
    },
    oracle = None)

  /** Merkle root over commitment leaves (merkle.ts:84-110), via the
    * distributed block-aligned fold. One row: depth, n_leaves, root hex. */
  val cryptoMerkleRoot = QueryDef(
    "crypto_merkle_root",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val depth = 12
      val leaves = T(s, dir).customer
        .select((col("c_custkey") - 1).cast("long").as("leaf_index"),
          unhex(md5(col("c_name"))).as("leaf"))
      val root = graft.functions.Merkle.rootDistributed(s, leaves, depth, blockDepth = 6)
      val n = leaves.count()
      Seq((depth, n, graft.functions.Poseidon.toBytes32(root)
        .map("%02x".format(_)).mkString))
        .toDF("depth", "n_leaves", "root_hex")
    },
    oracle = None)

  /** SHA-256 fallback commitment scheme (private-escrow.ts:95-121): the
    * reference's non-Poseidon path — commitment = '0x' +
    * sha256("commitment:<amount_lamports>:<blinding>"), verified by
    * regenerate-and-compare. Unlike the Poseidon ops this is fully
    * SQL-expressible, so the crypto family gets one exact oracle row;
    * `verify_tampered` pins that a shifted amount breaks the binding. */
  val cryptoShaCommitment = QueryDef(
    "crypto_sha_commitment",
    (s, dir) => {
      def commit(amount: Column, blinding: Column): Column =
        concat(lit("0x"), sha2(concat_ws("",
          lit("commitment:"), amount, lit(":"), blinding), 256))
      Tables(s, dir).events
        .withColumn("amt", expr("cast(floor(value * 1e9) as bigint)"))
        .withColumn("blinding", pmod(col("event_id"), lit(1000000L)) * lit(2654435761L))
        .withColumn("commitment", commit(col("amt"), col("blinding")))
        .select(
          col("event_id"),
          col("commitment"),
          (commit(col("amt"), col("blinding")) === col("commitment")).as("verify_ok"),
          (commit(col("amt") + lit(1L), col("blinding")) === col("commitment"))
            .as("verify_tampered"))
        .orderBy(col("event_id"))
    },
    oracle = Some("""
      WITH c AS (
        SELECT event_id,
          CAST(FLOOR(value * 1e9) AS BIGINT) AS amt,
          (event_id % 1000000) * 2654435761 AS blinding
        FROM events)
      SELECT event_id,
        '0x' || sha256('commitment:' || amt || ':' || blinding) AS commitment,
        TRUE AS verify_ok,
        ('0x' || sha256('commitment:' || (amt + 1) || ':' || blinding)) =
          ('0x' || sha256('commitment:' || amt || ':' || blinding)) AS verify_tampered
      FROM c ORDER BY event_id"""))

  /** Merkle membership proofs, generated DISTRIBUTED
    * ([[graft.functions.Merkle.proofDistributed]]: block-local paths +
    * a driver fold over block tops only — merkle.ts:112-166 re-shaped
    * for the depth-20/1M-leaf registry, where proof generation is itself
    * a distributed query) and verified DISTRIBUTED per row
    * (merkle.ts:171-195 fold). The n=64 / depth-8 demo keeps the output
    * oracle-stable; MerkleSpec drives the same path at depth 20 and
    * pins that the driver-side data stays ≤ 2^(depth−blockDepth) block
    * rows. Per-target leaf bytes are a bounded targets-only collect (a
    * prover always holds the leaf it proves). A tampered sibling per
    * row pins the negative case. Rows-only (Poseidon). */
  val cryptoMerkleVerify = QueryDef(
    "crypto_merkle_verify",
    (s, dir) => {
      import s.implicits._
      val P = graft.functions.Poseidon
      val M = graft.functions.Merkle
      val depth = 8
      val n = 64
      // ONE bounded collect (the n=64 demo leaves) feeds BOTH the
      // distributed proof pass and the per-target leaf lookup — the
      // lazy frame would re-run the customer scan for each
      val leafRows = T(s, dir).customer
        .filter(col("c_custkey") < lit(n.toLong))
        .select(col("c_custkey").cast("long").as("leaf_index"),
          unhex(md5(col("c_name"))).as("leaf"))
        .collect()
      val leafBytes = leafRows
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("leaf")).toMap
      val leaves = leafRows.toSeq
        .map(r => (r.getLong(0), r.getAs[Array[Byte]]("leaf")))
        .toDF("leaf_index", "leaf")
      val (root, proofs) =
        M.proofDistributed(s, leaves, 0L until n.toLong, depth, blockDepth = 4)
      val proofRows = proofs.toSeq.sortBy(_._1).map { case (i, (sibs, bits)) =>
        (i, leafBytes(i), sibs.map(P.toBytes32).toArray, bits.toArray)
      }
      val rootBytes = P.toBytes32(root)
      val verifyUdf = udf(
        (leaf: Array[Byte], sibs: Seq[Array[Byte]], bits: Seq[Int], tamper: Boolean) => {
          val sib0 = if (tamper) sibs.updated(0, Array.fill(32)(0x5a.toByte)) else sibs
          M.verify(P.fromBytes32(leaf), sib0.map(P.fromBytes32),
            bits, P.fromBytes32(rootBytes))
        })
      proofRows.toDF("leaf_index", "leaf", "sibs", "bits")
        .withColumn("valid", verifyUdf(col("leaf"), col("sibs"), col("bits"), lit(false)))
        .withColumn("tampered_valid",
          verifyUdf(col("leaf"), col("sibs"), col("bits"), lit(true)))
        .select(col("leaf_index"), col("valid"), col("tampered_valid"))
        .orderBy(col("leaf_index"))
    },
    oracle = None)

  val defs: Seq[QueryDef] = Seq(
    cryptoCommitment, cryptoNullifierDedup, cryptoMerkleRoot,
    cryptoShaCommitment, cryptoMerkleVerify)
}
