package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** S2 binary-record layer: fixed-offset encode/decode of typed records,
  * the Spark restatement of the reference's manual account parsers
  * (hive-sdk client.ts:539-602, lib/governance.ts:138-169,
  * stake/page.tsx:90-131 — discriminator skip, fixed-width ints,
  * length-prefixed UTF-8).
  *
  * The driver's test tables carry no binary columns, so each query
  * *constructs* the record from typed columns, then decodes it back at
  * fixed offsets — a round-trip: the DuckDB oracle simply selects the
  * original values, so any encode/decode asymmetry fails the hash check.
  *
  * All of this is codegen'd builtins (`hex`/`unhex`/`conv`/`substring`)
  * — no UDF in the decode path, so at 100 TB the decode stage stays
  * inside whole-stage codegen over the scan.
  */
object BinaryOps {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  /** Fixed-width big-endian u64 at a byte offset, as the reference's
    * readBigUInt64 decoders do (governance.ts:138-169). */
  private def be64(colName: String, byteOffset: Int) =
    conv(hex(expr(s"substring($colName, ${byteOffset + 1}, 8)")), 16, 10)
      .cast("long")

  /** S2a: 24-byte record = discriminator(8) ++ orderkey u64 BE ++ custkey
    * u64 BE; decode skips the discriminator like the reference's account
    * parsers skip the 8-byte Anchor tag (client.ts:539-545). */
  val s2DecodeFixed = QueryDef(
    "s2_decode_fixed",
    // kernelSorted: dec_orderkey decodes to exactly o_orderkey, so the
    // raw-key sort gives the same order with the codec run once
    (s, dir) => graft.QueryDef.kernelSorted(
      T(s, dir).orders.select(col("o_orderkey"), col("o_custkey")),
      col("o_orderkey")) {
      _.withColumn("rec",
        concat(
          unhex(lit("6772616674616363")), // 8-byte tag
          unhex(lpad(hex(col("o_orderkey")), 16, "0")),
          unhex(lpad(hex(col("o_custkey")), 16, "0"))))
        .select(
          be64("rec", 8).as("dec_orderkey"),
          be64("rec", 16).as("dec_custkey"))
    },
    oracle = Some("""
      SELECT o_orderkey AS dec_orderkey, o_custkey AS dec_custkey
      FROM orders ORDER BY dec_orderkey"""))

  /** S2b: length-prefixed UTF-8 string field (governance.ts:149-153):
    * record = u32 BE length ++ bytes; decode reads the length then slices. */
  val s2DecodeLenPrefix = QueryDef(
    "s2_decode_lenprefix",
    (s, dir) => T(s, dir).customer
      .withColumn("body", encode(col("c_name"), "UTF-8"))
      .withColumn("rec",
        concat(unhex(lpad(hex(length(col("body"))), 8, "0")), col("body")))
      .withColumn("dec_len",
        conv(hex(expr("substring(rec, 1, 4)")), 16, 10).cast("int"))
      .select(
        col("c_custkey"),
        decode(expr("substring(rec, 5, dec_len)"), "UTF-8").as("dec_name"))
      .orderBy(col("c_custkey")),
    oracle = Some("""
      SELECT c_custkey, c_name AS dec_name
      FROM customer ORDER BY c_custkey"""))

  /** Hex encode/decode parity (private-escrow.ts:77,128): Spark and DuckDB
    * must render identical uppercase hex of the UTF-8 bytes. */
  val s2Hex = QueryDef(
    "s2_hex",
    // text IS NOT NULL on BOTH sides: a null-text row would make the
    // === comparison NULL while the oracle hard-codes TRUE — today's
    // fixtures are null-free, but sibling layers (Multimodal, Text)
    // already guard this exact regeneration hazard (r13 sweep)
    (s, dir) => T(s, dir).documents
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        hex(encode(substring(col("text"), 1, 16), "UTF-8")).as("hex16"),
        (decode(unhex(hex(encode(col("text"), "UTF-8"))), "UTF-8") === col("text"))
          .as("roundtrip_ok"))
      .orderBy(col("doc_id")),
    oracle = Some("""
      SELECT doc_id, upper(hex(substring(text, 1, 16))) AS hex16,
        TRUE AS roundtrip_ok
      FROM documents WHERE text IS NOT NULL ORDER BY doc_id"""))

  /** Base58 encode/decode round-trip (hive-api.ts:29-30) over md5 digests.
    * DuckDB has no base58, so the checkable output is the round-trip truth
    * flag; the encoded string itself is covered by the UDF's unit spec. */
  val s2Base58Roundtrip = QueryDef(
    "s2_base58_roundtrip",
    (s, dir) => {
      val enc = graft.functions.Udfs.base58EncodeUdf
      val dec = graft.functions.Udfs.base58DecodeUdf
      T(s, dir).documents
        .filter(col("text").isNotNull) // same null-text guard as s2_hex
        .withColumn("digest", unhex(md5(col("text"))))
        .select(
          col("doc_id"),
          (dec(enc(col("digest"))) === col("digest")).as("roundtrip_ok"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      SELECT doc_id, TRUE AS roundtrip_ok
      FROM documents WHERE text IS NOT NULL ORDER BY doc_id"""))

  val defs: Seq[QueryDef] =
    Seq(s2DecodeFixed, s2DecodeLenPrefix, s2Hex, s2Base58Roundtrip)
}
