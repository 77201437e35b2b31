package graft

import graft.functions.Udfs

/** Pure-JVM UDF kernels, checked against independent reimplementations
  * (the spec-hash against BigInt-mod-2^32 math; base58 against round-trip
  * and hand vectors). Randomized cases use a fixed seed — deterministic.
  * Extends SparkSpec (shared session) only for the UDF-wrapper null
  * checks; the kernels themselves stay Spark-free. */
class UdfsSpec extends SparkSpec {

  import spark.implicits._

  private val rng = new scala.util.Random(42L)

  /** Independent model of escrow.ts:222-231: 32-bit wrapping JS hash. */
  private def specHashModel(s: String): String = {
    val mod = BigInt(2).pow(32)
    var h = BigInt(0)
    for (c <- s) {
      h = ((h * 31) + c.toInt).mod(mod) // (h<<5)-h = h*31
    }
    val signed = if (h >= BigInt(2).pow(31)) h - mod else h
    java.lang.Long.toString(signed.abs.toLong, 36)
  }

  test("specHash matches independent 32-bit-wrap model") {
    assert(Udfs.specHash("") === "0")
    val long = "the quick brown fox jumps over the lazy dog" * 50
    assert(Udfs.specHash(long) === specHashModel(long))
    (1 to 500).foreach { _ =>
      val s = rng.alphanumeric.take(rng.nextInt(64)).mkString
      assert(Udfs.specHash(s) === specHashModel(s))
    }
    // non-ASCII / supplementary input: JS charCodeAt iterates UTF-16
    // code UNITS (an emoji is two surrogates), and the model does the
    // same via charAt — an alphanumeric-only corpus could never catch a
    // refactor to code POINTS (r13 test sweep)
    for (s <- Seq("héllo wörld", "日本語テキスト", "emoji 😀 tail",
        "mixed éß中🍕x")) {
      assert(Udfs.specHash(s) === specHashModel(s), s"non-ASCII: $s")
    }
    // the documented JS edge, driven for real: this crafted input's
    // 32-bit hash is EXACTLY Int.MinValue (found by constructive
    // search: last UTF-16 unit solves 31·h + c ≡ 2^31 mod 2^32), where
    // JS Math.abs renders 2147483648 while JVM math.abs(Int.MinValue)
    // is negative — the branch a refactor would most plausibly drop
    val minVal = "kSEUoawHᢛ"
    assert(Udfs.specHash(minVal) === specHashModel(minVal))
    assert(Udfs.specHash(minVal) === java.lang.Long.toString(2147483648L, 36))
    // null guard on the UDF wrapper: a null column value must yield
    // null, not an NPE in the stage
    val viaUdf = Seq((1, null: String), (2, "ok")).toDF("i", "s")
      .select(Udfs.specHashBase36($"s").as("h")).collect()
    assert(viaUdf(0).isNullAt(0) && viaUdf(1).getString(0) === Udfs.specHash("ok"))
  }

  test("base58 hand vectors (Bitcoin alphabet)") {
    assert(Udfs.base58Encode(Array[Byte](0)) === "1")
    assert(Udfs.base58Encode("Hello World!".getBytes("UTF-8")) === "2NEpo7TZRRrLZSi2U")
  }

  test("base58 round-trips arbitrary byte arrays") {
    (1 to 500).foreach { _ =>
      val bytes = Array.fill[Byte](rng.nextInt(40))(rng.nextInt().toByte)
      assert(Udfs.base58Decode(Udfs.base58Encode(bytes)).toSeq === bytes.toSeq)
    }
  }

  test("base58 decode nulls on invalid characters instead of failing the row") {
    // '0', 'O', 'I', 'l' are excluded from the Bitcoin alphabet; dirty
    // pubkey columns are normal input, so the decode must follow the
    // jsonScan null-on-bad-input contract, not throw mid-stage
    for (bad <- Seq("0", "O", "I", "l", "abcO123", "ключ", "a b"))
      assert(Udfs.base58Decode(bad) === null, s"'$bad' must decode to null")
    assert(Udfs.base58Decode(null) === null)
    assert(Udfs.base58Decode("").toSeq === Seq.empty) // empty is valid: zero bytes
  }

  test("jsonValid accepts/rejects the RFC-8259 boundary vectors") {
    val valid = Seq(
      """{}""", """[]""", """{"k": 69}""", """{"a":{"b":[1,2,{"c":null}]}}""",
      """[1, -0.5, 1e5, 2E-3, 0.25, true, false, null, "s"]""",
      "42", "-0", "\"str\"", "true", "null",
      """  {"ws" : "around"}  """,
      """{"esc":"a\n\t\"\\\/éb"}""",
      "\"\\ud83d\\ude00\"" /* paired surrogate escape (😀) */)
    val invalid = Seq(
      "", " ", "{", "}", "{]", """{"k":}""", """{"k":1,}""", """[1,]""",
      """{k:1}""", """{'k':1}""", "01", "+1", "1.", ".5", "1e", "--1",
      "tru", "nulll" /* trailing token */, """{"a":1} {"b":2}""",
      """{"a":1} trailing""", "\"unterminated", "\"raw\tcontrol\"",
      """{"a":"bad \x esc"}""", "NaN", "Infinity",
      // Unicode Nd digits: Char.isDigit accepts them, BOTH anchors
      // reject (DuckDB json_valid re-confirmed in-container, r13)
      "1٢", "-٢", "1e٥", "１",
      // lone/misordered surrogate escapes: DuckDB/yyjson rejects,
      // validator sides with it (divergence from JSON.parse documented)
      "\"\\ud800\"", "\"\\ud800x\"", "\"\\ude00\"", "\"\\ude00\\ud800\"")
    valid.foreach(v => assert(Udfs.jsonValid(v), s"should accept: $v"))
    invalid.foreach(v => assert(!Udfs.jsonValid(v), s"should reject: $v"))
    // null text: not-a-document (false), never an NPE — a direct
    // consumer without its own column guard must not crash a stage
    assert(!Udfs.jsonValid(null))
    // deep nesting (r6 ADVICE closed): the explicit-stack traversal has
    // no depth cap, so acceptance can no longer diverge from
    // JSON.parse/json_valid on payloads nested past the old 512 line —
    // 100k levels must validate without a stack overflow, and deep
    // UNBALANCED input must still reject
    assert(Udfs.jsonValid("[" * 100 + "1" + "]" * 100))
    assert(Udfs.jsonValid("[" * 100000 + "1" + "]" * 100000))
    assert(Udfs.jsonValid(
      "{\"a\":" * 10000 + "1" + "}" * 10000))
    assert(!Udfs.jsonValid("[" * 100000 + "1" + "]" * 99999))
    assert(!Udfs.jsonValid("[" * 100000))
  }

  test("jsonScan recovers embedded objects exactly as extractJson does") {
    // strict path: whole trimmed text is JSON (scalars included)
    assert(Udfs.jsonScan("""{"k": 69}""") === """{"k": 69}""")
    assert(Udfs.jsonScan("  42  ") === "42")
    // bracket path: first '{' to LAST '}' of prose-wrapped JSON
    assert(Udfs.jsonScan("Sure!\n{\"a\": {\"b\": 1}}\nBye.") === """{"a": {"b": 1}}""")
    // two objects in prose: the slice spans BOTH and fails to parse —
    // the reference's scan is first-to-last, not first-balanced
    assert(Udfs.jsonScan("""x {"a":1} y {"b":2} z""") === null)
    // no braces / reversed braces / empty / null
    assert(Udfs.jsonScan("no json here, sorry") === null)
    assert(Udfs.jsonScan("} backwards {") === null)
    assert(Udfs.jsonScan("") === null)
    assert(Udfs.jsonScan("   ") === null)
    assert(Udfs.jsonScan(null) === null)
    // truncated JSON: brace pair exists but the slice never parses
    assert(Udfs.jsonScan("Result: {oops {\"k\": 69} trailing }") === null)
    assert(Udfs.jsonScan("{\"k\": 6") === null)
  }
}
