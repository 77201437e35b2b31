package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Deterministic scalar UDFs for semantics Spark builtins can't express.
  *
  * Kept deliberately small (SURVEY §2.10): everything else in the engine is
  * codegen'd builtins. Each UDF is a pure JVM function — no native deps —
  * and marked deterministic so Catalyst can still push/prune around it.
  */
object Udfs {

  /** Reference rolling spec hash (escrow.ts:222-231): JS
    * `hash = ((hash<<5) - hash) + charCodeAt(i)` with 32-bit wrap per step
    * (`hash & hash`), then `Math.abs(hash).toString(36)`.
    * JVM Int arithmetic wraps identically; the one edge is
    * `Math.abs(Int.MinValue)` which JS renders as 2147483648.
    */
  def specHash(s: String): String = {
    var h = 0
    var i = 0
    while (i < s.length) {
      h = ((h << 5) - h) + s.charAt(i).toInt // wraps like JS `& hash`
      i += 1
    }
    val abs: Long = if (h == Int.MinValue) 2147483648L else math.abs(h).toLong
    java.lang.Long.toString(abs, 36)
  }

  def specHashBase36: UserDefinedFunction =
    udf((s: String) => if (s == null) null else specHash(s))

  // ----------------------------------------------------------------- base58

  private val B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val B58Idx: Array[Int] = {
    val a = Array.fill(128)(-1)
    B58.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Base58 encode (hive-api.ts:29-30 pubkey display). Standard Bitcoin
    * alphabet, leading-zero bytes become '1's. */
  def base58Encode(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val zeros = bytes.takeWhile(_ == 0).length
    var num = BigInt(1, bytes)
    val sb = new StringBuilder
    while (num > 0) {
      val (q, r) = num /% 58
      sb.append(B58((r.toInt)))
      num = q
    }
    ("1" * zeros) + sb.reverse.toString
  }

  /** Null on ANY invalid character ('0', 'O', 'I', 'l', non-ASCII…) —
    * dirty pubkey columns are the normal input, and a throwing decode
    * would fail the whole stage for one malformed row. Same
    * adversarial-input-is-normal contract as [[jsonScan]] (→ null) and
    * the proof decoders (→ None/false). */
  def base58Decode(s: String): Array[Byte] = {
    if (s == null) return null
    val ones = s.takeWhile(_ == '1').length
    var num = BigInt(0)
    s.foreach { c =>
      val v = if (c < 128) B58Idx(c.toInt) else -1
      if (v < 0) return null
      num = num * 58 + v
    }
    val body = if (num == 0) Array.emptyByteArray
    else {
      val b = num.toByteArray
      if (b.length > 1 && b(0) == 0) b.tail else b // strip sign byte
    }
    Array.fill[Byte](ones)(0) ++ body
  }

  def base58EncodeUdf: UserDefinedFunction = udf(base58Encode _)
  def base58DecodeUdf: UserDefinedFunction = udf(base58Decode _)

  // --------------------------------------------------------------- json scan

  /** Strict RFC-8259 JSON validity over the FULL string — the acceptance
    * set shared by JS `JSON.parse` and DuckDB `json_valid`, which is what
    * makes [[jsonScan]]'s oracle exact. (One input class where the two
    * anchors DISAGREE: JSON.parse tolerates lone surrogate escapes like
    * `"\uD800"`, DuckDB/yyjson rejects them — this validator sides with
    * DuckDB and the RFC's valid-Unicode reading, keeping the oracle
    * exact; similarly only ASCII digits are digits, as in both anchors.)
    * Hand-rolled recursive descent
    * instead of a classpath parser so acceptance never shifts with a
    * Jackson feature flag (default Jackson tolerates trailing tokens —
    * exactly the case the bracket scan must treat as invalid). Scalars
    * ("42", "true") are valid JSON texts, matching both anchors.
    * Container nesting rides an explicit heap stack (r6 ADVICE closed:
    * the earlier recursive form capped nesting at 512 for JVM stack
    * safety, a latent divergence boundary — JSON.parse and DuckDB
    * json_valid both accept far deeper), so accepted depth is bounded
    * only by input length. */
  def jsonValid(s: String): Boolean = {
    // null text is not-a-JSON-document, not an NPE: a SQL consumer
    // should null-guard the COLUMN for three-valued semantics (DuckDB's
    // json_valid(NULL) is NULL, which a Boolean method cannot return),
    // but the strict validator itself must never crash a stage on one
    // null row — the adversarial-input-is-normal contract above
    if (s == null) return false
    val n = s.length
    var i = 0
    var ok = true
    def fail(): Unit = { ok = false; i = n + 1 } // hard stop: every guard below is i < n
    def ws(): Unit = {
      while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    }
    def expect(c: Char): Unit =
      if (i < n && s.charAt(i) == c) i += 1 else fail()
    def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    def string(): Unit = {
      expect('"')
      var closed = false
      while (ok && !closed && i < n) {
        val c = s.charAt(i)
        if (c == '"') { closed = true; i += 1 }
        else if (c == '\\') {
          i += 1
          if (i >= n) fail()
          else s.charAt(i) match {
            case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 1
            case 'u' =>
              if (i + 4 < n && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2)) &&
                isHex(s.charAt(i + 3)) && isHex(s.charAt(i + 4))) {
                val cp = Integer.parseInt(s.substring(i + 1, i + 5), 16)
                i += 5
                // surrogate escapes must PAIR (high then low): DuckDB's
                // json_valid (yyjson) rejects a lone \uD800-class escape
                // while JSON.parse tolerates it — the one place the two
                // anchors disagree; this validator sides with DuckDB and
                // RFC-8259's valid-Unicode reading, and the divergence
                // from JS is documented in the scaladoc (r13 sweep,
                // empirically confirmed against both anchors)
                if (cp >= 0xD800 && cp <= 0xDBFF) {
                  if (i + 5 < n && s.charAt(i) == '\\' && s.charAt(i + 1) == 'u' &&
                    isHex(s.charAt(i + 2)) && isHex(s.charAt(i + 3)) &&
                    isHex(s.charAt(i + 4)) && isHex(s.charAt(i + 5))) {
                    val lo = Integer.parseInt(s.substring(i + 2, i + 6), 16)
                    if (lo >= 0xDC00 && lo <= 0xDFFF) i += 6 else fail()
                  } else fail()
                } else if (cp >= 0xDC00 && cp <= 0xDFFF) fail()
              } else fail()
            case _ => fail()
          }
        } else if (c < ' ') fail() // raw control chars must be escaped
        else i += 1
      }
      if (!closed) fail()
    }
    // ASCII 0-9 ONLY: Char.isDigit accepts every Unicode Nd digit
    // (Arabic-Indic ٢, fullwidth ０), which BOTH anchors reject —
    // "1٢" would validate here but fail JSON.parse and json_valid,
    // breaking the exact-acceptance-set contract (r13 sweep)
    def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
    def digits(): Unit = {
      if (i >= n || !isAsciiDigit(s.charAt(i))) fail()
      else while (i < n && isAsciiDigit(s.charAt(i))) i += 1
    }
    def number(): Unit = {
      if (i < n && s.charAt(i) == '-') i += 1
      if (i >= n) fail()
      else if (s.charAt(i) == '0') i += 1 // no leading zeros
      else digits()
      if (i < n && s.charAt(i) == '.') { i += 1; digits() }
      if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        digits()
      }
    }
    def literal(w: String): Unit =
      if (s.regionMatches(i, w, 0, w.length)) i += w.length else fail()
    // Iterative value traversal: `stack` holds one char per OPEN
    // container ('{' or '['); `needValue` distinguishes "about to read a
    // value" from "just finished one, close or continue the enclosing
    // container". Exactly the recursive grammar, flattened — the
    // whitespace/comma/colon sequencing mirrors the recursive form
    // token for token so acceptance is unchanged (UdfsSpec pins the
    // boundary vectors plus the deep-nesting cases the old cap
    // rejected).
    val stack = new java.lang.StringBuilder
    var needValue = true
    var done = false
    // one object-member prelude ("key" :) — the '{' opener and the ','
    // continuation must parse it token-identically for acceptance to
    // stay consistent, so it exists exactly once
    def member(): Unit = { ws(); string(); ws(); expect(':'); ws() }
    ws()
    while (ok && !done) {
      if (needValue) {
        if (i >= n) fail()
        else s.charAt(i) match {
          case '{' =>
            i += 1; ws()
            if (i < n && s.charAt(i) == '}') { i += 1; needValue = false }
            else { stack.append('{'); member() }
          case '[' =>
            i += 1; ws()
            if (i < n && s.charAt(i) == ']') { i += 1; needValue = false }
            else { stack.append('['); ws() }
          case '"' => string(); needValue = false
          case 't' => literal("true"); needValue = false
          case 'f' => literal("false"); needValue = false
          case 'n' => literal("null"); needValue = false
          case c if c == '-' || (c >= '0' && c <= '9') => number(); needValue = false
          case _ => fail()
        }
      } else {
        ws()
        if (stack.length == 0) done = true // top-level value complete
        else if (stack.charAt(stack.length - 1) == '{') {
          if (i < n && s.charAt(i) == ',') {
            i += 1; member(); needValue = true
          } else { expect('}'); stack.setLength(stack.length - 1) }
        } else {
          if (i < n && s.charAt(i) == ',') { i += 1; ws(); needValue = true }
          else { expect(']'); stack.setLength(stack.length - 1) }
        }
      }
    }
    ws()
    ok && i == n && stack.length == 0
  }

  /** LLM-response JSON recovery (swarm-llm.server.ts:17-37 `extractJson`):
    * trim; empty → null; if the whole text is strict JSON, return it;
    * else the slice from the FIRST '{' to the LAST '}' must be strict
    * JSON; else null. The reference returns the parsed object — the
    * engine's column form returns the recovered JSON TEXT so downstream
    * `from_json`/`get_json_object` stay in codegen'd builtins. */
  def jsonScan(text: String): String = {
    if (text == null) return null
    val t = text.trim
    if (t.isEmpty) return null
    if (jsonValid(t)) return t
    val start = t.indexOf('{')
    val end = t.lastIndexOf('}')
    if (start == -1 || end == -1 || end <= start) return null
    val slice = t.substring(start, end + 1)
    if (jsonValid(slice)) slice else null
  }

  def jsonScanUdf: UserDefinedFunction = udf(jsonScan _)
}
