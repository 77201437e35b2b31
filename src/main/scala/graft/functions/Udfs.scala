package graft.functions

import org.apache.spark.sql.SparkSession
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

  def specHashBase36(spark: SparkSession): UserDefinedFunction =
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

  def base58Decode(s: String): Array[Byte] = {
    if (s == null) return null
    val ones = s.takeWhile(_ == '1').length
    var num = BigInt(0)
    s.foreach { c =>
      val v = if (c < 128) B58Idx(c.toInt) else -1
      require(v >= 0, s"invalid base58 char '$c'")
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
}
