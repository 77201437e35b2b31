package graft

import graft.functions.Udfs
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM UDF kernels, checked against independent reimplementations
  * (the spec-hash against BigInt-mod-2^32 math; base58 against round-trip
  * and hand vectors). Randomized cases use a fixed seed — deterministic. */
class UdfsSpec extends AnyFunSuite {

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
}
