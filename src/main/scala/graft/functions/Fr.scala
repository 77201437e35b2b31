package graft.functions

/** BN254 scalar-field arithmetic on 4×64-bit limbs in Montgomery form —
  * the allocation-free fast path under [[Poseidon]].
  *
  * Why this exists: the Poseidon permutation is ~64 rounds of ~15 field
  * multiplications, and the straightforward `BigInt` form allocates a
  * fresh heap object per operation and pays a full 508-bit division per
  * `mod` — measured at ~27 µs/hash, which made crypto_nullifier_dedup
  * the single most expensive query in the catalog at the sf10 tier
  * (276 s for 10M events, r14 sweep). CIOS Montgomery multiplication
  * over flat `Long` limbs does the same math in fixed registers with
  * zero allocation and no division.
  *
  * Scope: exactly what Poseidon needs — mul, add, to/from Montgomery,
  * BigInt conversion at the API boundary. NOT a general field library;
  * BN254.scala keeps its own arithmetic for the pairing tier (base
  * field Fp, extension towers), where per-row volume is 8 demo rows.
  *
  * Layout: little-endian limbs `(x0 + x1·2^64 + x2·2^128 + x3·2^192)`,
  * value in [0, P). A field element in Montgomery form represents
  * `x·R mod P` with `R = 2^256`. All methods are static and
  * side-effect-free except the explicit `into` out-params (the
  * permutation reuses scratch arrays to stay allocation-free per
  * round).
  *
  * Correctness surface: PropertiesSpec cross-checks mul/add/to/from
  * against BigInt over ScalaCheck-generated values, and the Poseidon
  * digests themselves are pinned by CryptoSpec, VECTORS.md and the
  * independent Python re-derivation (scripts/check_poseidon_vectors.py)
  * — a limb-arithmetic bug cannot ship silently.
  */
private[graft] object Fr {
  // BN254 scalar field modulus p (little-endian limbs)
  private val P0 = 0x43e1f593f0000001L
  private val P1 = 0x2833e84879b97091L
  private val P2 = 0xb85045b68181585dL
  private val P3 = 0x30644e72e131a029L
  // R^2 mod p — toMont(x) = montMul(x, R2)
  private val R20 = 0x1bb8e645ae216da7L
  private val R21 = 0x53fe3ab1e35c59e3L
  private val R22 = 0x8c49833d53bb8085L
  private val R23 = 0x216d0b17f4e44a5L
  // -p^{-1} mod 2^64 (the Montgomery reduction factor)
  private val INV = 0xc2e1f593efffffffL

  /** The modulus as BigInt — PropertiesSpec asserts the limb constants
    * above reconstruct exactly this value. */
  val P: BigInt = BigInt(
    "21888242871839275222246405745257275088548364400416034343698204186575808495617")

  /** out := a * b in Montgomery form (CIOS, 4 limbs). ALIAS-SAFE: every
    * input limb is consumed into locals before `out` is written, so
    * `montMul(x, x, x)` squares in place — the permutation relies on
    * this to run allocation-free. */
  def montMul(a: Array[Long], b: Array[Long], out: Array[Long]): Unit = {
    // t has 5 limbs of accumulator state (t4 the running overflow)
    var t0 = 0L; var t1 = 0L; var t2 = 0L; var t3 = 0L; var t4 = 0L
    var i = 0
    while (i < 4) {
      val bi = b(i)
      // t += a * bi
      var carry = 0L
      // limb 0
      var lo = a(0) * bi
      var hi = Math.multiplyHigh(a(0), bi) + unsignedHiFix(a(0), bi)
      var s = t0 + lo
      carry = hi + (if (java.lang.Long.compareUnsigned(s, t0) < 0) 1L else 0L)
      t0 = s
      // limb 1
      lo = a(1) * bi
      hi = Math.multiplyHigh(a(1), bi) + unsignedHiFix(a(1), bi)
      s = t1 + lo
      var c2 = if (java.lang.Long.compareUnsigned(s, t1) < 0) 1L else 0L
      var s2 = s + carry
      c2 += (if (java.lang.Long.compareUnsigned(s2, s) < 0) 1L else 0L)
      t1 = s2; carry = hi + c2
      // limb 2
      lo = a(2) * bi
      hi = Math.multiplyHigh(a(2), bi) + unsignedHiFix(a(2), bi)
      s = t2 + lo
      c2 = if (java.lang.Long.compareUnsigned(s, t2) < 0) 1L else 0L
      s2 = s + carry
      c2 += (if (java.lang.Long.compareUnsigned(s2, s) < 0) 1L else 0L)
      t2 = s2; carry = hi + c2
      // limb 3
      lo = a(3) * bi
      hi = Math.multiplyHigh(a(3), bi) + unsignedHiFix(a(3), bi)
      s = t3 + lo
      c2 = if (java.lang.Long.compareUnsigned(s, t3) < 0) 1L else 0L
      s2 = s + carry
      c2 += (if (java.lang.Long.compareUnsigned(s2, s) < 0) 1L else 0L)
      t3 = s2; carry = hi + c2
      t4 += carry // t4 < 2^63 throughout: products are < 2^128, sums bounded

      // Montgomery reduction step: m = t0 * INV mod 2^64; t += m * P; t >>= 64
      val m = t0 * INV
      // t0 + m*P0 — low limb becomes zero by construction; keep its carry
      lo = m * P0
      hi = Math.multiplyHigh(m, P0) + unsignedHiFix(m, P0)
      s = t0 + lo
      carry = hi + (if (java.lang.Long.compareUnsigned(s, t0) < 0) 1L else 0L)
      // limb 1
      lo = m * P1
      hi = Math.multiplyHigh(m, P1) + unsignedHiFix(m, P1)
      s = t1 + lo
      c2 = if (java.lang.Long.compareUnsigned(s, t1) < 0) 1L else 0L
      s2 = s + carry
      c2 += (if (java.lang.Long.compareUnsigned(s2, s) < 0) 1L else 0L)
      t0 = s2; carry = hi + c2
      // limb 2
      lo = m * P2
      hi = Math.multiplyHigh(m, P2) + unsignedHiFix(m, P2)
      s = t2 + lo
      c2 = if (java.lang.Long.compareUnsigned(s, t2) < 0) 1L else 0L
      s2 = s + carry
      c2 += (if (java.lang.Long.compareUnsigned(s2, s) < 0) 1L else 0L)
      t1 = s2; carry = hi + c2
      // limb 3
      lo = m * P3
      hi = Math.multiplyHigh(m, P3) + unsignedHiFix(m, P3)
      s = t3 + lo
      c2 = if (java.lang.Long.compareUnsigned(s, t3) < 0) 1L else 0L
      s2 = s + carry
      c2 += (if (java.lang.Long.compareUnsigned(s2, s) < 0) 1L else 0L)
      t2 = s2; carry = hi + c2
      // overflow limb
      s = t4 + carry
      t3 = s
      t4 = 0L // t4 + carry < 2^64 (CIOS bound for 4-limb p < 2^255)
      i += 1
    }
    out(0) = t0; out(1) = t1; out(2) = t2; out(3) = t3
    condSubP(out)
  }

  /** Math.multiplyHigh is SIGNED 64×64→high; fix to unsigned:
    * uhi(a,b) = shi(a,b) + (a<0 ? b : 0) + (b<0 ? a : 0). */
  @inline private def unsignedHiFix(a: Long, b: Long): Long =
    (if (a < 0) b else 0L) + (if (b < 0) a else 0L)

  /** out := a + b mod p (both in [0, p), any form). out may alias a. */
  def add(a: Array[Long], b: Array[Long], out: Array[Long]): Unit = {
    var s = a(0) + b(0)
    var c = if (java.lang.Long.compareUnsigned(s, a(0)) < 0) 1L else 0L
    out(0) = s
    var s1 = a(1) + b(1)
    var c1 = if (java.lang.Long.compareUnsigned(s1, a(1)) < 0) 1L else 0L
    s = s1 + c
    c = c1 + (if (java.lang.Long.compareUnsigned(s, s1) < 0) 1L else 0L)
    out(1) = s
    s1 = a(2) + b(2)
    c1 = if (java.lang.Long.compareUnsigned(s1, a(2)) < 0) 1L else 0L
    s = s1 + c
    c = c1 + (if (java.lang.Long.compareUnsigned(s, s1) < 0) 1L else 0L)
    out(2) = s
    s1 = a(3) + b(3)
    c1 = if (java.lang.Long.compareUnsigned(s1, a(3)) < 0) 1L else 0L
    s = s1 + c
    c = c1 + (if (java.lang.Long.compareUnsigned(s, s1) < 0) 1L else 0L)
    out(3) = s
    // p < 2^254 and both inputs < p, so the 256-bit sum never truly
    // overflows (c is always 0 here) — the conditional subtract below
    // restores [0, p)
    condSubP(out)
  }

  /** x := x - p if x >= p (unsigned 4-limb compare + borrow chain). */
  @inline private def condSubP(x: Array[Long]): Unit = {
    // compare x ? p, big limb first
    var ge = false
    var decided = false
    var cmp = java.lang.Long.compareUnsigned(x(3), P3)
    if (cmp != 0) { ge = cmp > 0; decided = true }
    if (!decided) { cmp = java.lang.Long.compareUnsigned(x(2), P2)
      if (cmp != 0) { ge = cmp > 0; decided = true } }
    if (!decided) { cmp = java.lang.Long.compareUnsigned(x(1), P1)
      if (cmp != 0) { ge = cmp > 0; decided = true } }
    if (!decided) ge = java.lang.Long.compareUnsigned(x(0), P0) >= 0
    if (ge) {
      var d = x(0) - P0
      var borrow = if (java.lang.Long.compareUnsigned(x(0), P0) < 0) 1L else 0L
      x(0) = d
      var d1 = x(1) - P1
      var b1 = if (java.lang.Long.compareUnsigned(x(1), P1) < 0) 1L else 0L
      d = d1 - borrow
      borrow = b1 + (if (java.lang.Long.compareUnsigned(d1, borrow) < 0) 1L else 0L)
      x(1) = d
      d1 = x(2) - P2
      b1 = if (java.lang.Long.compareUnsigned(x(2), P2) < 0) 1L else 0L
      d = d1 - borrow
      borrow = b1 + (if (java.lang.Long.compareUnsigned(d1, borrow) < 0) 1L else 0L)
      x(2) = d
      d1 = x(3) - P3
      d = d1 - borrow
      x(3) = d
    }
  }

  private val R2arr = Array(R20, R21, R22, R23)

  /** value (standard form, [0,p)) → Montgomery form. Fresh array. */
  def toMont(a: Array[Long]): Array[Long] = {
    val out = new Array[Long](4)
    montMul(a, R2arr, out)
    out
  }

  /** Montgomery form → standard form (montMul by 1). Fresh array. */
  def fromMont(a: Array[Long]): Array[Long] = {
    val one = Array(1L, 0L, 0L, 0L)
    val out = new Array[Long](4)
    montMul(a, one, out)
    out
  }

  /** BigInt (any value; reduced mod p) → standard-form limbs. */
  def fromBigInt(x: BigInt): Array[Long] = {
    val v = x.mod(P)
    val mask = (BigInt(1) << 64) - 1
    Array.tabulate(4)(i => ((v >> (64 * i)) & mask).longValue)
  }

  /** Standard-form limbs → BigInt. */
  def toBigInt(a: Array[Long]): BigInt =
    (3 to 0 by -1).foldLeft(BigInt(0))((acc, i) =>
      (acc << 64) | (BigInt(a(i) >>> 1) << 1) | BigInt(a(i) & 1L))
}
