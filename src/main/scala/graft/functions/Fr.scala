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
    * this to run allocation-free.
    *
    * FULLY BRANCHLESS (r18): the previous form derived every carry from
    * `compareUnsigned` ternaries and finished with a compare-then-maybe-
    * subtract — on random field data those are ~70 data-dependent
    * branches per call, each a coin flip to the predictor, and the
    * mispredict stalls dominated the multiply itself (measured 2.2×
    * against this form on uniform inputs; the old 90 ns figure was a
    * fixed-operand microbench the predictor had memorized). Carries are
    * now bit arithmetic — carry(x,y,s) = (x&y | (x|y)&~s) >>> 63 — and
    * the final reduction computes t−p unconditionally, selecting by the
    * borrow mask. The unsigned-high fix is likewise mask arithmetic.
    * PropertiesSpec cross-checks against BigInt on random + edge values;
    * the Poseidon digests are pinned by CryptoSpec/VECTORS.md. */
  def montMul(a: Array[Long], b: Array[Long], out: Array[Long]): Unit = {
    val a0 = a(0); val a1 = a(1); val a2 = a(2); val a3 = a(3)
    // UNROLLED ×4 (r21): the rolled `while (i < 4)` form reloaded b(i)
    // (bounds check + load) per iteration and kept a loop counter whose
    // compare/branch sat on the critical carry chain; with ~620 montMul
    // calls per Poseidon permutation the loop control itself was
    // measurable. All four b limbs load once into locals and the body is
    // repeated — identical arithmetic, same digests (CryptoSpec pins the
    // VECTORS.md values; PropertiesSpec cross-checks against BigInt).
    val bl0 = b(0); val bl1 = b(1); val bl2 = b(2); val bl3 = b(3)
    var t0 = 0L; var t1 = 0L; var t2 = 0L; var t3 = 0L
    var lo = 0L; var s = 0L; var cc = 0L; var c2 = 0L; var s2 = 0L
    var m = 0L; var t4 = 0L
      // ---- b limb 0 ----
      lo = a0 * bl0
      s = t0 + lo
      cc = uhi(a0, bl0) + carry(t0, lo, s)
      t0 = s
      lo = a1 * bl0
      s = t1 + lo
      c2 = carry(t1, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t1 = s2; cc = uhi(a1, bl0) + c2
      lo = a2 * bl0
      s = t2 + lo
      c2 = carry(t2, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t2 = s2; cc = uhi(a2, bl0) + c2
      lo = a3 * bl0
      s = t3 + lo
      c2 = carry(t3, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t3 = s2; cc = uhi(a3, bl0) + c2
      t4 = cc // < 2^63: CIOS bound for 4-limb p < 2^255
      // Montgomery reduction: m = t0 * INV; t = (t + m*P) >> 64
      m = t0 * INV
      lo = m * P0
      s = t0 + lo // becomes 0 by construction; keep its carry
      cc = uhi(m, P0) + carry(t0, lo, s)
      lo = m * P1
      s = t1 + lo
      c2 = carry(t1, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t0 = s2; cc = uhi(m, P1) + c2
      lo = m * P2
      s = t2 + lo
      c2 = carry(t2, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t1 = s2; cc = uhi(m, P2) + c2
      lo = m * P3
      s = t3 + lo
      c2 = carry(t3, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t2 = s2; cc = uhi(m, P3) + c2
      t3 = t4 + cc

      // ---- b limb 1 ----
      lo = a0 * bl1
      s = t0 + lo
      cc = uhi(a0, bl1) + carry(t0, lo, s)
      t0 = s
      lo = a1 * bl1
      s = t1 + lo
      c2 = carry(t1, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t1 = s2; cc = uhi(a1, bl1) + c2
      lo = a2 * bl1
      s = t2 + lo
      c2 = carry(t2, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t2 = s2; cc = uhi(a2, bl1) + c2
      lo = a3 * bl1
      s = t3 + lo
      c2 = carry(t3, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t3 = s2; cc = uhi(a3, bl1) + c2
      t4 = cc // < 2^63: CIOS bound for 4-limb p < 2^255
      // Montgomery reduction: m = t0 * INV; t = (t + m*P) >> 64
      m = t0 * INV
      lo = m * P0
      s = t0 + lo // becomes 0 by construction; keep its carry
      cc = uhi(m, P0) + carry(t0, lo, s)
      lo = m * P1
      s = t1 + lo
      c2 = carry(t1, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t0 = s2; cc = uhi(m, P1) + c2
      lo = m * P2
      s = t2 + lo
      c2 = carry(t2, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t1 = s2; cc = uhi(m, P2) + c2
      lo = m * P3
      s = t3 + lo
      c2 = carry(t3, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t2 = s2; cc = uhi(m, P3) + c2
      t3 = t4 + cc

      // ---- b limb 2 ----
      lo = a0 * bl2
      s = t0 + lo
      cc = uhi(a0, bl2) + carry(t0, lo, s)
      t0 = s
      lo = a1 * bl2
      s = t1 + lo
      c2 = carry(t1, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t1 = s2; cc = uhi(a1, bl2) + c2
      lo = a2 * bl2
      s = t2 + lo
      c2 = carry(t2, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t2 = s2; cc = uhi(a2, bl2) + c2
      lo = a3 * bl2
      s = t3 + lo
      c2 = carry(t3, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t3 = s2; cc = uhi(a3, bl2) + c2
      t4 = cc // < 2^63: CIOS bound for 4-limb p < 2^255
      // Montgomery reduction: m = t0 * INV; t = (t + m*P) >> 64
      m = t0 * INV
      lo = m * P0
      s = t0 + lo // becomes 0 by construction; keep its carry
      cc = uhi(m, P0) + carry(t0, lo, s)
      lo = m * P1
      s = t1 + lo
      c2 = carry(t1, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t0 = s2; cc = uhi(m, P1) + c2
      lo = m * P2
      s = t2 + lo
      c2 = carry(t2, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t1 = s2; cc = uhi(m, P2) + c2
      lo = m * P3
      s = t3 + lo
      c2 = carry(t3, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t2 = s2; cc = uhi(m, P3) + c2
      t3 = t4 + cc

      // ---- b limb 3 ----
      lo = a0 * bl3
      s = t0 + lo
      cc = uhi(a0, bl3) + carry(t0, lo, s)
      t0 = s
      lo = a1 * bl3
      s = t1 + lo
      c2 = carry(t1, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t1 = s2; cc = uhi(a1, bl3) + c2
      lo = a2 * bl3
      s = t2 + lo
      c2 = carry(t2, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t2 = s2; cc = uhi(a2, bl3) + c2
      lo = a3 * bl3
      s = t3 + lo
      c2 = carry(t3, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t3 = s2; cc = uhi(a3, bl3) + c2
      t4 = cc // < 2^63: CIOS bound for 4-limb p < 2^255
      // Montgomery reduction: m = t0 * INV; t = (t + m*P) >> 64
      m = t0 * INV
      lo = m * P0
      s = t0 + lo // becomes 0 by construction; keep its carry
      cc = uhi(m, P0) + carry(t0, lo, s)
      lo = m * P1
      s = t1 + lo
      c2 = carry(t1, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t0 = s2; cc = uhi(m, P1) + c2
      lo = m * P2
      s = t2 + lo
      c2 = carry(t2, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t1 = s2; cc = uhi(m, P2) + c2
      lo = m * P3
      s = t3 + lo
      c2 = carry(t3, lo, s)
      s2 = s + cc
      c2 += carry(s, cc, s2)
      t2 = s2; cc = uhi(m, P3) + c2
      t3 = t4 + cc
    // branchless conditional subtract: d = t - p with a borrow chain;
    // keep t when the subtraction borrows out (t < p)
    val d0 = t0 - P0
    val b0 = borrow(t0, P0, 0L, d0)
    val d1 = t1 - P1 - b0
    val b1 = borrow(t1, P1, b0, d1)
    val d2 = t2 - P2 - b1
    val b2 = borrow(t2, P2, b1, d2)
    val d3 = t3 - P3 - b2
    val b3 = borrow(t3, P3, b2, d3)
    val keep = -(b3 & 1L)
    out(0) = (t0 & keep) | (d0 & ~keep)
    out(1) = (t1 & keep) | (d1 & ~keep)
    out(2) = (t2 & keep) | (d2 & ~keep)
    out(3) = (t3 & keep) | (d3 & ~keep)
  }

  /** Carry bit of the unsigned add x + y = s. */
  @inline private def carry(x: Long, y: Long, s: Long): Long =
    ((x & y) | ((x | y) & ~s)) >>> 63

  /** Borrow bit of the unsigned subtract x − y − bIn = d (bIn ∈ {0,1}):
    * borrows iff y + bIn exceeds x — computed from the sign-bit algebra
    * of (~x & y) | ((~x | y) & d), with the incoming borrow folded in
    * via the intermediate x − y. */
  @inline private def borrow(x: Long, y: Long, bIn: Long, d: Long): Long = {
    val di = x - y
    (((~x & y) | ((~x | y) & di)) >>> 63) +
      (((~di & bIn) | ((~di | bIn) & d)) >>> 63)
  }

  /** Math.multiplyHigh is SIGNED 64×64→high; fix to unsigned with mask
    * arithmetic (branchless): uhi(a,b) = shi(a,b) + (a>>63 & b) + (b>>63 & a). */
  @inline private def uhi(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  /** out := a + b mod p (both in [0, p), any form). out may alias a.
    * Branchless like [[montMul]] (r18): bitwise carries, unconditional
    * subtract, borrow-mask select — the permutation performs ~500 adds
    * per hash and random field data defeats the branch predictor. */
  def add(a: Array[Long], b: Array[Long], out: Array[Long]): Unit = {
    val a0 = a(0); val a1 = a(1); val a2 = a(2); val a3 = a(3)
    val b0i = b(0); val b1i = b(1); val b2i = b(2); val b3i = b(3)
    val t0 = a0 + b0i
    var c = carry(a0, b0i, t0)
    var s1 = a1 + b1i
    var c1 = carry(a1, b1i, s1)
    val t1 = s1 + c
    c = c1 + carry(s1, c, t1)
    s1 = a2 + b2i
    c1 = carry(a2, b2i, s1)
    val t2 = s1 + c
    c = c1 + carry(s1, c, t2)
    s1 = a3 + b3i
    val t3 = s1 + c
    // no carry computed out of limb 3: p < 2^254 and both inputs < p,
    // so the 256-bit sum never overflows — the selected subtract below
    // restores [0, p) (the dangling carry was dead, second r18 review)
    val d0 = t0 - P0
    val bb0 = borrow(t0, P0, 0L, d0)
    val d1 = t1 - P1 - bb0
    val bb1 = borrow(t1, P1, bb0, d1)
    val d2 = t2 - P2 - bb1
    val bb2 = borrow(t2, P2, bb1, d2)
    val d3 = t3 - P3 - bb2
    val bb3 = borrow(t3, P3, bb2, d3)
    val keep = -(bb3 & 1L)
    out(0) = (t0 & keep) | (d0 & ~keep)
    out(1) = (t1 & keep) | (d1 & ~keep)
    out(2) = (t2 & keep) | (d2 & ~keep)
    out(3) = (t3 & keep) | (d3 & ~keep)
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
