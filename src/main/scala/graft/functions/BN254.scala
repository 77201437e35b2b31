package graft.functions

/** BN254 (alt_bn128) pairing and Groth16 proof verification — the
  * cryptographic half of the reference's reputation gate that round-10
  * adjudicated as the one remaining capability gap: the reference
  * verifies snarkjs Groth16 proofs over this curve
  * (`lib/reputation-prover-impl.ts:162-207` generates them;
  * `packages/radr/src/reputation/shadow-id-gate.ts:115-203` routes
  * `encodedProof` through `zk.verifier` when the ZK infrastructure is
  * available, falling back to the structural checks that
  * [[graft.operators.Crypto]]'s `crypto_verify_proof` already
  * implements). This module supplies the `zk.verifier` analog: a pure
  * JVM pairing check with no native dependencies, usable inside
  * executors like [[Poseidon]].
  *
  * Curve (public parameters, EIP-196/197): base field q, scalar field
  * r (= [[Poseidon.P]]), E: y² = x³ + 3 over Fq with G1 = E(Fq)
  * (prime order r, cofactor 1), and G2 the order-r subgroup of the
  * D-type sextic twist E': y² = x³ + 3/ξ over Fq², ξ = 9 + u.
  *
  * Pairing choice, stated plainly: this implements the REDUCED TATE
  * pairing t(P, Q) = f_{r,P}(ψ(Q))^((q¹²−1)/r) with the Miller loop
  * over the G1 point (all curve arithmetic in Fq; only line
  * evaluations touch Fq¹²), not the optimal-ate loop snarkjs uses.
  * Any two non-degenerate bilinear pairings on the same cyclic
  * (G1, G2) differ by a FIXED exponent k coprime to r — e₂(P,Q) =
  * e₁(P,Q)^k for all P, Q, by bilinearity from the generators — so a
  * product-of-pairings equation ∏ e(Pᵢ,Qᵢ) = 1 holds under one
  * pairing iff it holds under the other, and the Groth16 acceptance
  * predicate is EXACTLY such a form. Verification semantics are
  * therefore identical to snarkjs'; the Tate form is chosen because
  * it removes the ate loop's twist-Frobenius constants — the most
  * error-prone part of a pairing implementation — in favor of
  * textbook arithmetic whose every layer is property-tested
  * (BN254Spec: field axioms, curve/order checks, bilinearity,
  * non-degeneracy, and end-to-end Groth16 accept/reject vectors).
  *
  * Denominator elimination: vertical-line factors lie in Fq⁶ (the
  * untwisted Qx = x'·w² = x'·v lands in the even subfield), and
  * (q⁶−1) divides (q¹²−1)/r, so they vanish under the final
  * exponentiation and the Miller loop omits them — the standard BN
  * simplification, which also disposes of the T = −P / 2T = O edge
  * cases (their lines are vertical; points of odd prime order r
  * never double to O mid-loop).
  *
  * Scale posture: verification is a bounded per-row scalar kernel
  * (~4 Miller loops + 1 shared final exponentiation per proof,
  * ~180 ms of pure BigInt math on a warmed JVM — latency-envelope
  * spec — no allocation beyond the tower) — the same "opaque
  * deterministic function over row bytes" shape as `poseidon_hash`,
  * embarrassingly parallel over a proofs table. Cross-engine parity
  * with the ate form is additionally settled by an independent
  * Python implementation over the VECTORS.md pairing blob
  * (`scripts/check_pairing_vector.py`). */
object BN254 {

  /** Base field modulus q (EIP-196). */
  val Q: BigInt = BigInt(
    "21888242871839275222246405745257275088696311157297823662689037894645226208583")

  /** Group order / scalar field r — the same modulus Poseidon hashes
    * into (merkle.ts:11). */
  val R: BigInt = Poseidon.P

  @inline private def fq(x: BigInt): BigInt = x.mod(Q)

  // ---------------------------------------------------------------------
  // Field tower: Fq2 = Fq[u]/(u²+1); Fq6 = Fq2[v]/(v³−ξ), ξ = 9+u;
  // Fq12 = Fq6[w]/(w²−v).
  // ---------------------------------------------------------------------

  /** a + b·u with u² = −1. */
  final case class Fp2(a: BigInt, b: BigInt) {
    def +(o: Fp2) = Fp2(fq(a + o.a), fq(b + o.b))
    def -(o: Fp2) = Fp2(fq(a - o.a), fq(b - o.b))
    def *(o: Fp2) = {
      val aa = a * o.a; val bb = b * o.b
      Fp2(fq(aa - bb), fq((a + b) * (o.a + o.b) - aa - bb))
    }
    def *(s: BigInt) = Fp2(fq(a * s), fq(b * s))
    def unary_- = Fp2(fq(-a), fq(-b))
    def sq: Fp2 = this * this
    def isZero: Boolean = a.signum == 0 && b.signum == 0
    /** (a − bu)/(a² + b²). */
    def inv: Fp2 = {
      val n = fq(a * a + b * b).modInverse(Q)
      Fp2(fq(a * n), fq(-b * n))
    }
  }
  object Fp2 {
    val zero = Fp2(BigInt(0), BigInt(0))
    val one = Fp2(BigInt(1), BigInt(0))
    /** ξ = 9 + u, the cubic non-residue the tower is built on. */
    val xi = Fp2(BigInt(9), BigInt(1))
  }

  /** c0 + c1·v + c2·v² with v³ = ξ. */
  final case class Fp6(c0: Fp2, c1: Fp2, c2: Fp2) {
    def +(o: Fp6) = Fp6(c0 + o.c0, c1 + o.c1, c2 + o.c2)
    def -(o: Fp6) = Fp6(c0 - o.c0, c1 - o.c1, c2 - o.c2)
    def unary_- = Fp6(-c0, -c1, -c2)
    def *(o: Fp6) = Fp6(
      c0 * o.c0 + Fp2.xi * (c1 * o.c2 + c2 * o.c1),
      c0 * o.c1 + c1 * o.c0 + Fp2.xi * (c2 * o.c2),
      c0 * o.c2 + c1 * o.c1 + c2 * o.c0)
    def *(s: BigInt) = Fp6(c0 * s, c1 * s, c2 * s)
    /** ·v: (c0, c1, c2) → (ξ·c2, c0, c1). */
    def mulV: Fp6 = Fp6(Fp2.xi * c2, c0, c1)
    def isZero: Boolean = c0.isZero && c1.isZero && c2.isZero
    /** Standard Fq6 inversion (Devegili et al.): with A = c0²−ξc1c2,
      * B = ξc2²−c0c1, C = c1²−c0c2, F = c0A + ξ(c2B + c1C), the
      * inverse is (A, B, C)/F — verified against x·x⁻¹ = 1 in spec. */
    def inv: Fp6 = {
      val A = c0.sq - Fp2.xi * (c1 * c2)
      val B = Fp2.xi * c2.sq - c0 * c1
      val C = c1.sq - c0 * c2
      val f = (c0 * A + Fp2.xi * (c2 * B + c1 * C)).inv
      Fp6(A * f, B * f, C * f)
    }
  }
  object Fp6 {
    val zero = Fp6(Fp2.zero, Fp2.zero, Fp2.zero)
    val one = Fp6(Fp2.one, Fp2.zero, Fp2.zero)
  }

  /** c0 + c1·w with w² = v. */
  final case class Fp12(c0: Fp6, c1: Fp6) {
    def +(o: Fp12) = Fp12(c0 + o.c0, c1 + o.c1)
    def -(o: Fp12) = Fp12(c0 - o.c0, c1 - o.c1)
    def *(o: Fp12) = {
      val aa = c0 * o.c0; val bb = c1 * o.c1
      Fp12(aa + bb.mulV, (c0 + c1) * (o.c0 + o.c1) - aa - bb)
    }
    def *(s: BigInt) = Fp12(c0 * s, c1 * s)
    def sq: Fp12 = this * this
    /** q⁶-Frobenius: w ↦ −w. */
    def conj: Fp12 = Fp12(c0, -c1)
    def inv: Fp12 = {
      val f = (c0 * c0 - (c1 * c1).mulV).inv
      Fp12(c0 * f, -(c1 * f))
    }
    def pow(e: BigInt): Fp12 = {
      var acc = Fp12.one
      var i = e.bitLength - 1
      while (i >= 0) {
        acc = acc.sq
        if (e.testBit(i)) acc = acc * this
        i -= 1
      }
      acc
    }
    /** Multiply by a Miller-loop line value, which is SPARSE in this
      * basis: a + b·v + d·(v·w) — slots (c0.c0, c0.c1, c1.c1), all
      * others zero. 18 Fq2 products instead of the generic 27; the
      * hot-path win is measured in the spec's latency envelope.
      * Derivation: with L0 = (a, b, 0), L1 = (0, d, 0) over Fq6,
      * result = (c0·L0 + v·(c1·L1), c0·L1 + c1·L0). */
    def mulLine(a: Fp2, b: Fp2, d: Fp2): Fp12 = {
      def mul01(x: Fp6): Fp6 = Fp6( // ×(a + b·v): 6 products
        x.c0 * a + Fp2.xi * (x.c2 * b),
        x.c0 * b + x.c1 * a,
        x.c1 * b + x.c2 * a)
      def mul1(x: Fp6): Fp6 = // ×(d·v): 3 products
        Fp6(Fp2.xi * (x.c2 * d), x.c0 * d, x.c1 * d)
      Fp12(mul01(c0) + mul1(c1).mulV, mul1(c0) + mul01(c1))
    }
  }
  object Fp12 {
    val zero = Fp12(Fp6.zero, Fp6.zero)
    val one = Fp12(Fp6.one, Fp6.zero)
    /** Embed s ∈ Fq. */
    def scalar(s: BigInt) = Fp12(Fp6(Fp2(fq(s), BigInt(0)), Fp2.zero, Fp2.zero), Fp6.zero)
  }

  // ---------------------------------------------------------------------
  // Curve points (affine + infinity flag).
  // ---------------------------------------------------------------------

  /** Affine G1 point; (0,0) is reserved as THE infinity encoding (it is
    * not on y² = x³ + 3). This matches the EIP-196 precompile
    * convention the reference's on-chain path inherits. */
  final case class G1(x: BigInt, y: BigInt) {
    def isInfinity: Boolean = x.signum == 0 && y.signum == 0
    /** Coordinates in canonical reduced form [0, q). The group law
      * detects doubling/negation by EXACT BigInt equality, so a
      * congruent-but-unreduced coordinate (x + q) would take the
      * distinct-x add branch and hit a zero slope denominator
      * (modInverse throws) instead of doubling — every verifier entry
      * point must reject non-canonical points up front. */
    def canonical: Boolean =
      x.signum >= 0 && x < Q && y.signum >= 0 && y < Q
    def onCurve: Boolean =
      isInfinity || fq(y * y - x * x * x - 3).signum == 0
    def unary_- : G1 = if (isInfinity) this else G1(x, fq(-y))
    def +(o: G1): G1 =
      if (isInfinity) o
      else if (o.isInfinity) this
      else if (x == o.x) {
        if (fq(y + o.y).signum == 0) G1.infinity
        else { // doubling
          val l = fq(3 * x * x * fq(2 * y).modInverse(Q))
          val x3 = fq(l * l - 2 * x)
          G1(x3, fq(l * (x - x3) - y))
        }
      } else {
        val l = fq((o.y - y) * fq(o.x - x).modInverse(Q))
        val x3 = fq(l * l - x - o.x)
        G1(x3, fq(l * (x - x3) - y))
      }
    /** Plain double-and-add over the FULL scalar — deliberately not
      * reduced mod r: subgroup checks multiply candidate points of
      * unknown order by r, where a mod-r "optimization" would turn the
      * check into a tautology. Negative k negates the point. */
    def *(k: BigInt): G1 = {
      if (k.signum < 0) return (-this) * (-k)
      var acc = G1.infinity
      var i = k.bitLength - 1
      while (i >= 0) {
        acc = acc + acc
        if (k.testBit(i)) acc = acc + this
        i -= 1
      }
      acc
    }
  }
  object G1 {
    val infinity = G1(BigInt(0), BigInt(0))
    /** The standard generator (1, 2). */
    val gen = G1(BigInt(1), BigInt(2))
  }

  /** Affine twist point over Fq2 on y² = x³ + 3/ξ; (0,0) = infinity. */
  final case class G2(x: Fp2, y: Fp2) {
    def isInfinity: Boolean = x.isZero && y.isZero
    /** All four coordinates reduced to [0, q) — see [[G1.canonical]]. */
    def canonical: Boolean =
      Seq(x.a, x.b, y.a, y.b).forall(v => v.signum >= 0 && v < Q)
    def onCurve: Boolean =
      isInfinity || (y.sq - x.sq * x - G2.b).isZero
    def unary_- : G2 = if (isInfinity) this else G2(x, -y)
    def +(o: G2): G2 =
      if (isInfinity) o
      else if (o.isInfinity) this
      else if (x == o.x) {
        if ((y + o.y).isZero) G2.infinity
        else {
          val l = x.sq * BigInt(3) * (y * BigInt(2)).inv
          val x3 = l.sq - x * BigInt(2)
          G2(x3, l * (x - x3) - y)
        }
      } else {
        val l = (o.y - y) * (o.x - x).inv
        val x3 = l.sq - x - o.x
        G2(x3, l * (x - x3) - y)
      }
    /** Full-scalar double-and-add; see [[G1.*]] for why there is no
      * mod-r reduction. */
    def *(k: BigInt): G2 = {
      if (k.signum < 0) return (-this) * (-k)
      var acc = G2.infinity
      var i = k.bitLength - 1
      while (i >= 0) {
        acc = acc + acc
        if (k.testBit(i)) acc = acc + this
        i -= 1
      }
      acc
    }
    /** Order-r subgroup membership. The twist group has order
      * r·(2q − r); a proof point off the r-torsion would make the
      * pairing product leak outside μ_r. */
    def inSubgroup: Boolean = onCurve && (isInfinity || (this * R).isInfinity)
  }
  object G2 {
    val infinity = G2(Fp2.zero, Fp2.zero)
    /** b' = 3/ξ. */
    val b: Fp2 = Fp2(BigInt(3), BigInt(0)) * Fp2.xi.inv
    /** The standard G2 generator (EIP-197 / snarkjs vk convention);
      * BN254Spec PROVES these constants rather than trusting them:
      * on-curve and r·gen = O. */
    val gen = G2(
      Fp2(
        BigInt("10857046999023057135944570762232829481370756359578518086990519993285655852781"),
        BigInt("11559732032986387107991004021392285783925812861821192530917403151452391805634")),
      Fp2(
        BigInt("8495653923123431417604973247489272438418190587263600148770280649306958101930"),
        BigInt("4082367875863433681332203403145435568316851327593401208105741076214120093531")))
  }

  // ---------------------------------------------------------------------
  // Pairing.
  // ---------------------------------------------------------------------

  /** Miller loop f_{r,P}(ψ(Q)) with denominator elimination, over the
    * UNTWISTED Q: ψ(x', y') = (x'·w², y'·w³) — with w² = v and v³ = ξ
    * this lands on y² = x³ + 3 exactly when (x', y') is on the twist,
    * and Qx sits in the even subfield, which is what licenses
    * denominator elimination. The line value λ(Qx − xt) − (Qy − yt)
    * therefore has exactly three nonzero Fq2 slots — scalar part
    * (yt − λxt), λx' in the v slot, −y' in the v·w slot — consumed by
    * the sparse [[Fp12.mulLine]] instead of a generic product; the −y'
    * component is loop-invariant.
    *
    * P must be a non-infinity G1 point (order r — infinity is handled
    * by the callers as a degenerate pairing = 1); Q non-infinity on
    * the twist. All T arithmetic is over Fq; T never reaches O
    * mid-loop (odd prime order), and the final add step's vertical
    * line is elided. */
  private def miller(p: G1, q: G2): Fp12 = {
    val negQy = -q.y
    var f = Fp12.one
    var xt = p.x; var yt = p.y
    var tInf = false
    var i = R.bitLength - 2
    while (i >= 0) {
      // doubling step
      if (!tInf) {
        val l = fq(3 * xt * xt * fq(2 * yt).modInverse(Q))
        f = f.sq.mulLine(Fp2(fq(yt - l * xt), BigInt(0)), q.x * l, negQy)
        val x3 = fq(l * l - 2 * xt)
        yt = fq(l * (xt - x3) - yt); xt = x3
      } else f = f.sq
      if (R.testBit(i)) {
        if (!tInf) {
          if (xt == p.x) {
            // T = −P (the loop's very last addition): vertical line,
            // eliminated; T → O
            tInf = true
          } else {
            val l = fq((p.y - yt) * fq(p.x - xt).modInverse(Q))
            f = f.mulLine(Fp2(fq(yt - l * xt), BigInt(0)), q.x * l, negQy)
            val x3 = fq(l * l - xt - p.x)
            yt = fq(l * (xt - x3) - yt); xt = x3
          }
        }
      }
      i -= 1
    }
    f
  }

  /** (q¹² − 1)/r exponentiation, split as (q⁶−1) · (q²+1) ·
    * ((q⁴−q²+1)/r): the first factor is conj·inv (one cheap Frobenius
    * plus one inversion), the q²-power is the coefficient-wise
    * [[frobenius2]] below, and the hard part stays plain
    * square-and-multiply — simple over fast, per the module's
    * correctness-first contract. */
  private val hardExp: BigInt = (Q.pow(4) - Q.pow(2) + 1) / R
  require((Q.pow(4) - Q.pow(2) + 1).mod(R).signum == 0,
    "BN254: r must divide q^4 - q^2 + 1")

  /** q²-Frobenius multipliers λ_m = w^(m·(q²−1)) for basis slot
    * v^j·w^k (m = 2j + k): x^(q²) multiplies each Fq2 coefficient by
    * the SCALAR λ_m. DERIVED at init, not transcribed — λ_1 =
    * ξ^((q²−1)/6) computed by Fq2 exponentiation, the rest its powers
    * — and each is REQUIRED to be a real scalar (imaginary part 0), so
    * a wrong tower relation fails loudly at class load instead of
    * corrupting every final exponentiation. (q² ≡ 1 mod 6 makes the
    * basis slots Frobenius²-stable; the divisibility is checked.) */
  private val frob2: Array[BigInt] = {
    require(((Q * Q - 1) % 6).signum == 0, "BN254: 6 must divide q^2 - 1")
    def fp2pow(x: Fp2, e: BigInt): Fp2 = {
      var acc = Fp2.one; var i = e.bitLength - 1
      while (i >= 0) { acc = acc.sq; if (e.testBit(i)) acc = acc * x; i -= 1 }
      acc
    }
    val l1 = fp2pow(Fp2.xi, (Q * Q - 1) / 6) // w^(q²−1), in Fq2 a priori
    (0 until 6).map { m =>
      val lm = fp2pow(l1, BigInt(m))
      require(lm.b.signum == 0,
        s"BN254: Frobenius² multiplier for slot $m is not a scalar")
      lm.a
    }.toArray
  }

  /** x^(q²) via the derived per-slot scalars — replaces a 508-bit
    * generic exponentiation in the final-exponentiation easy part. */
  private def frobenius2(x: Fp12): Fp12 = Fp12(
    Fp6(x.c0.c0 * frob2(0), x.c0.c1 * frob2(2), x.c0.c2 * frob2(4)),
    Fp6(x.c1.c0 * frob2(1), x.c1.c1 * frob2(3), x.c1.c2 * frob2(5)))

  private def finalExp(f: Fp12): Fp12 = {
    val easy = f.conj * f.inv                 // f^(q⁶−1)
    val easy2 = frobenius2(easy) * easy       // ^(q²+1)
    easy2.pow(hardExp)
  }

  /** Reduced Tate pairing t(P, Q) ∈ μ_r ⊂ Fq¹². Degenerate inputs
    * (either point at infinity) pair to 1, as on the EIP-197
    * precompile. */
  def pairing(p: G1, q: G2): Fp12 =
    if (p.isInfinity || q.isInfinity) Fp12.one
    else finalExp(miller(p, q))

  /** ∏ t(Pᵢ, Qᵢ) with ONE shared final exponentiation — the shape every
    * pairing-product verifier uses; 4× cheaper than four [[pairing]]
    * calls for the Groth16 predicate. */
  def pairingProduct(pairs: Seq[(G1, G2)]): Fp12 = {
    val live = pairs.filterNot { case (p, q) => p.isInfinity || q.isInfinity }
    if (live.isEmpty) Fp12.one
    else finalExp(live.map { case (p, q) => miller(p, q) }
      .reduce(_ * _))
  }

  // ---------------------------------------------------------------------
  // Groth16.
  // ---------------------------------------------------------------------

  /** Groth16 verifying key over BN254 — the snarkjs
    * `verification_key.json` surface (alpha/beta/gamma/delta + IC). */
  final case class VerifyingKey(
      alpha: G1, beta: G2, gamma: G2, delta: G2, ic: IndexedSeq[G1])

  /** A Groth16 proof (snarkjs pi_a/pi_b/pi_c). */
  final case class Proof(a: G1, b: G2, c: G1)

  /** The Groth16 acceptance predicate
    * e(A,B) = e(α,β)·e(Σ xᵢICᵢ, γ)·e(C,δ), checked in product form
    * e(−A,B)·e(α,β)·e(X,γ)·e(C,δ) = 1 with one shared final
    * exponentiation. Returns false (never throws) on malformed
    * points — off-curve, off-subgroup G2, or out-of-range public
    * inputs — matching the reference gate's "return { valid: false }"
    * error contract (shadow-id-gate.ts:126-137). */
  def groth16Verify(vk: VerifyingKey, proof: Proof,
      publicInputs: Seq[BigInt]): Boolean =
    vkValid(vk) && groth16VerifyTrustedVk(vk, proof, publicInputs)

  /** The constant-per-table half of the verification: canonical form,
    * curve membership and (expensive — a full 254-bit scalar mult per
    * point) G2 subgroup checks over alpha/beta/gamma/delta/IC. Validate
    * ONCE per verifying key and use [[groth16VerifyTrustedVk]] per row —
    * re-running three constant G2 subgroup checks per proof roughly
    * quadruples the per-row pairing budget for nothing. */
  def vkValid(vk: VerifyingKey): Boolean =
    (vk.alpha +: vk.ic).forall(p => p.canonical && p.onCurve) &&
      Seq(vk.beta, vk.gamma, vk.delta).forall(q => q.canonical && q.inSubgroup)

  /** Per-row half: validates ONLY the proof (and public-input range) and
    * assumes the verifying key already passed [[vkValid]]. Canonicality
    * is checked before any group arithmetic — a congruent-but-unreduced
    * coordinate would otherwise throw from a zero slope inversion
    * instead of returning false (see [[G1.canonical]]). */
  def groth16VerifyTrustedVk(vk: VerifyingKey, proof: Proof,
      publicInputs: Seq[BigInt]): Boolean = {
    if (publicInputs.length != vk.ic.length - 1) return false
    if (publicInputs.exists(x => x.signum < 0 || x >= R)) return false
    val g1ok = Seq(proof.a, proof.c).forall(p => p.canonical && p.onCurve)
    val g2ok = proof.b.canonical && proof.b.inSubgroup
    if (!g1ok || !g2ok) return false
    // proof points must not be degenerate: an infinity A or B pairs to
    // 1 and would let a zeroed proof satisfy a zeroed equation
    if (proof.a.isInfinity || proof.b.isInfinity) return false
    val vkx = publicInputs.zip(vk.ic.drop(1))
      .foldLeft(vk.ic.head) { case (acc, (x, p)) => acc + p * x }
    pairingProduct(Seq(
      (-proof.a, proof.b),
      (vk.alpha, vk.beta),
      (vkx, vk.gamma),
      (proof.c, vk.delta))) == Fp12.one
  }

  // ---------------------------------------------------------------------
  // The reference's proof byte layout (reputation-prover-impl.ts:171-186).
  // ---------------------------------------------------------------------

  private def be32(x: BigInt): Array[Byte] = {
    // signum guard: a negative BigInt's two's-complement toByteArray
    // starts with 0xFF bytes that dropWhile(_ == 0) keeps, so e.g. -1
    // would encode identically to 255 instead of failing loudly
    require(x.signum >= 0, s"field element must be non-negative, got sign ${x.signum}")
    val raw = x.toByteArray.dropWhile(_ == 0)
    require(raw.length <= 32, "field element exceeds 32 bytes")
    Array.fill[Byte](32 - raw.length)(0) ++ raw
  }
  private def rd32(bytes: Array[Byte], off: Int): BigInt =
    BigInt(1, java.util.Arrays.copyOfRange(bytes, off, off + 32))

  /** Encode a proof exactly as the reference's on-chain submission path
    * does (reputation-prover-impl.ts:171-186): proof_a = x ‖ (q − y)
    * (A pre-negated so the verifier can feed the product equation
    * directly), proof_b = x.im ‖ x.re ‖ y.im ‖ y.re (snarkjs pi_b
    * imaginary-first), proof_c = x ‖ y; 256 bytes total. */
  def encodeProofBytes(proof: Proof): Array[Byte] = {
    require(!proof.a.isInfinity && !proof.b.isInfinity && !proof.c.isInfinity,
      "cannot encode an infinity proof point in the reference layout")
    be32(proof.a.x) ++ be32(fq(-proof.a.y)) ++
      be32(proof.b.x.b) ++ be32(proof.b.x.a) ++
      be32(proof.b.y.b) ++ be32(proof.b.y.a) ++
      be32(proof.c.x) ++ be32(proof.c.y)
  }

  /** Decode the 256-byte layout back to a [[Proof]] (undoing the A
    * pre-negation). Returns None on wrong length or non-canonical
    * (≥ q) coordinates rather than throwing — feed of adversarial
    * bytes is the normal case for a verifier. */
  def decodeProofBytes(bytes: Array[Byte]): Option[Proof] = {
    if (bytes == null || bytes.length != 256) return None
    val coords = (0 until 8).map(i => rd32(bytes, i * 32))
    if (coords.exists(_ >= Q)) return None
    Some(Proof(
      -G1(coords(0), coords(1)),
      G2(Fp2(coords(3), coords(2)), Fp2(coords(5), coords(4))),
      G1(coords(6), coords(7))))
  }

  /** Big-endian 64-byte G1 encoding; infinity is all zeros (the
    * precompile/syscall convention). */
  def encodeG1(p: G1): Array[Byte] = be32(p.x) ++ be32(p.y)

  /** Big-endian 128-byte G2 encoding, IMAGINARY-FIRST per coordinate —
    * the groth16-solana / EIP-197 convention the reference's proof_b
    * slices already use (prover.ts:587-591). */
  def encodeG2(q: G2): Array[Byte] =
    be32(q.x.b) ++ be32(q.x.a) ++ be32(q.y.b) ++ be32(q.y.a)

  /** The Groth16 check as a pairing-syscall input blob: 4 × 192-byte
    * (G1 ‖ G2) pairs in groth16-solana's documented order
    * e(−A,B)·e(C,δ)·e(X,γ)·e(α,β) = 1 (prover.ts:567-568 — the
    * reference's on-chain verification path; A arrives pre-negated in
    * its proof bytes for exactly this construction). The same 768
    * bytes are a valid EIP-197 `ecPairing` precompile input (identical
    * point encoding; the product is commutative so pair order is
    * immaterial there), which is what makes this blob an OFFLINE-MINTED
    * cross-engine test vector: any independent BN254 implementation
    * must pairing-check it to 1 — see VECTORS.md.
    *
    * Throws on malformed inputs (unlike [[groth16Verify]]'s
    * false-not-throw): this is the SUBMISSION side — encoding a proof
    * that cannot verify is a caller bug to surface, not a verdict. */
  def encodePairingCheck(vk: VerifyingKey, proof: Proof,
      publicInputs: Seq[BigInt]): Array[Byte] = {
    require(publicInputs.length == vk.ic.length - 1,
      s"public input arity ${publicInputs.length} != ${vk.ic.length - 1}")
    require(publicInputs.forall(x => x.signum >= 0 && x < R),
      "public input out of field range")
    val vkx = publicInputs.zip(vk.ic.drop(1))
      .foldLeft(vk.ic.head) { case (acc, (x, p)) => acc + p * x }
    Seq(
      (-proof.a, proof.b),
      (proof.c, vk.delta),
      (vkx, vk.gamma),
      (vk.alpha, vk.beta))
      .flatMap { case (p, q) => encodeG1(p) ++ encodeG2(q) }.toArray
  }
}
