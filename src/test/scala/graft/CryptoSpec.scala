package graft

import graft.functions.{Merkle, Poseidon}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural/algebraic pins for the crypto kernels (the offline stand-in
  * for circomlib vector cross-checks — see Poseidon scaladoc). */
class CryptoSpec extends SparkSpec {

  import spark.implicits._

  test("hash2LongsBytes == toBytes32(hash2(unsigned)) on random and negative longs") {
    // the nullifier UDF's hot path builds field limbs straight from the
    // two longs (no BigInt boundary) — the docstring promises
    // bit-identity with the general path under the UNSIGNED reading;
    // this is the pin (r18 review: the swap shipped without one, and
    // crypto_nullifier_dedup has no oracle to catch a limb/byte slip)
    def unsigned(x: Long) = (BigInt(x >>> 1) << 1) | BigInt(x & 1L)
    val rnd = new scala.util.Random(18)
    val edges = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue, -42L)
    for (a <- edges ++ Seq.fill(20)(rnd.nextLong());
         b <- edges.take(3) ++ Seq(rnd.nextLong())) {
      val fast = Poseidon.hash2LongsBytes(a, b)
      val slow = Poseidon.toBytes32(Poseidon.hash2(unsigned(a), unsigned(b)))
      assert(java.util.Arrays.equals(fast, slow),
        s"hash2LongsBytes($a, $b) diverges from the general path")
    }
  }

  test("poseidon hash2 is deterministic, field-closed, and input-sensitive") {
    val a = Poseidon.hash2(BigInt(1), BigInt(2))
    assert(a === Poseidon.hash2(BigInt(1), BigInt(2)))
    assert(a >= 0 && a < Poseidon.P)
    assert(a !== Poseidon.hash2(BigInt(2), BigInt(1))) // order matters
    assert(a !== Poseidon.hash2(BigInt(1), BigInt(3)))
    // inputs reduced mod P (merkle.ts:25 semantics)
    assert(Poseidon.hash2(Poseidon.P + 1, BigInt(2)) === Poseidon.hash2(BigInt(1), BigInt(2)))
  }

  test("poseidon digests match the recorded VECTORS.md values") {
    // pins the concrete parameterization (Grain LFSR + Cauchy MDS) against
    // accidental drift; VECTORS.md holds the same values for a future
    // online circomlibjs diff
    assert(Poseidon.hash2(BigInt(0), BigInt(0)) === BigInt(
      "91336413168087014636938515040233027948880448107810542058232819693275462048"))
    assert(Poseidon.hash2(BigInt(1), BigInt(2)) === BigInt(
      "7728388660803876315274329558048457297166584094878507719377824818806544777941"))
    assert(Poseidon.hash2(BigInt(7), BigInt(11)) === BigInt(
      "20159313765590927531459497752013274633458440882975817383691726478893622564404"))
    assert(Poseidon.hash2(Poseidon.P - 1, BigInt(1)) === BigInt(
      "15822823203375570649108699776334145046368829096992387996899872350118820933236"))
    assert(Poseidon.hash3(BigInt(1), BigInt(2), BigInt(3)) === BigInt(
      "4284531223070934602678079588575524480716037323063415455389449394059443537071"))
    assert(Poseidon.toBytes32(Poseidon.hash2(BigInt(1), BigInt(2)))
      .map("%02x".format(_)).mkString ===
      "11161ceb8e399d1f1e9bf6b4fef913e08d9ffeb15aca9226f7e3aed870cdc2d5")
  }

  test("bytes32 round-trip is exact") {
    val vals = Seq(BigInt(0), BigInt(1), Poseidon.P - 1, BigInt("123456789012345678901234567890"))
    vals.foreach { v =>
      assert(Poseidon.fromBytes32(Poseidon.toBytes32(v)) === v)
      assert(Poseidon.toBytes32(v).length === 32)
    }
  }

  test("empty-tree root equals the depth-level zero hash") {
    val z = Merkle.zeroHashes(20)
    assert(Merkle.rootLocal(Nil, 20) === z(20))
    // zero chain is the reference recurrence (merkle.ts:68-79)
    assert(z(1) === Poseidon.hash2(BigInt(0), BigInt(0)))
    assert(z(2) === Poseidon.hash2(z(1), z(1)))
  }

  test("singleton tree folds against zero siblings (agent_identity.test.js:47)") {
    val leaf = BigInt(42)
    val z = Merkle.zeroHashes(4)
    var h = leaf
    (0 until 4).foreach(d => h = Poseidon.hash2(h, z(d)))
    assert(Merkle.rootLocal(Seq(leaf), 4) === h)
  }

  test("distributed block-aligned root equals the local reference root") {
    val rng = new scala.util.Random(7L)
    for (n <- Seq(1, 5, 64, 200, 1000)) {
      val leaves = Seq.fill(n)(BigInt(250, rng).mod(Poseidon.P))
      val df = leaves.zipWithIndex
        .map { case (l, i) => (i.toLong, Poseidon.toBytes32(l)) }
        .toDF("leaf_index", "leaf")
        .repartition(8) // scattered across tasks: alignment must not depend on layout
      val dist = Merkle.rootDistributed(spark, df, depth = 12, blockDepth = 6)
      assert(dist === Merkle.rootLocal(leaves, 12), s"n=$n")
    }
  }

  test("proof generate/verify round-trips; wrong leaf rejected") {
    val leaves = (1 to 37).map(BigInt(_))
    val root = Merkle.rootLocal(leaves, 8)
    for (idx <- Seq(0, 1, 17, 36)) {
      val (sibs, bits) = Merkle.proof(leaves, idx, 8)
      assert(Merkle.verify(leaves(idx), sibs, bits, root, 8), s"idx=$idx")
      assert(!Merkle.verify(leaves(idx) + 1, sibs, bits, root, 8))
    }
    // shortened-proof forgeries are refused by the depth pin (ADVICE r13
    // functions sweep): the empty proof must not verify the root as its
    // own leaf, and an internal node must not pass with a short path
    assert(!Merkle.verify(root, Nil, Nil, root, 8))
    val (s0, b0) = Merkle.proof(leaves, 0, 8)
    assert(!Merkle.verify(leaves(0), s0.tail, b0.tail, root, 8))
  }

  test("overfull trees and out-of-range leaf indices are refused, not truncated") {
    // rootLocal with > 2^depth leaves used to silently return the root
    // of only the leftmost full subtree; now it refuses like the
    // reference's addLeaf (merkle.ts:118-120) and Incremental.append
    val five = (1 to 5).map(BigInt(_))
    intercept[IllegalArgumentException](Merkle.rootLocal(five, 2))
    intercept[IllegalArgumentException](Merkle.proof(five, 0, 2))
    // 2^3 fits — pinned against an independent form (explicit zero
    // leaves ≡ zero-padding), not a tautological self-compare
    assert(Merkle.rootLocal(five, 3) ===
      Merkle.rootLocal(five ++ Seq.fill(3)(BigInt(0)), 3))
    // distributed path: a corrupt huge/negative leaf_index must fail the
    // job loudly — the huge one would otherwise size a driver Vector by
    // the index (OOM); the negative one would displace leaf 0 silently
    import spark.implicits._
    for (badIdx <- Seq(1L << 40, -3L)) {
      val df = (Seq((0L, Poseidon.toBytes32(BigInt(7)))) :+
        (badIdx, Poseidon.toBytes32(BigInt(9))))
        .toDF("leaf_index", "leaf")
      val e = intercept[Exception](
        Merkle.rootDistributed(spark, df, depth = 12, blockDepth = 6))
      def all(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: all(t.getCause)
      assert(all(e).exists(_.getMessage != null) &&
        all(e).flatMap(t => Option(t.getMessage)).mkString
          .contains("leaf_index"), s"badIdx=$badIdx: $e")
    }
    // non-left-filled leaf sets must fail LOUDLY too (r13 sweep): block
    // positions come from sort order, so a gap would silently shift
    // every later leaf one slot left and hash a different tree.
    // Three shapes: in-block gap, missing middle block, partial
    // non-final block (blockDepth 2 → blockSize 4).
    def tree(idxs: Long*) = idxs.map(i => (i, Poseidon.toBytes32(BigInt(i + 1))))
      .toDF("leaf_index", "leaf")
    for ((bad, tag) <- Seq(
        (tree(0L, 2L), "gap inside block 0"),
        (tree(0L, 1L, 2L, 3L, 8L), "missing middle block"),
        (tree(0L, 1L, 2L, 4L), "partial non-final block"))) {
      val e = intercept[Exception](
        Merkle.rootDistributed(spark, bad, depth = 12, blockDepth = 2))
      def all(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: all(t.getCause)
      assert(all(e).flatMap(t => Option(t.getMessage)).mkString
        .contains("left-filled"), s"$tag: $e")
    }
    // Incremental refuses the depths whose capacity check is garbage
    intercept[IllegalArgumentException](new Merkle.Incremental(63))
    intercept[IllegalArgumentException](new Merkle.Incremental(64))
    // distributed entry points refuse a negative blockDepth up front —
    // it passes `depth > blockDepth`, then 1L << -1 wraps and the
    // failure would surface as `empty.last` inside an executor stage
    val one = Seq((0L, Poseidon.toBytes32(BigInt(7)))).toDF("leaf_index", "leaf")
    intercept[IllegalArgumentException](
      Merkle.proofDistributed(spark, one, Seq(0L), depth = 12, blockDepth = -1))
  }
  test("depth-20 distributed proof generation: proofs bit-identical to the local path, block-bounded driver fold") {
    import spark.implicits._
    // depth 20 = the reference registry's tree (merkle.ts:5-11); 5000
    // leaves over 5 blocks of 2^10 — the driver-side fold sees only the
    // block tops (≤ 2^(20−10) = 1024 rows), never the leaf set
    val n = 5000
    val leaves = (0 until n).map(i => BigInt(i) * 7919 + 3)
    val df = leaves.zipWithIndex
      .map { case (l, i) => (i.toLong, Poseidon.toBytes32(l)) }
      .toDF("leaf_index", "leaf")
      .repartition(8) // scattered across tasks: alignment must not depend on layout
    val targets = Seq(0L, 1L, 1023L, 1024L, 2049L, 4999L, 60000L) // last: absent leaf
    val (root, proofs) =
      Merkle.proofDistributed(spark, df, targets, depth = 20, blockDepth = 10)
    assert(root === Merkle.rootDistributed(spark, df, depth = 20, blockDepth = 10))
    assert(proofs.keySet === targets.filter(_ < n).toSet) // absent leaf → no proof
    for (t <- targets.filter(_ < n)) {
      val (sibs, bits) = proofs(t)
      assert(Merkle.verify(leaves(t.toInt), sibs, bits, root, 20), s"t=$t")
      val (lSibs, lBits) = Merkle.proof(leaves, t.toInt, 20)
      assert(sibs === lSibs && bits === lBits, s"t=$t distributed != local path")
    }
  }

  test("incremental frontier root equals the level fold after EVERY append") {
    // the write-pattern twin (merkle.ts:116-125): depth-sized state must
    // reproduce the full recompute at every prefix, including the
    // odd-tail-pairs-with-zero-hash boundary each power of two crosses
    val depth = 6
    val inc = new graft.functions.Merkle.Incremental(depth)
    val leaves = (1 to 40).map(i => BigInt(i * 131 + 7))
    assert(inc.root === graft.functions.Merkle.rootLocal(Seq.empty, depth))
    leaves.zipWithIndex.foreach { case (leaf, k) =>
      inc.append(leaf)
      assert(inc.root ===
        graft.functions.Merkle.rootLocal(leaves.take(k + 1), depth),
        s"diverged after ${k + 1} appends")
    }
    // snapshot/restore resumes the identical sequence
    val (n, r, frontier) = inc.snapshot
    assert(n === 40L && frontier.length === depth)
    val resumed = new graft.functions.Merkle.Incremental(depth)
    resumed.restore(n, r, frontier)
    resumed.append(BigInt(4242))
    assert(resumed.root ===
      graft.functions.Merkle.rootLocal(leaves :+ BigInt(4242), depth))
  }

  test("appendBatch equals sequential appends on every split: count, root AND frontier") {
    // the batched fold (r18, ~2k + 2·depth hashes per k-leaf batch) must
    // be state-indistinguishable from k per-leaf appends at every batch
    // boundary — including k=1, odd/even starts, a batch crossing a
    // power-of-two boundary, and the batch that fills the tree exactly
    val depth = 6
    val leaves = (1 to 64).map(i => BigInt(i * 977 + 13))
    val splitsets = Seq(
      Seq(1, 1, 1, 61), Seq(3, 5, 8, 48), Seq(40, 24), Seq(64),
      Seq(7, 1, 9, 2, 45), Seq(31, 1, 32))
    for (splits <- splitsets) {
      assert(splits.sum === 64)
      val seq = new graft.functions.Merkle.Incremental(depth)
      val bat = new graft.functions.Merkle.Incremental(depth)
      var off = 0
      for (k <- splits) {
        val chunk = leaves.slice(off, off + k)
        chunk.foreach(seq.append)
        bat.appendBatch(chunk)
        off += k
        assert(bat.count === seq.count, s"splits=$splits off=$off count")
        assert(bat.root === seq.root, s"splits=$splits off=$off root")
        // LIVE frontier levels only (bit d of count set): dead levels
        // are documented-unspecified state (restore's docstring) — the
        // per-append path eagerly writes partial values there, the batch
        // fold doesn't, and both overwrite before any read
        val live = (0 until depth).filter(d => ((off.toLong >> d) & 1L) == 1L)
        assert(live.map(bat.snapshot._3) === live.map(seq.snapshot._3),
          s"splits=$splits off=$off live frontier")
      }
      // both are now full; both refuse another leaf the same way
      intercept[IllegalArgumentException](bat.appendBatch(IndexedSeq(BigInt(1))))
      intercept[IllegalArgumentException](seq.append(BigInt(1)))
    }
    // empty batch is a no-op even on a full tree
    val full = new graft.functions.Merkle.Incremental(2)
    (1 to 4).foreach(i => full.append(BigInt(i)))
    val r0 = full.root
    full.appendBatch(IndexedSeq.empty)
    assert(full.count === 4L && full.root === r0)
  }

  test("restore rejects torn snapshots: root must be derivable from (count, frontier)") {
    // a torn external store (count from one snapshot, root or frontier
    // from another) must fail at restore, not silently corrupt every
    // subsequent root — validation re-derives the root along the
    // insertion path in `depth` hashes
    val depth = 6
    val inc = new graft.functions.Merkle.Incremental(depth)
    (1 to 13).foreach(i => inc.append(BigInt(i * 977 + 3)))
    val (n, r, frontier) = inc.snapshot
    // consistent triple restores AND lands the state (a `val`, so the
    // post-restore assertions read the restored instance, not a fresh one)
    val ok = new graft.functions.Merkle.Incremental(depth)
    ok.restore(n, r, frontier)
    assert(ok.count === n && ok.root === r, "restore did not land the snapshot state")
    // count-1 is detectable (the dropped leaf is nonzero, so the 12-leaf
    // root differs); count+1 is NOT and must not be asserted — a
    // zero-padded n-leaf tree has the identical root to an (n+1)-leaf
    // tree whose extra leaf is 0, so no validator can bind that boundary
    def fresh = new graft.functions.Merkle.Incremental(depth)
    intercept[IllegalArgumentException] { fresh.restore(n - 1, r, frontier) }
    intercept[IllegalArgumentException] { fresh.restore(n, r + 1, frontier) }
    intercept[IllegalArgumentException] { // frontier level the path READS (bit 0 of 13 set)
      fresh.restore(n, r, frontier.updated(0, frontier(0) + 1))
    }
    intercept[IllegalArgumentException] { fresh.restore(-1, r, frontier) }
    intercept[IllegalArgumentException] { fresh.restore(n, r, frontier.tail) }
    // a failed restore must leave the target untouched, not half-written
    intercept[IllegalArgumentException] { ok.restore(n, r + 1, frontier) }
    assert(ok.count === n && ok.root === r, "rejected restore mutated the tree")
    // empty-tree snapshot round-trips (all-zero frontier, zero-hash root)
    val empty = new graft.functions.Merkle.Incremental(depth)
    val (n0, r0, f0) = empty.snapshot
    val restoredEmpty = new graft.functions.Merkle.Incremental(depth)
    restoredEmpty.restore(n0, r0, f0)
    assert(restoredEmpty.count === 0L && restoredEmpty.root === r0)
  }

  test("crypto_merkle_verify: every proof verifies, every tampered proof rejects") {
    val rows = graft.operators.Crypto.cryptoMerkleVerify.run(spark, sf001).collect()
    assert(rows.length === 64)
    assert(rows.forall(_.getAs[Boolean]("valid")))
    assert(rows.forall(!_.getAs[Boolean]("tampered_valid")))
  }

  test("crypto_groth16_verify: only the untampered class verifies, truncation fails decode") {
    // doc_id % 4: 0 = valid, 1 = flipped proof byte, 2 = wrong public
    // input, 3 = truncated bytes (decode failure). The pairing algebra
    // itself is pinned by BN254Spec; this pins the catalog wiring and
    // the tamper-class outcomes end-to-end through the byte codec.
    val rows = graft.operators.Crypto.cryptoGroth16Verify
      .run(spark, sf001).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val cls = r.getAs[Long]("doc_id") % 4
      assert(r.getAs[Boolean]("decoded") === (cls != 3),
        s"doc ${r.getAs[Long]("doc_id")}: decode outcome")
      assert(r.getAs[Boolean]("valid") === (cls == 0),
        s"doc ${r.getAs[Long]("doc_id")}: verify outcome")
    }
  }

  test("crypto_merkle_root: gapped keys hash the same tree as contiguous ones") {
    // The r15 sf10 sweep caught the query using c_custkey AS the leaf
    // index, which only holds while keys are 0-based contiguous — the
    // synthesized tier's replica-stride keys tripped the left-filled
    // guard. The fix derives the leaf index from the key's DENSE RANK
    // (strataPrefixSum, empty strata), so the defining property is:
    // the root depends only on the leaves in key ORDER, never on the
    // key VALUES. Same names under contiguous 0..n−1 keys and under
    // gapped/strided keys (including one past 2^32) must agree; a
    // permuted name order must not.
    val names = (0 until 300).map(i => s"cust-$i")
    val gapped = names.indices.map(i =>
      7L + i.toLong * 13L + (if (i > 200) 5000000000L else 0L))
    def write(dir: String, keys: Seq[Long], ns: Seq[String]): Unit =
      keys.zip(ns).toDF("c_custkey", "c_name")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    def rootOf(dir: String): (Long, Long, String) = {
      val r = graft.operators.Crypto.cryptoMerkleRoot.run(spark, dir).collect()
      assert(r.length === 1)
      (r(0).getAs[Long]("depth"), r(0).getAs[Long]("n_leaves"),
        r(0).getAs[String]("root_hex"))
    }
    val dContig = tempDir("graft-mr-contig").toString
    val dGapped = tempDir("graft-mr-gapped").toString
    val dPerm = tempDir("graft-mr-perm").toString
    write(dContig, names.indices.map(_.toLong), names)
    write(dGapped, gapped, names)
    // same key set, names rotated by one: order sensitivity
    write(dPerm, gapped, names.tail :+ names.head)
    val contig = rootOf(dContig)
    val gap = rootOf(dGapped)
    assert(contig === gap,
      "dense-rank leaf index: gapped keys must hash the identical tree")
    assert(rootOf(dPerm)._3 !== gap._3,
      "a different leaf order must change the root")
  }

}
