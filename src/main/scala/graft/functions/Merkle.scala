package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merkle tree over identity commitments (hive-sdk merkle.ts:51-234):
  * fixed depth, left-filled leaves, odd nodes paired with the level's
  * zero-hash, zeroHashes(0) = 0, zeroHashes(d+1) = H(z_d, z_d).
  *
  * Two implementations with identical roots:
  *  - [[rootLocal]]: the reference algorithm verbatim-in-semantics
  *    (level-by-level), for tests and small trees;
  *  - [[rootDistributed]]: the 100 TB path — leaves are grouped into
  *    index-aligned blocks of 2^blockDepth, each task folds its block
  *    subtree locally (no shuffle beyond the single groupBy), and the
  *    ≤ 2^(depth-blockDepth) block roots fold on the driver. Exactly one
  *    shuffle regardless of depth, state bounded by the block size.
  */
object Merkle {

  /** zeroHashes(d): root of an empty subtree of height d. */
  def zeroHashes(depth: Int): Array[BigInt] = {
    val z = new Array[BigInt](depth + 1)
    z(0) = BigInt(0)
    (1 to depth).foreach(d => z(d) = Poseidon.hash2(z(d - 1), z(d - 1)))
    z
  }

  /** One fold step: pair up a level (odd tail pairs with `zd`). The
    * SINGLE copy of the pairing semantics — every root/proof path below
    * goes through it (via [[pyramid]]), so a change to the zero-hash
    * convention lands in exactly one place. */
  private def nextLevel(level: Vector[BigInt], zd: BigInt): Vector[BigInt] =
    (0 until (level.size + 1) / 2).map { i =>
      val left = level(2 * i)
      val right = if (2 * i + 1 < level.size) level(2 * i + 1) else zd
      Poseidon.hash2(left, right)
    }.toVector

  /** Folds `nLevels` up from `level0` keeping EVERY level — sibling
    * lookups read from the pyramid instead of re-folding per target.
    * `pyramid(...).last` is the (≤ 1-element) top level. */
  private def pyramid(level0: Vector[BigInt], nLevels: Int,
      z: Array[BigInt], zOff: Int): Vector[Vector[BigInt]] =
    Iterator.iterate((level0, zOff)) { case (lv, d) =>
      (nextLevel(lv, z(d)), d + 1)
    }.take(nLevels + 1).map(_._1).toVector

  /** Subtree root: the pyramid top, or the height's zero hash for an
    * empty leaf run. */
  private def foldRoot(level0: Vector[BigInt], nLevels: Int,
      z: Array[BigInt], zOff: Int): BigInt =
    pyramid(level0, nLevels, z, zOff).last.headOption.getOrElse(z(zOff + nLevels))

  /** Reference semantics (merkle.ts:84-110): fold one level at a time;
    * an odd tail pairs with the current level's zero hash. Rejects more
    * than 2^depth leaves the way the reference and [[Incremental.append]]
    * do — folding on would silently return the root of only the leftmost
    * full subtree (the pyramid top would still hold >1 node and
    * `headOption` would drop the rest). */
  def rootLocal(leaves: Seq[BigInt], depth: Int): BigInt = {
    require(depth < 63 && leaves.size <= (1L << depth),
      s"tree is full: ${leaves.size} leaves exceed 2^$depth (merkle.ts:118-120)")
    foldRoot(leaves.toVector, depth, zeroHashes(depth), 0)
  }

  /** Distributed root over a DataFrame of (leaf_index: long, leaf: 32-byte
    * binary): [[proofDistributed]]'s block pipeline with no targets —
    * blocks fold locally (one shuffle), the driver folds only the
    * ≤ 2^(depth−blockDepth) block tops. */
  def rootDistributed(
      spark: SparkSession,
      leaves: DataFrame, // columns: leaf_index Long, leaf Binary (32B BE)
      depth: Int,
      blockDepth: Int = 10): BigInt =
    proofDistributed(spark, leaves, Seq.empty, depth, blockDepth)._1

  /** Proof path for the leaf at `index` (merkle.ts:126-166): sibling per
    * level (zero-hash when absent) + path bit (1 = current is right). */
  def proof(leaves: Seq[BigInt], index: Int, depth: Int): (Seq[BigInt], Seq[Int]) = {
    require(index >= 0 && index < leaves.size, "invalid leaf index")
    require(depth < 63 && leaves.size <= (1L << depth),
      s"tree is full: ${leaves.size} leaves exceed 2^$depth (merkle.ts:118-120)")
    val z = zeroHashes(depth)
    pathFromPyramid(pyramid(leaves.toVector, depth, z, 0), index, depth, z, 0)
  }

  /** Sibling path of `idx0` read from a prebuilt [[pyramid]] — O(nLevels)
    * lookups, no hashing. */
  private def pathFromPyramid(levels: Vector[Vector[BigInt]], idx0: Int,
      nLevels: Int, z: Array[BigInt], zOff: Int): (Seq[BigInt], Seq[Int]) = {
    var idx = idx0
    val path = (0 until nLevels).map { d =>
      val isRight = idx % 2 == 1
      val sibIdx = if (isRight) idx - 1 else idx + 1
      val sib = levels(d).lift(sibIdx).getOrElse(z(zOff + d))
      idx /= 2
      (sib, if (isRight) 1 else 0)
    }
    (path.map(_._1), path.map(_._2))
  }

  /** DISTRIBUTED proof generation (merkle.ts:112-166 at registry scale):
    * proofs for `targets` without ever collecting the leaf set.
    *
    * Level split mirrors [[rootDistributed]]: each index-aligned block of
    * 2^blockDepth leaves folds its subtree ONCE into a level pyramid
    * (~2·blockSize hashes regardless of how many targets it contains) and
    * reads its root plus every local target path from it; the driver then
    * folds only the ≤ 2^(depth−blockDepth) block tops — the same pyramid
    * structure — and completes each target's path with upper-level
    * siblings. At the reference's depth-20 / ~1M-leaf registry
    * (merkle.ts:5-11, blockDepth 10) the driver touches ≤ 1024 block
    * roots, never the leaves. Leaves must be left-filled (contiguous
    * indices from 0), the reference's tree shape; targets without a
    * stored leaf are absent from the result.
    *
    * Returns (root, target → (siblings, path bits)); proofs verify
    * against the returned root via [[verify]], bit-identical to the
    * local [[proof]] path. */
  def proofDistributed(
      spark: SparkSession,
      leaves: DataFrame, // columns: leaf_index Long, leaf Binary (32B BE)
      targets: Seq[Long],
      depth: Int,
      blockDepth: Int = 10): (BigInt, Map[Long, (Seq[BigInt], Seq[Int])]) = {
    // blockDepth >= 0 up front: a negative one passes `depth > blockDepth`,
    // then 1L << -1 wraps (shift mod 64) and the empty pyramid dies with
    // `empty.last` inside a distributed stage — an argument error must
    // fail HERE, loudly, like Incremental's constructor guard
    require(blockDepth >= 0 && depth > blockDepth && depth < 63,
      "0 <= blockDepth < depth < 63 required")
    val z = zeroHashes(depth)
    val blockSize = 1L << blockDepth
    val targetsByBlock: Map[Long, Seq[Long]] =
      targets.filter(_ >= 0).groupBy(_ / blockSize)
    import spark.implicits._
    // hoisted: recomputing the zero-hash table inside mapGroups paid
    // blockDepth Poseidon permutations per BLOCK for an identical
    // table (at the blockDepth-4 cryptoMerkleVerify call that was ~13%
    // of the block's hash work) — plain BigInts, serializes fine
    val zbShared = zeroHashes(blockDepth)
    // one distributed pass: per block, subtree root + local target paths.
    // An EXPLICIT-count hash repartition on the block id + an in-partition
    // (block, index) sort, folded as consecutive runs in mapPartitions —
    // NOT groupByKey/mapGroups (r19 stage dump): the typed groupByKey's
    // exchange gets AQE-coalesced for its shuffle BYTES, blind to the
    // Poseidon fold above it — at sf10 the fold stage ran as 34 tasks
    // (one full wave + a 2-task straggler wave, wall 11.2 s vs maxTask
    // 6.4 s). The explicit count is AQE-coalesce-exempt (the
    // kernelSorted/crypto_commitment rule applied to a hash exchange),
    // and the sorted-run fold also drops the per-block toSeq+sortBy.
    val shufP = math.max(spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)
    val perBlock: Seq[(Long, Long, Array[Byte], Seq[(Long, Seq[Array[Byte]], Seq[Int])])] =
      leaves
        .select(expr(s"leaf_index div $blockSize").as("block"),
          col("leaf_index"), col("leaf"))
        .repartition(shufP, col("block"))
        .sortWithinPartitions(col("block"), col("leaf_index"))
        .as[(Long, Long, Array[Byte])]
        .mapPartitions { it =>
          val zb = zbShared
          val buf = it.buffered
          new Iterator[(Long, Long, Array[Byte], Seq[(Long, Seq[Array[Byte]], Seq[Int])])] {
            def hasNext: Boolean = buf.hasNext
            def next(): (Long, Long, Array[Byte], Seq[(Long, Seq[Array[Byte]], Seq[Int])]) = {
              val block = buf.head._1
              val base = block * blockSize
              val leafBuf = Vector.newBuilder[BigInt]
              var i = 0
              // rows of one block are CONSECUTIVE (hash-partitioned on the
              // block id, sorted by (block, index) within the partition)
              // and already index-ordered, so the left-filled contiguity
              // guard runs inline — it also catches every DUPLICATE index
              // (two equal sorted values cannot both equal base+offset).
              // A gap would silently shift every later leaf one slot left
              // and hash a DIFFERENT tree — loud here like every other
              // malformed input (the silent-truncation class
              // Crypto.scala:82-85 records shipping once). The per-row
              // range guard stays: a negative leaf_index truncates into
              // block 0 under `div` and would displace leaf 0 silently.
              while (buf.hasNext && buf.head._1 == block) {
                val r = buf.next()
                require(r._2 >= 0 && r._2 < (1L << depth),
                  s"leaf_index ${r._2} outside [0, 2^$depth) (merkle.ts:118-120)")
                require(r._2 == base + i,
                  s"leaves not left-filled (or duplicated): block $block expects " +
                    s"contiguous unique indices from $base, found ${r._2} at offset $i")
                leafBuf += Poseidon.fromBytes32(r._3)
                i += 1
              }
              val vec = leafBuf.result()
              val levels = pyramid(vec, blockDepth, zb, 0)
              val local = targetsByBlock.getOrElse(block, Seq.empty).flatMap { t =>
                val li = (t - base).toInt
                if (li >= vec.size) Seq.empty
                else {
                  val (sibs, bits) = pathFromPyramid(levels, li, blockDepth, zb, 0)
                  Seq((t, sibs.map(Poseidon.toBytes32), bits))
                }
              }
              val broot = levels.last.headOption.getOrElse(zb(blockDepth))
              (block, vec.size.toLong, Poseidon.toBytes32(broot), local)
            }
          }
        }
        .collect().toSeq // bounded: ≤ 2^(depth-blockDepth) rows
    val byBlock = perBlock.map { case (b, _, r, _) => b -> Poseidon.fromBytes32(r) }.toMap
    // leaf_index range guard BEFORE the (0 to maxBlock) materialization:
    // one corrupt row with a huge index would otherwise have the driver
    // allocate a Vector sized by that index (OOM, violating the bounded-
    // collect contract above), and a negative index would silently skew
    // the fold toward a wrong root instead of failing like
    // [[Incremental.append]] does.
    val blockCap = 1L << (depth - blockDepth)
    byBlock.keys.foreach(b => require(b >= 0 && b < blockCap,
      s"leaf_index out of range: block $b outside [0, $blockCap) " +
        s"for depth $depth / blockDepth $blockDepth (merkle.ts:118-120)"))
    val maxBlock = if (byBlock.isEmpty) -1L else byBlock.keys.max
    // cross-block left-filled guards, same loud contract as in-block: a
    // MISSING middle block would silently zero-fill below, and a
    // partially-filled non-final block would shift the next block's
    // subtree — both hash a different tree than the reference's
    require(byBlock.size.toLong == maxBlock + 1,
      s"leaves not left-filled: ${maxBlock + 1 - byBlock.size} empty " +
        s"block(s) below block $maxBlock")
    perBlock.foreach { case (b, sz, _, _) =>
      require(b == maxBlock || sz == blockSize,
        s"leaves not left-filled: non-final block $b holds $sz of $blockSize leaves")
    }
    val tops = (0L to maxBlock).map(b => byBlock.getOrElse(b, z(blockDepth))).toVector
    val levels = pyramid(tops, depth - blockDepth, z, blockDepth)
    val root = levels.last.headOption.getOrElse(z(depth))
    val localProofs = perBlock.flatMap(_._4).map { case (t, sibs, bits) =>
      t -> ((sibs.map(Poseidon.fromBytes32), bits))
    }.toMap
    val proofs = localProofs.map { case (t, (ls, lb)) =>
      val (us, ub) = pathFromPyramid(
        levels, (t >> blockDepth).toInt, depth - blockDepth, z, blockDepth)
      t -> ((ls ++ us, lb ++ ub))
    }
    (root, proofs)
  }

  /** Incremental append frontier — the reference's actual WRITE pattern
    * (one commitment appended per transaction, `merkle.ts:116-125`
    * `addLeaf` + `getRoot:84-110`) maintained with DEPTH-SIZED state
    * instead of refolding the leaf set: `filled(d)` holds the hash of the
    * last complete left subtree at level d along the current insertion
    * path (the classic on-chain incremental-tree state). `append` is
    * O(depth) hashes, and after every append `root` is bit-identical to
    * [[rootLocal]]/[[rootDistributed]] over the leaf prefix (CryptoSpec
    * pins the per-append agreement, StreamingSpec the per-batch agreement
    * at the reference's depth 20). `snapshot`/`restore` expose the
    * (count, root, frontier) triple so a foreachBatch maintainer can
    * persist its state and resume exactly after a restart. All methods
    * synchronize on the instance: the stream's micro-batch thread
    * appends while the caller's thread reads root/snapshot, and an
    * unsynchronized read could tear (cur updated for leaf k+1 while n
    * is still k) — a torn snapshot persisted for restart would silently
    * diverge every subsequent root. */
  final class Incremental(val depth: Int) {
    // same bound every sibling entry point enforces: at depth 63,
    // 1L << 63 is Long.MinValue and the capacity check in append/restore
    // compares against garbage (an empty tree reports "full")
    require(depth >= 0 && depth < 63, s"depth $depth must be in [0, 63)")
    private val z = zeroHashes(depth)
    private val filled = Array.fill[BigInt](depth)(BigInt(0))
    private var n = 0L
    private var cur: BigInt = z(depth)
    def count: Long = synchronized(n)
    def root: BigInt = synchronized(cur)
    def append(leaf: BigInt): Unit = synchronized {
      require(n < (1L << depth), "tree is full (merkle.ts:118-120)")
      var h = leaf
      var idx = n
      var d = 0
      while (d < depth) {
        if ((idx & 1L) == 0L) { filled(d) = h; h = Poseidon.hash2(h, z(d)) }
        else h = Poseidon.hash2(filled(d), h)
        idx >>= 1
        d += 1
      }
      cur = h
      n += 1
    }
    /** Appends `leaves` (in order) with the BATCHED fold: a k-leaf batch
      * costs ~2k + 2·depth hashes instead of [[append]]'s k·depth —
      * contiguous appends share every interior-node recomputation, so
      * only the ~k/2^d nodes a batch actually changes at level d are
      * hashed, plus one depth-long fold for the final root. Final
      * (count, frontier, root) are BIT-IDENTICAL to k sequential
      * [[append]] calls (CryptoSpec pins equality on random batch
      * splits); only the intermediate roots between the k appends are
      * never materialized — which is exactly the streaming maintainer's
      * contract (the root is read per micro-batch, merkle.ts:116-125).
      *
      * Level-d bookkeeping: the batch's new node values span indices
      * [n>>d, (n+k−1)>>d]; a left-boundary pair whose left child
      * predates the batch reads it from the (pre-update) frontier, a
      * right-boundary pair missing its right child pairs with the zero
      * subtree; the new frontier at level d is the value of node
      * ((n+k)>>d)−1 when (n+k)>>d is odd and that node is batch-touched
      * (untouched ⇒ the stored frontier is already it). The final root
      * folds the empty slot at the new count up the frontier — the same
      * derivation [[restore]] validates against — or, on a now-full
      * tree, is the single level-`depth` node the fold produced. */
    def appendBatch(leaves: IndexedSeq[BigInt]): Unit = synchronized {
      if (leaves.nonEmpty) {
        require(n <= (1L << depth) - leaves.length, "tree is full (merkle.ts:118-120)")
        val nPrime = n + leaves.length
        var lvl: IndexedSeq[BigInt] = leaves
        var a = n
        var d = 0
        while (d < depth) {
          val b = a + lvl.length - 1
          val a2 = a >> 1
          val b2 = b >> 1
          val next = new Array[BigInt]((b2 - a2 + 1).toInt)
          // li < a only at the first pair with a odd — the completed
          // left sibling the per-append path stored in the frontier
          // (read BEFORE this level's frontier update below)
          def pair(i: Long): BigInt = {
            val li = 2 * i
            val ri = li + 1
            val lv = if (li < a) filled(d) else lvl((li - a).toInt)
            val rv = if (ri > b) z(d) else lvl((ri - a).toInt)
            Poseidon.hash2(lv, rv)
          }
          if (next.length >= 64) {
            // wide levels hash in parallel: each slot is an independent
            // pure hash over immutable inputs — the maintainer stays
            // driver-SIDE (no cluster work) but uses local cores, which
            // is what makes a 1M-leaf replay minutes, not hours
            java.util.stream.IntStream.range(0, next.length).parallel()
              .forEach(k => next(k) = pair(a2 + k))
          } else {
            var i = a2
            while (i <= b2) { next((i - a2).toInt) = pair(i); i += 1 }
          }
          val m = nPrime >> d
          if ((m & 1L) == 1L && m - 1 >= a) filled(d) = lvl((m - 1 - a).toInt)
          lvl = scala.collection.immutable.ArraySeq.unsafeWrapArray(next)
          a = a2
          d += 1
        }
        n = nPrime
        // lvl is now the single changed node at level `depth` — but the
        // tree is zero-padded PAST the count, and that node already
        // folded the padding in (rv = z(d) at every right boundary), so
        // it IS the root
        cur = lvl(0)
      }
    }

    def snapshot: (Long, BigInt, Seq[BigInt]) = synchronized((n, cur, filled.toSeq))

    /** Restores a [[snapshot]] triple — after VALIDATING it: the root is
      * fully derivable from (count, frontier) along the insertion path
      * (the empty slot at `count` folds up pairing with `frontier(d)`
      * where bit d of count is 1 and the zero hash where it is 0), so a
      * torn external store — count from one snapshot, root or frontier
      * from another — is rejected here with `depth` hashes instead of
      * silently corrupting every subsequent root. Only the frontier
      * levels the insertion path actually reads are validatable (levels
      * with bit 0 are dead state until later appends overwrite them),
      * which is exactly the set later roots depend on. One inherent
      * blind spot: count+1 with a zero boundary leaf is indistinguishable
      * from count (zero-padding means an absent leaf and a 0-valued leaf
      * commit identically), so a count overstated by trailing zero
      * leaves passes — real commitment streams never carry leaf 0, so
      * the case is theoretical. A FULL tree's
      * snapshot is the one unvalidatable boundary (the final append's
      * fold path is never written back to the frontier) — accepted as
      * supplied; such a tree takes no further appends, so a bad triple
      * can at most misreport the static root, never corrupt a future
      * one. */
    def restore(count: Long, root: BigInt, frontier: Seq[BigInt]): Unit = synchronized {
      require(frontier.length == depth, s"frontier must carry $depth levels")
      require(count >= 0 && count <= (1L << depth), s"count $count out of range")
      if (count < (1L << depth)) {
        var h = z(0) // the next slot (index `count`) is an empty subtree
        var idx = count
        var d = 0
        while (d < depth) {
          h = if ((idx & 1L) == 1L) Poseidon.hash2(frontier(d), h)
              else Poseidon.hash2(h, z(d))
          idx >>= 1
          d += 1
        }
        require(h == root,
          "inconsistent snapshot: root is not derivable from (count, frontier) " +
            "— torn or mismatched external state")
      }
      n = count
      cur = root
      frontier.copyToArray(filled)
    }
  }

  /** Proof verification (merkle.ts:171-195): recompute the root from the
    * leaf along the path. The proof length is PINNED to the tree depth
    * and a short/mismatched proof returns false rather than throwing —
    * adversarial proofs are a verifier's normal input. Without the pin,
    * `zip` silently truncates to the shorter list: the empty proof
    * "verifies" the root as its own leaf, and any known internal node at
    * height h forges membership with a (depth−h)-length path — the
    * classic shortened-proof attack on fixed-depth trees (the reference
    * always verifies full-depth paths, merkle.ts:171-195). */
  def verify(leaf: BigInt, proofSibs: Seq[BigInt], pathBits: Seq[Int],
      root: BigInt, depth: Int): Boolean =
    proofSibs.length == depth && pathBits.length == depth && {
      var h = leaf
      proofSibs.zip(pathBits).foreach { case (sib, bit) =>
        h = if (bit == 1) Poseidon.hash2(sib, h) else Poseidon.hash2(h, sib)
      }
      h == root
    }
}
