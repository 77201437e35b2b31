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

  /** Reference semantics (merkle.ts:84-110): fold one level at a time;
    * an odd tail pairs with the current level's zero hash. */
  def rootLocal(leaves: Seq[BigInt], depth: Int): BigInt = {
    val z = zeroHashes(depth)
    if (leaves.isEmpty) return z(depth)
    var level = leaves.toVector
    var d = 0
    while (d < depth) {
      level = (0 until (level.size + 1) / 2).map { i =>
        val left = level(2 * i)
        val right = if (2 * i + 1 < level.size) level(2 * i + 1) else z(d)
        Poseidon.hash2(left, right)
      }.toVector
      d += 1
    }
    level(0)
  }

  /** Subtree root of a block of consecutive leaves starting at an
    * index-aligned boundary, folded up `height` levels with zero-padding
    * — identical math to [[rootLocal]] restricted to the block. */
  private def blockRoot(leaves: Seq[BigInt], height: Int, z: Array[BigInt]): BigInt = {
    var level = leaves.toVector
    var d = 0
    while (d < height) {
      level = (0 until (level.size + 1) / 2).map { i =>
        val left = level(2 * i)
        val right = if (2 * i + 1 < level.size) level(2 * i + 1) else z(d)
        Poseidon.hash2(left, right)
      }.toVector
      d += 1
    }
    if (level.isEmpty) z(height) else level(0)
  }

  /** Distributed root over a DataFrame of (leaf_index: long, leaf:
    * decimal/string-encoded BigInt as 32-byte binary). Blocks are
    * index-aligned (index div 2^blockDepth), so each block's subtree root
    * is position-exact; block roots then fold locally on the driver —
    * at depth 20 / blockDepth 10 that is ≤ 1024 roots, trivially small. */
  def rootDistributed(
      spark: SparkSession,
      leaves: DataFrame, // columns: leaf_index Long, leaf Binary (32B BE)
      depth: Int,
      blockDepth: Int = 10): BigInt = {
    require(depth > blockDepth, "depth must exceed blockDepth")
    val z = zeroHashes(depth)
    import spark.implicits._
    val blockRoots: Seq[(Long, Array[Byte])] = leaves
      .select(expr(s"leaf_index div ${1L << blockDepth}").as("block"),
        col("leaf_index"), col("leaf"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (block, rows) =>
        val sorted = rows.toSeq.sortBy(_._2).map(r => Poseidon.fromBytes32(r._3))
        (block, Poseidon.toBytes32(blockRoot(sorted, blockDepth, zeroHashes(blockDepth))))
      }
      .collect().toSeq
    // driver-side fold of block roots (positions are block indices)
    val byBlock = blockRoots.map { case (b, r) => b -> Poseidon.fromBytes32(r) }.toMap
    val maxBlock = if (byBlock.isEmpty) -1L else byBlock.keys.max
    val tops = (0L to maxBlock).map(b => byBlock.getOrElse(b, z(blockDepth)))
    var level = tops.toVector
    var d = blockDepth
    while (d < depth) {
      level = (0 until (level.size + 1) / 2).map { i =>
        val left = level(2 * i)
        val right = if (2 * i + 1 < level.size) level(2 * i + 1) else z(d)
        Poseidon.hash2(left, right)
      }.toVector
      d += 1
    }
    if (level.isEmpty) z(depth) else level(0)
  }

  /** One fold step: pair up a level (odd tail pairs with `zd`). */
  private def nextLevel(level: Vector[BigInt], zd: BigInt): Vector[BigInt] =
    (0 until (level.size + 1) / 2).map { i =>
      val left = level(2 * i)
      val right = if (2 * i + 1 < level.size) level(2 * i + 1) else zd
      Poseidon.hash2(left, right)
    }.toVector

  /** Walks `nLevels` up from `level0`, zero-hash index offset by `zOff`;
    * when `idx0 ≥ 0`, also records the target's sibling + path bit per
    * level. Returns (siblings, bits, subtree root). The single copy of
    * the level-walk semantics behind [[proof]] and [[proofDistributed]]. */
  private def walkUp(level0: Vector[BigInt], idx0: Int, nLevels: Int,
      z: Array[BigInt], zOff: Int): (Seq[BigInt], Seq[Int], BigInt) = {
    val sibs = Seq.newBuilder[BigInt]
    val bits = Seq.newBuilder[Int]
    var level = level0
    var idx = idx0
    var d = 0
    while (d < nLevels) {
      if (idx >= 0) {
        val isRight = idx % 2 == 1
        bits += (if (isRight) 1 else 0)
        val sibIdx = if (isRight) idx - 1 else idx + 1
        sibs += (if (sibIdx < level.size) level(sibIdx) else z(zOff + d))
        idx /= 2
      }
      level = nextLevel(level, z(zOff + d))
      d += 1
    }
    (sibs.result(), bits.result(),
      if (level.isEmpty) z(zOff + nLevels) else level(0))
  }

  /** Proof path for the leaf at `index` (merkle.ts:126-166): sibling per
    * level (zero-hash when absent) + path bit (1 = current is right). */
  def proof(leaves: Seq[BigInt], index: Int, depth: Int): (Seq[BigInt], Seq[Int]) = {
    require(index >= 0 && index < leaves.size, "invalid leaf index")
    val (sibs, bits, _) = walkUp(leaves.toVector, index, depth, zeroHashes(depth), 0)
    (sibs, bits)
  }

  /** Folds `nLevels` up from `level0` keeping EVERY level — the bounded
    * pyramid sibling lookups read from, instead of re-folding per target. */
  private def pyramid(level0: Vector[BigInt], nLevels: Int,
      z: Array[BigInt], zOff: Int): Vector[Vector[BigInt]] =
    Iterator.iterate((level0, zOff)) { case (lv, d) =>
      (nextLevel(lv, z(d)), d + 1)
    }.take(nLevels + 1).map(_._1).toVector

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
    require(depth > blockDepth, "depth must exceed blockDepth")
    val z = zeroHashes(depth)
    val blockSize = 1L << blockDepth
    val targetsByBlock: Map[Long, Seq[Long]] =
      targets.filter(_ >= 0).groupBy(_ / blockSize)
    import spark.implicits._
    // one distributed pass: per block, subtree root + local target paths
    val perBlock: Seq[(Long, Array[Byte], Seq[(Long, Seq[Array[Byte]], Seq[Int])])] =
      leaves
        .select(expr(s"leaf_index div $blockSize").as("block"),
          col("leaf_index"), col("leaf"))
        .as[(Long, Long, Array[Byte])]
        .groupByKey(_._1)
        .mapGroups { (block, rows) =>
          val zb = zeroHashes(blockDepth)
          val vec = rows.toSeq.sortBy(_._2).map(r => Poseidon.fromBytes32(r._3)).toVector
          val levels = pyramid(vec, blockDepth, zb, 0)
          val base = block * blockSize
          val local = targetsByBlock.getOrElse(block, Seq.empty).flatMap { t =>
            val li = (t - base).toInt
            if (li >= vec.size) Seq.empty
            else {
              val (sibs, bits) = pathFromPyramid(levels, li, blockDepth, zb, 0)
              Seq((t, sibs.map(Poseidon.toBytes32), bits))
            }
          }
          val broot = levels.last.headOption.getOrElse(zb(blockDepth))
          (block, Poseidon.toBytes32(broot), local)
        }
        .collect().toSeq // bounded: ≤ 2^(depth-blockDepth) rows
    val byBlock = perBlock.map { case (b, r, _) => b -> Poseidon.fromBytes32(r) }.toMap
    val maxBlock = if (byBlock.isEmpty) -1L else byBlock.keys.max
    val tops = (0L to maxBlock).map(b => byBlock.getOrElse(b, z(blockDepth))).toVector
    val levels = pyramid(tops, depth - blockDepth, z, blockDepth)
    val root = levels.last.headOption.getOrElse(z(depth))
    val localProofs = perBlock.flatMap(_._3).map { case (t, sibs, bits) =>
      t -> ((sibs.map(Poseidon.fromBytes32), bits))
    }.toMap
    val proofs = localProofs.map { case (t, (ls, lb)) =>
      val (us, ub) = pathFromPyramid(
        levels, (t >> blockDepth).toInt, depth - blockDepth, z, blockDepth)
      t -> ((ls ++ us, lb ++ ub))
    }
    (root, proofs)
  }

  /** Proof verification (merkle.ts:171-195): recompute the root from the
    * leaf along the path. */
  def verify(leaf: BigInt, proofSibs: Seq[BigInt], pathBits: Seq[Int], root: BigInt): Boolean = {
    var h = leaf
    proofSibs.zip(pathBits).foreach { case (sib, bit) =>
      h = if (bit == 1) Poseidon.hash2(sib, h) else Poseidon.hash2(h, sib)
    }
    h == root
  }
}
