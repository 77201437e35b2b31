package graft

/** Diagnostic micro-benchmark: the per-call cost of the Poseidon hash2
  * units the Merkle folds are built from — used to attribute stage-level
  * task-seconds (r19 verdict #3: is crypto_merkle_root's dominant stage
  * hash CPU or plumbing?). Run: sbt "Test/runMain graft.HashBench". */
object HashBench {
  def main(args: Array[String]): Unit = {
    var h = BigInt(1)
    var i = 0
    while (i < 5000) { h = functions.Poseidon.hash2(h, BigInt(i)); i += 1 }
    val t0 = System.nanoTime
    i = 0
    while (i < 50000) { h = functions.Poseidon.hash2(h, BigInt(i)); i += 1 }
    println(f"[hashbench] ${(System.nanoTime - t0) / 50000.0 / 1000}%.2f us/hash2(BigInt)")
    val b = functions.Poseidon.toBytes32(h)
    val t1 = System.nanoTime
    i = 0
    var acc = 0
    while (i < 50000) {
      val x = functions.Poseidon.fromBytes32(b)
      acc += functions.Poseidon.toBytes32(functions.Poseidon.hash2(x, x)).length
      i += 1
    }
    println(f"[hashbench] ${(System.nanoTime - t1) / 50000.0 / 1000}%.2f us/(from+hash2+to) [$acc]")
  }
}
