package graft

/** Decade measurement for the INCREMENTAL minhash probe — the artifact
  * behind `dd_minhash_incr`'s O(increment) claim (SURVEY §6.3): build the
  * band index per tier, then probe a FIXED-size increment against each.
  * Build must scale with the corpus; probe must stay ~flat (it reads the
  * increment slice plus pruned index partitions, never the corpus).
  *
  * Usage:
  * {{{
  * sbt "runMain graft.TimeIncr /root/testdata/sf0.1 /tmp/graft-sf1"
  * }}}
  *
  * The increment is the FIRST tier's natural 20% id slice; the SAME id
  * count is carved off the top of every later tier's id range, so the
  * probe's input is constant while the indexed corpus grows 10× — the
  * steady-state ingest shape (a day's crawl against a year's corpus).
  * Protocol matches [[TimeQueries]] §6.2: three INTERLEAVED passes per
  * (stage, tier) with min, so one bad host window cannot poison a pair;
  * memoized feature frames are dropped before every sample; probes
  * materialize through the noop sink. Each pass builds into a fresh
  * staging dir (full cold ingest cost) and probes against that build;
  * per-pass times go to stderr, one `INCR` line per tier plus a `RATIO`
  * line to stdout. */
object TimeIncr {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeIncr <dir> [dir2 ...]")
    val dirs = args.toSeq
    val spark = Engine.session(appName = "graft-time-incr")
    import org.apache.spark.sql.functions.{col, max}
    def maxId(dir: String): Long = {
      val r = Tables(spark, dir).documents.agg(max(col("doc_id"))).head()
      require(!r.isNullAt(0), s"empty documents corpus at $dir"); r.getLong(0)
    }
    val incrSpan = { val m = maxId(dirs.head); m / 5 } // tier-0's natural slice
    val tiers = dirs.map { dir =>
      val m = maxId(dir)
      val split = m - incrSpan
      val rows = Tables(spark, dir).documents
        .filter(col("doc_id") >= split).count()
      val corpus = Tables(spark, dir).documents
        .filter(col("doc_id") < split).count()
      (dir, split, rows, corpus)
    }
    val samples = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    for (pass <- 0 until 3; (dir, split, _, _) <- tiers) {
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-incr-idx").toString
      operators.Similarity.clearFeatureCache()
      val b0 = System.nanoTime()
      operators.Similarity.writeMinhashIndex(spark, dir, idx, split)
      val bSec = (System.nanoTime() - b0) / 1e9
      operators.Similarity.clearFeatureCache()
      val p0 = System.nanoTime()
      operators.Similarity.probeMinhashIndex(spark, dir, idx, split)
        .write.format("noop").mode("overwrite").save()
      val pSec = (System.nanoTime() - p0) / 1e9
      samples(("build", dir)) = bSec :: samples(("build", dir))
      samples(("probe", dir)) = pSec :: samples(("probe", dir))
      System.err.println(f"[incr] pass $pass $dir build=$bSec%.2f s probe=$pSec%.2f s")
      // each pass pays the full cold ingest; drop the index so tier-scale
      // builds don't accumulate in tmp
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    }
    for ((dir, split, rows, corpus) <- tiers) {
      val b = samples(("build", dir)).min
      val p = samples(("probe", dir)).min
      println(f"INCR $dir corpus=$corpus incrRows=$rows split=$split " +
        f"build=$b%.3f probe=$p%.3f")
    }
    if (tiers.length >= 2) {
      val (d0, dN) = (tiers.head._1, tiers.last._1)
      println(f"RATIO corpus=${tiers.last._4.toDouble / tiers.head._4}%.2f " +
        f"build=${samples(("build", dN)).min / samples(("build", d0)).min}%.2f " +
        f"probe=${samples(("probe", dN)).min / samples(("probe", d0)).min}%.2f")
    }
    spark.stop()
  }
}
