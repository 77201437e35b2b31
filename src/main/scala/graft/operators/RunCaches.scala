package graft.operators

/** The ONE registry of per-run cache clearers. Four leak-class caches
  * exist (the Similarity feature memo, the Bloom broadcast memo, the
  * connected-components checkpoints, the prefix-sum kernel broadcasts)
  * and every cold-measurement harness must clear ALL of them or a warm
  * survivor silently contaminates the run — the r12 review found the
  * same four-call litany repeated at five harness sites, where the
  * NEXT cache (or one forgotten line) would re-open exactly that hole.
  * Each cache registers its clearer once at its holder's class-load;
  * harnesses call [[clearAll]]. A cache that has never been touched has
  * never loaded, holds no state, and correctly has nothing registered.
  * The individual clear functions remain public for targeted specs. */
object RunCaches {
  private val clearers =
    scala.collection.mutable.ArrayBuffer.empty[(String, () => Unit)]

  def register(name: String)(clear: () => Unit): Unit =
    clearers.synchronized { clearers += ((name, clear)) }

  /** Removes every clearer registered under `name`. For SPECS that plant
    * throwing/counting clearers to pin clearAll's contract: without
    * deregistration the planted entry outlives its test in the shared
    * JVM and every later clearAll re-runs it — a permanently-throwing
    * one then prints the broken-clearer warning on every harness reset,
    * burying a real failure (r13 test sweep). Production caches register
    * once at class load and never unregister. */
  def unregister(name: String): Unit =
    clearers.synchronized { clearers.filterInPlace(_._1 != name); () }

  /** Runs every registered clearer; one failure must not skip the rest
    * (same Try discipline each clearer already applies internally) — but
    * it must be LOUD: a silently-broken clearer leaves warm state, and
    * the cold-measurement harnesses would report deflated numbers
    * indistinguishable from a real speedup (r13 sweep). */
  def clearAll(): Unit =
    clearers.synchronized(clearers.toList).foreach { case (name, f) =>
      scala.util.Try(f()).failed.foreach(t =>
        System.err.println(s"[run-caches] clearer '$name' failed " +
          s"(state may stay warm): ${t.getMessage}"))
    }
}
