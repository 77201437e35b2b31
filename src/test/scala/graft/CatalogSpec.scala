package graft

/** Catalog-wide invariants: every declared operator runs at sf0.001 and
  * produces a sane frame; name/oracle wiring is consistent (the driver's
  * column-name-sorted hash makes aliasing mistakes fatal — catch them
  * here, not in the round gate). */
class CatalogSpec extends SparkSpec {

  test("catalog names are unique and non-empty") {
    val names = QueryDef.catalogs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(names.forall(_.nonEmpty))
  }

  test("SparkEntry maps mirror the catalog") {
    assert(SparkEntry.queries.keySet === QueryDef.catalogs.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ===
      QueryDef.catalogs.filter(_.oracle.isDefined).map(_.name).toSet)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Bench swing anchors parse from the newest driver record, with fallback") {
    // the swing diagnostic's anchors load from the newest BENCH_r{N}.json
    // at run time (hardcoded constants went stale r5→r6 and false-fired);
    // pin the parse against both driver record shapes — raw-line-in-tail
    // and pre-parsed — plus the must-never-throw fallback
    val dir = tempDir("graft-bench-rec").toFile
    def write(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name)); w.write(body); w.close()
    }
    val line = """{"metric":"total","value":9.9,"unit":"sec","queries":{"q1_agg":1.5,"dead":-1.0},""" +
      """"sf":"/x/sf0.1","sf1_ratio_vs_sf01":{"q1_agg":2.5,"dead":-1.0}}"""
    // build the raw-tail record with Jackson so the embedded line's
    // quotes are escaped exactly the way the driver's JSON writer does
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rec2 = mapper.createObjectNode()
    rec2.put("n", 2)
    rec2.put("tail", s"[info] noise\n[info] $line\n[success] done\n")
    rec2.putNull("parsed")
    write("BENCH_r02.json", mapper.writeValueAsString(rec2))
    // an OLDER record with different numbers must lose to r02
    write("BENCH_r01.json",
      """{"n":1,"parsed":{"metric":"total","queries":{"q1_agg":9.0},"sf1_ratio_vs_sf01":{"q1_agg":9.0}}}""")
    val (sf01, ratios) = Bench.loadPrevDriverRecord(dir)
    assert(sf01 === Map("q1_agg" -> 1.5), "newest-record sf0.1 times (dead -1 filtered)")
    assert(ratios === Map("q1_agg" -> 2.5))
    // pre-parsed form wins over tail when present; the record now also
    // carries the r8 per-sample fields (queries_samples / sf1_passes) —
    // the loader must keep parsing a record that has them, so the
    // emitter and this loader can't drift apart
    write("BENCH_r03.json",
      """{"n":3,"parsed":{"metric":"total","queries":{"q1_agg":3.25},""" +
        """"queries_samples":{"q1_agg":[3.4,3.25,3.3]},""" +
        """"sf1_ratio_vs_sf01":{"q1_agg":4.0},"sf1_passes":{"q1_agg":[13.1,13.0,-1.0]}}}""")
    assert(Bench.loadPrevDriverRecord(dir)._1 === Map("q1_agg" -> 3.25))
    // no records / garbage → embedded fallback, never a throw
    val empty = tempDir("graft-bench-none").toFile
    assert(Bench.loadPrevDriverRecord(empty) ===
      ((Bench.fallbackSf01Sec, Bench.fallbackSf1Ratios)))
    // an unparseable NEWEST record must walk back to the newest record
    // that DOES parse — r8's record lost its head to the driver's tail
    // budget and the single-newest loader armed round 9 with embedded
    // r6 constants while parseable BENCH_r07.json sat beside it
    write("BENCH_r04.json", "not json at all")
    assert(Bench.loadPrevDriverRecord(dir)._1 === Map("q1_agg" -> 3.25),
      "garbage newest → older parseable record, not the fallback")
    // the r8 truncation shape specifically: a tail whose only record
    // content starts MID-LINE (head with "metric":"total" cut off)
    write("BENCH_r05.json",
      """{"n":5,"parsed":null,"tail":"1.24,\"st1_deadline_tally\":2.6},\"sf1_gen_sec\":41.2}\n"}""")
    assert(Bench.loadPrevDriverRecord(dir)._1 === Map("q1_agg" -> 3.25),
      "truncated newest → older parseable record")
    // a newest record from the WRONG scale must not arm the detector —
    // replica-at-sf0.01 anchors would trip the >2x trigger on every
    // query — and must also walk back rather than fall back
    write("BENCH_r06.json",
      """{"n":6,"parsed":{"metric":"total","queries":{"q1_agg":0.2},""" +
        """"sf":"/x/sf0.01","sf1_ratio_vs_sf01":{}}}""")
    assert(Bench.loadPrevDriverRecord(dir)._1 === Map("q1_agg" -> 3.25),
      "wrong-scale newest → older sf0.1 record")
    // a round number too long for Int/Long must sort LAST (oldest), not
    // throw out of the listing layer and kill the bench at startup —
    // the loader's never-break-the-run contract covers filenames too.
    // The planted record is PARSEABLE with a distinguishable number:
    // the old "{}" body was skipped as unparseable wherever it sorted,
    // so only the must-not-throw half was actually bound (r13 sweep)
    write("BENCH_r99999999999999999999.json",
      """{"n":1,"parsed":{"metric":"total","queries":{"q1_agg":99.0},""" +
        """"sf":"/x/sf0.1","sf1_ratio_vs_sf01":{}}}""")
    assert(Bench.loadPrevDriverRecord(dir)._1 === Map("q1_agg" -> 3.25),
      "overlong round number in a filename must not throw or win the sort")
  }

  test("Bench record lines: summary last, loader prefers it, both parse") {
    // r9: the bench prints the full record (with samples evidence) and
    // then a compact summary line LAST, so driver-side tail truncation
    // can never again eat the headline numbers (r8 lost total + sf0.1
    // times exactly this way). Pin both shapes and the loader's
    // last-line-wins preference.
    val (full, summary) = Bench.recordLines(
      total = 9.5,
      qs = """{"q1_agg":1.5}""",
      qSamples = """{"q1_agg":[1.9,1.5,1.6]}""",
      sfDir = "/x/sf0.1",
      sf1Full = ""","sf1_total":18.0,"sf1_queries":{"q1_agg":13.0},""" +
        """"sf1_ratio_vs_sf01":{"q1_agg":8.67},"sf1_passes":{"q1_agg":[13.2,13.0,13.4]},""" +
        """"sf1_gen_sec":40.0""",
      sf1Summary = ""","sf1_total":18.0,"sf1_queries":{"q1_agg":13.0},""" +
        """"sf1_ratio_vs_sf01":{"q1_agg":8.67}""")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val fullNode = mapper.readTree(full)     // both lines are strict JSON
    val sumNode = mapper.readTree(summary)
    assert(fullNode.get("queries_samples").get("q1_agg").size() === 3,
      "samples evidence lives on the full line")
    assert(sumNode.get("summary").asBoolean(), "summary line is marked")
    assert(!sumNode.has("queries_samples") && !sumNode.has("sf1_passes"),
      "summary stays compact — no samples fields to outgrow the tail")
    for (n <- Seq(fullNode, sumNode)) {
      assert(n.get("metric").asText() === "total")
      assert(n.get("value").asDouble() === 9.5)
      assert(n.get("queries").get("q1_agg").asDouble() === 1.5)
      assert(n.get("sf1_ratio_vs_sf01").get("q1_agg").asDouble() === 8.67)
    }
    // a driver tail carrying BOTH lines: the loader must take the LAST
    // metric line (the summary) — and a tail where truncation ate the
    // full line's head but kept the summary still parses
    val dir = tempDir("graft-bench-sum").toFile
    def rec(tail: String): String = {
      val node = mapper.createObjectNode()
      node.putNull("parsed"); node.put("tail", tail)
      mapper.writeValueAsString(node)
    }
    def write(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name)); w.write(body); w.close()
    }
    write("BENCH_r01.json", rec(s"[info] $full\n[info] $summary\n[success]\n"))
    assert(Bench.loadPrevDriverRecord(dir)._1 === Map("q1_agg" -> 1.5))
    write("BENCH_r02.json",
      rec(s"...mid-line truncation${full.takeRight(40)}\n[info] $summary\n"))
    assert(Bench.loadPrevDriverRecord(dir) ===
      ((Map("q1_agg" -> 1.5), Map("q1_agg" -> 8.67))),
      "summary alone carries every headline field the loader needs")
    // r17: the `[bench-json] `-marked line is PREFERRED over
    // last-metric-line mining — a tail whose last metric-bearing line is
    // broken garbage must still yield the marked record (distinct value
    // 2.5 proves the marker path was taken: the mining path would throw
    // on the garbage line and walk back to r02's 1.5)
    val summary3 = summary.replace("\"q1_agg\":1.5", "\"q1_agg\":2.5")
    write("BENCH_r03.json", rec(
      s"[bench-json] $summary3\n" +
        "late garbage {\"metric\":\"total\" broken\n"))
    assert(Bench.loadPrevDriverRecord(dir)._1 === Map("q1_agg" -> 2.5),
      "the marked line must win over metric-line mining")
  }

  test("summary line carries the attribution fields inside the tail window") {
    // r13's 8.64 s binding number shipped with its remeasure attribution
    // truncated off the full line — the summary (the line the driver's
    // 2000-char tail always keeps) must now carry wall time, spreads and
    // remeasure prelim→final sums itself, and stay parseable JSON
    val (_, summary) = Bench.recordLines(
      total = 9.5, qs = """{"q1_agg":1.5}""",
      qSamples = """{"q1_agg":[1.9,1.5,1.6]}""", sfDir = "/x/sf0.1",
      sf1Full = "", sf1Summary = "",
      extraBoth = ""","sf10_total":30.0,"sf10_queries":{"q1_agg":14.0},""" +
        """"sf10_ratio_vs_sf1":{"q1_agg":1.08},"sf10_gen_sec":60.5""",
      summaryExtra = ""","wall_sec":356.2,"spread_sf01":1.27,"spread_sf1":17.64,""" +
        """"sf01_remeasured_prelim":9.91,"sf01_remeasured_final":8.64""")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(summary)
    assert(node.get("summary").asBoolean())
    assert(node.get("wall_sec").asDouble() === 356.2)
    assert(node.get("spread_sf1").asDouble() === 17.64)
    assert(node.get("sf01_remeasured_prelim").asDouble() === 9.91)
    assert(node.get("sf01_remeasured_final").asDouble() === 8.64)
    assert(node.get("sf10_ratio_vs_sf1").get("q1_agg").asDouble() === 1.08,
      "the second-decade ratios ride extraBoth onto the summary line too")
    assert(summary.length < 1900,
      s"summary line must survive the driver's ~2000-char tail: ${summary.length}")
  }

  test("maxSpread: worst per-query max/min over valid samples, warm-up skippable") {
    // r13's sf1 j1 passes [44.63, 3.95, 2.53] — 17.64× spread — IS the
    // host-window evidence; the sf0.1 tier's pass 0 is JIT warm-up and
    // must be skippable so the spread measures the host, not codegen
    assert(Bench.maxSpread(Seq(Seq(44.63, 3.95, 2.53), Seq(1.0, 1.1, 1.05)),
      skipFirst = false) === 17.64)
    assert(Bench.maxSpread(Seq(Seq(9.9, 1.0, 1.1)), skipFirst = true) === 1.1)
    // -1 failure markers and single-sample queries are ignored
    assert(Bench.maxSpread(Seq(Seq(-1.0, 2.0, 1.0), Seq(-1.0, -1.0, 3.0)),
      skipFirst = false) === 2.0)
    assert(Bench.maxSpread(Seq(Seq(3.0)), skipFirst = false) === 0.0)
    assert(Bench.maxSpread(Nil, skipFirst = false) === 0.0)
  }

  test("samplesJson emits parseable per-query sample arrays in catalog order") {
    // the bench record's queries_samples/sf1_passes fields are built by
    // this helper; pin that the output is strict JSON (Jackson accepts),
    // preserves the given name order, keeps -1 failure markers, and
    // renders a missing query as an empty array instead of throwing
    val json = Bench.samplesJson(Seq("b_query", "a_query", "missing"),
      Map("a_query" -> Seq(0.5117, -1.0, 0.25), "b_query" -> Seq(1.0, 2.0, 3.0)))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    assert(node.fieldNames().asScala.toSeq === Seq("b_query", "a_query", "missing"),
      "insertion order = the order the caller gave (catalog order in main)")
    assert(node.get("b_query").elements().asScala.map(_.asDouble()).toSeq ===
      Seq(1.0, 2.0, 3.0))
    assert(node.get("a_query").elements().asScala.map(_.asDouble()).toSeq ===
      Seq(0.512, -1.0, 0.25), "3-decimal rounding, -1 markers survive")
    assert(node.get("missing").size() === 0)
  }

  test("adaptive sf1 re-measure triggers on a superlinear min, and only then") {
    // r10's dd_minhash record: all three passes in one bad window
    // (spread just 1.2×), min still 4.4× — MUST re-measure; a
    // spread-gated trigger would miss exactly this case
    assert(Bench.needsRemeasure(Seq(4.04, 4.55, 3.70), sf01Base = 0.84))
    // healthy scaling (min 1.24×), even with warm-up spread: leave it
    assert(!Bench.needsRemeasure(Seq(2.79, 1.12, 0.99), sf01Base = 0.80))
    // borderline-linear min (2.47×): below the bar, no churn
    assert(!Bench.needsRemeasure(Seq(3.67, 3.78, 2.05), sf01Base = 0.83))
    // failed samples are ignored, not compared
    assert(Bench.needsRemeasure(Seq(-1.0, 4.55, 3.70), sf01Base = 0.80))
    assert(!Bench.needsRemeasure(Seq(-1.0, -1.0, -1.0), sf01Base = 0.80))
    assert(!Bench.needsRemeasure(Seq(4.04, 4.55, 3.70), sf01Base = -1.0))
  }

  test("adaptive sf0.1 re-measure triggers on a min above the best record") {
    // r11's j1_fk_join: best recorded 1.04 s, measured min 1.39 s
    // (1.34×) — the binding tier's number inflated by a host window;
    // MUST re-measure (this is exactly the case r11 shipped un-escaped)
    assert(Bench.needsRemeasureSf01(Seq(1.39, 1.52), prevSec = 1.04))
    // r11's q1_agg: 0.82 vs best 0.80 (1.03×) — normal variance, leave it
    assert(!Bench.needsRemeasureSf01(Seq(0.82, 0.85), prevSec = 0.80))
    // exactly at the bar (1.2×): no churn
    assert(!Bench.needsRemeasureSf01(Seq(1.2, 1.3), prevSec = 1.0))
    // failed samples ignored; no anchor or no valid sample → no trigger
    assert(Bench.needsRemeasureSf01(Seq(-1.0, 1.39), prevSec = 1.04))
    assert(!Bench.needsRemeasureSf01(Seq(-1.0, -1.0), prevSec = 1.04))
    assert(!Bench.needsRemeasureSf01(Seq(1.39, 1.52), prevSec = -1.0))
  }

  test("best-historical sf0.1 anchors take the per-query min across records") {
    // the re-measure anchor must NOT ratchet up when a noisy record
    // ships: r11's 8.66 s record would otherwise become the bar and an
    // equally-noisy r12 would read as unchanged. Best-across-records is
    // the quiet-window evidence of what the frozen plan can do.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val dir = tempDir("graft-bench-best").toFile
    def write(name: String, line: String): Unit = {
      val node = mapper.createObjectNode()
      node.putNull("parsed"); node.put("tail", s"[info] $line\n")
      val w = new java.io.PrintWriter(new java.io.File(dir, name))
      w.write(mapper.writeValueAsString(node)); w.close()
    }
    def line(q1: Double, j1: Double): String =
      s"""{"metric":"total","value":${q1 + j1},"unit":"sec",""" +
        s""""queries":{"q1_agg":$q1,"j1_fk_join":$j1},"sf":"/x/sf0.1"}"""
    write("BENCH_r10.json", line(0.80, 1.04)) // quiet round
    write("BENCH_r11.json", line(0.82, 1.39)) // noisy round (newest)
    assert(Bench.loadBestSf01Anchors(dir) ===
      Map("q1_agg" -> 0.80, "j1_fk_join" -> 1.04),
      "per-query min across records, not the newest record's values")
    // newest-record loader is unchanged — swing detection stays
    // round-over-round
    assert(Bench.loadPrevDriverRecord(dir)._1 ===
      Map("q1_agg" -> 0.82, "j1_fk_join" -> 1.39))
    // no parseable record → embedded fallback, never an empty anchor map
    val empty = tempDir("graft-bench-none").toFile
    assert(Bench.loadBestSf01Anchors(empty) === Bench.fallbackSf01Sec)
  }

  test("sf10 anchor is the per-query min recorded ratio; trigger is wall-or-2.5x") {
    // r15 verdict #1: j1_fk_join shipped 10.19x/decade as a single
    // unattributed pass under the absolute >12 wall while quiet
    // same-day runs measured 4.43x. The per-query best recorded sf10
    // ratio is the anchor; exceeding 2.5x of it re-measures (and, if it
    // stands, dumps) — the wall alone no longer gates attribution.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val dir = tempDir("graft-bench-sf10").toFile
    def write(name: String, line: String): Unit = {
      val node = mapper.createObjectNode()
      node.putNull("parsed"); node.put("tail", s"[info] $line\n")
      val w = new java.io.PrintWriter(new java.io.File(dir, name))
      w.write(mapper.writeValueAsString(node)); w.close()
    }
    def line(j1Ratio: Double): String =
      s"""{"metric":"total","value":9.0,"unit":"sec",""" +
        s""""queries":{"q1_agg":0.8,"j1_fk_join":1.1},""" +
        s""""sf10_ratio_vs_sf1":{"j1_fk_join":$j1Ratio},"sf":"/x/sf0.1"}"""
    write("BENCH_r14.json", line(3.38)) // quiet round
    write("BENCH_r15.json", line(10.19)) // window-inflated round (newest)
    assert(Bench.loadBestSf10Ratios(dir) === Map("j1_fk_join" -> 3.38),
      "per-query min recorded sf10 ratio, not the newest record's")
    // a record with no sf10 section contributes nothing (and an empty
    // dir yields NO fallback — the wall is the only trigger then)
    assert(Bench.loadBestSf10Ratios(tempDir("graft-bench-sf10e").toFile)
      === Map.empty)
    // trigger semantics: the r15 case (10.19 vs anchor 3.38) now fires;
    // a in-family ratio does not; the wall still covers anchorless
    // queries; a nonpositive anchor can never arm the relative arm
    assert(Bench.sf10Suspicious(10.19, Some(3.38)))
    assert(!Bench.sf10Suspicious(4.0, Some(3.38)))
    assert(!Bench.sf10Suspicious(8.44, Some(3.38)), "2.5x is exclusive")
    assert(Bench.sf10Suspicious(12.1, None))
    assert(!Bench.sf10Suspicious(11.9, None))
    assert(!Bench.sf10Suspicious(5.0, Some(-1.0)))
    assert(!Bench.sf10Suspicious(5.0, Some(0.0)))
  }

  test("Verify subset runs merge oracle entries, never dropping a prior failure") {
    // advice r15: a query that FAILED in a prior full run has an oracle
    // entry but no result dir; a subset refresh into the reused dir must
    // keep that entry (so it keeps failing the compare) rather than
    // filter it out and silently downgrade the failure to unchecked.
    val out = tempDir("graft-verify-keep").toFile
    // prior full run recorded two entries; 'prior_failed' never wrote a dir
    java.nio.file.Files.writeString(
      new java.io.File(out, "oracle_sql.json").toPath,
      """{"prior_failed": "SELECT 1", "prior_green": "SELECT 2"}""")
    new java.io.File(out, "prior_green").mkdirs()   // green sibling's dir
    new java.io.File(out, "dir_only").mkdirs()      // dir with no prior entry
    val keep = Verify.oracleKeep(Set("selected"), out.getPath)
    assert(keep("selected"), "the refreshed query itself")
    assert(keep("prior_failed"), "entry-no-dir sibling keeps failing the compare")
    assert(keep("prior_green"), "green sibling stays checked")
    assert(keep("dir_only"), "result dir without a prior entry is (re)added")
    assert(!keep("never_seen"), "unrelated catalog keys stay out of a subset dump")
    // full run: everything, regardless of dir state
    assert(Verify.oracleKeep(Set.empty, out.getPath)("anything"))
    // unreadable prior file degrades to selected ∪ dirs, never throws
    java.nio.file.Files.writeString(
      new java.io.File(out, "oracle_sql.json").toPath, "{not json")
    val degraded = Verify.oracleKeep(Set("selected"), out.getPath)
    assert(degraded("selected") && degraded("prior_green") && !degraded("prior_failed"))
  }

  test("remeasuredJson records the prelim-min transparency field") {
    // min over more samples is monotone non-increasing, so an adaptive
    // correction can only lower a number — the artifact must say which
    // queries were re-measured and what they read BEFORE the extras
    val json = Bench.remeasuredJson("sf01_remeasured",
      Seq("j1_fk_join" -> 1.3911, "dd_minhash" -> 1.08))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree("{" + json.drop(1) + "}") // strip leading comma
    assert(node.get("sf01_remeasured").get("j1_fk_join").asDouble() === 1.391)
    assert(node.get("sf01_remeasured").get("dd_minhash").asDouble() === 1.08)
    assert(Bench.remeasuredJson("sf01_remeasured", Nil) === "",
      "no re-measure → no field, not an empty object")
    // and it embeds into a parseable full record line
    val (full, _) = Bench.recordLines(1.0, """{"q1_agg":1.0}""",
      """{"q1_agg":[1.2,1.0,1.1]}""", "/x/sf0.1", "", "", json)
    assert(mapper.readTree(full).get("sf01_remeasured")
      .get("j1_fk_join").asDouble() === 1.391)
  }

  test("every query runs at sf0.001 with rows and unique column names") {
    val failures = QueryDef.catalogs.flatMap { q =>
      try {
        val df = q.run(spark, sf001)
        val cols = df.columns.toSeq
        if (cols.distinct.size != cols.size) Some(s"${q.name}: dup columns $cols")
        else if (df.limit(1).count() == 0) Some(s"${q.name}: empty result")
        else None
      } catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
