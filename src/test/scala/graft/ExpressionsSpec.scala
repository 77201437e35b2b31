package graft

import org.apache.spark.sql.functions._

/** Native Catalyst expression kernels: correctness on both execution
  * paths (generated and interpreted), null contracts, and SQL-surface
  * availability via GraftExtensions. */
class ExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private val frame = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),            // 32
    (Seq(-2L, 7L), Seq(3L, 1L)),                    // 1
    (Seq.empty[Long], Seq.empty[Long])              // 0
  ).toDF("a", "b")

  test("dot_long: exact integer inner product via SQL and call_function") {
    val got = frame.select(call_function("dot_long", $"a", $"b")).as[Long].collect().toSeq
    assert(got === Seq(32L, 1L, 0L))
    frame.createOrReplaceTempView("dot_t")
    assert(spark.sql("SELECT dot_long(a, b) FROM dot_t").as[Long].collect().toSeq
      === Seq(32L, 1L, 0L))
  }

  test("dot_float: double accumulation matches the left-to-right reference") {
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val got = df.select(call_function("dot_float", $"a", $"b")).as[Double].collect().head
    assert(got === (1.5f.toDouble * 2.0f.toDouble + 2.5f.toDouble * 4.0f.toDouble))
  }

  test("null contracts: null input, ragged pair, and null element all yield null") {
    // Option-typed ELEMENTS so the array schema is containsNull=true and
    // the third row really carries a null element — the old fixture's
    // title claimed this case but held no such row (r13 test sweep)
    val df = Seq(
      (Some(Seq(Some(1L), Some(2L))), None: Option[Seq[Option[Long]]]), // null input
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(1L), Some(2L), Some(3L)))), // ragged
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L)))),      // null ELEMENT
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(1L), Some(2L))))   // fine
    ).toDF("a", "b")
    val got = df.select(call_function("dot_long", $"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(None, None, None, Some(5L)))
  }

  /** Snapshot-and-restore interpreted-mode toggle — ONE definition for
    * every dual-path test (the copy-pasted conf blocks restored assumed
    * defaults and could silently de-sync; r13 test sweep). */
  private def withInterpreted[A](f: => A): A = {
    val ws = spark.conf.get("spark.sql.codegen.wholeStage")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  test("dot_long: overflowing accumulation folds to null, never wraps (both codegen paths)") {
    // dot_long is a PUBLIC registered function — the catalog's quantize
    // envelope does not bound what user SQL feeds it, and a wrapped
    // Long is a plausible wrong score (r13 third sweep)
    val big = 4000000000L // big*big overflows; 2*big*big wraps positive
    val df = Seq(
      (Seq(big, big), Seq(big, big)),     // multiply overflow
      (Seq(Long.MaxValue, Long.MaxValue), Seq(1L, 1L)), // add overflow
      (Seq(3L, 4L), Seq(5L, 6L))          // fine: 39
    ).toDF("a", "b")
    def run(): Seq[Option[Long]] =
      df.select(call_function("dot_long", $"a", $"b").as("d"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(run() === Seq(None, None, Some(39L)))
    withInterpreted { assert(run() === Seq(None, None, Some(39L))) }
  }

  test("generated and interpreted paths agree") {
    val rng = new scala.util.Random(11L)
    val rows = Seq.fill(50)((Seq.fill(64)(rng.nextInt(2001).toLong - 1000),
      Seq.fill(64)(rng.nextInt(2001).toLong - 1000)))
    val df = rows.toDF("a", "b")
    val gen = df.select(call_function("dot_long", $"a", $"b")).as[Long].collect().toSeq
    withInterpreted {
      val interp = df.select(call_function("dot_long", $"a", $"b")).as[Long].collect().toSeq
      assert(gen === interp)
    }
  }

  test("the kernel runs inside a whole-stage codegen span (no UDF fence)") {
    // a local relation would be constant-folded to LocalTableScan; a
    // parquet scan shows the real pipeline shape
    val plan = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(call_function("dot_float", $"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen span; the projection
    // evaluating the kernel must sit inside one
    // prettyName is the REGISTERED catalog name (dot_float), so plan
    // output and analyzer errors print a name a user can resolve
    assert("""\*\(\d+\) Project \[dot_float""".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("BatchEvalPython"), plan)
  }

  test("wrong arity surfaces as an analyzer error naming the function, not an index crash") {
    for (sql <- Seq("SELECT dot_long(array(1L))",
        "SELECT dot_float(array(1.0F), array(1.0F), array(1.0F))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql).collect())
      val msg = e.getMessage
      assert(msg.contains("dot_long") || msg.contains("dot_float"), msg)
      assert(!msg.contains("IndexOutOfBounds"), msg)
    }
  }
}
