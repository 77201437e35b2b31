package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (driver-requested
  * training-data-pipeline surface) plus MinHash/SimHash near-dup over
  * `documents`.
  *
  * Three tiers:
  *  - `sim_topk_dot`: exact top-k by integer-quantized inner product —
  *    float-free, so it is DuckDB-oracle-checkable bit-for-bit.
  *  - `sim_topk_cosine`: brute-force cosine top-k in double precision,
  *    the correctness baseline for ANN (rows-only check).
  *  - `sim_lsh_topk` / `dd_minhash` / `dd_simhash`: hash-bucketed scale
  *    paths — candidates come from bucket joins (shuffle on short hash
  *    keys), never from an unconstrained cross join, so they survive a
  *    100× scale-up; each candidate pair is then verified exactly.
  *
  * Grounding: the reference's similarity primitive is the token-overlap
  * scorer (oracle.ts:146-175); the embedding ops generalize it to the
  * vector column per the driver brief.
  */
object Similarity {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  /** embedding: Array[Float] → integer grid (×1000, rounded). Exact both
    * engines; all downstream math is Long. */
  private def quantized(c: Column): Column =
    transform(c, x => round(x.cast("double") * lit(1000), 0).cast("long"))

  private def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  private def dotDouble(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Exact top-5 neighbors by quantized inner product for query vectors
    * vec_id < 5. Integer math end-to-end → DuckDB-checkable. */
  val simTopkDot = QueryDef(
    "sim_topk_dot",
    (s, dir) => {
      val e = T(s, dir).embeddings.select(col("vec_id"), quantized(col("embedding")).as("q"))
      val queries = e.filter(col("vec_id") < lit(5L))
        .select(col("vec_id").as("qid"), col("q").as("qv"))
      val cands = e.select(col("vec_id").as("nid"), col("q").as("nv"))
      val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid").asc)
      queries.join(cands, col("qid") =!= col("nid"))
        .withColumn("dot", dotLong(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= lit(5L))
        .select(col("qid"), col("rank"), col("nid"), col("dot"))
        .orderBy(col("qid"), col("rank"))
    },
    oracle = Some("""
      WITH e AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        FROM embeddings),
      pairs AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
          (SELECT CAST(SUM(z.xa * z.xb) AS BIGINT)
           FROM (SELECT unnest(a.q) AS xa, unnest(b.q) AS xb) z) AS dot
        FROM e a JOIN e b ON a.vec_id < 5 AND a.vec_id <> b.vec_id),
      ranked AS (
        SELECT qid, nid, dot,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, nid ASC) AS rank
        FROM pairs)
      SELECT qid, rank, nid, dot FROM ranked WHERE rank <= 5
      ORDER BY qid, rank"""),
    headline = true)

  /** Brute-force cosine top-5 (double) — ANN correctness baseline.
    * Rows-only check: float accumulation order is engine-specific. */
  val simTopkCosine = QueryDef(
    "sim_topk_cosine",
    (s, dir) => {
      val e = T(s, dir).embeddings
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("norm", sqrt(dotDouble(col("v"), col("v"))))
      val queries = e.filter(col("vec_id") < lit(5L))
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
      val cands = e.select(col("vec_id").as("nid"), col("v").as("nv"), col("norm").as("nn"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
      queries.join(cands, col("qid") =!= col("nid"))
        .withColumn("cos", dotDouble(col("qv"), col("nv")) / (col("qn") * col("nn")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= lit(5L))
        .select(col("qid"), col("rank"), col("nid"),
          round(col("cos") * lit(1000000), 0).cast("long").as("cos_q6"))
        .orderBy(col("qid"), col("rank"))
    },
    oracle = None)

  /** LSH-bucketed cosine top-k: random-hyperplane signatures (seeded,
    * deterministic), candidates share a signature band, exact re-rank
    * inside buckets. The 100 TB path: shuffle keys are 16-bit bands. */
  val simLshTopk = QueryDef(
    "sim_lsh_topk",
    (s, dir) => {
      val spark = s
      val dim = 64
      val nPlanes = 16
      val nBands = 4 // 4 bands x 4 bits
      // deterministic pseudo-random hyperplanes from a fixed LCG seed
      val rng = new java.util.Random(42L)
      val planes: Array[Array[Double]] =
        Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
      val planesLit = array(planes.map(p => array(p.map(lit): _*)): _*)

      val e = T(s, dir).embeddings.select(col("vec_id"), col("embedding").as("v"))
        .withColumn("norm", sqrt(dotDouble(col("v"), col("v"))))
        .withColumn("sig",
          transform(planesLit, p =>
            when(dotDouble(p, col("v")) >= lit(0.0), lit(1)).otherwise(lit(0))))
      // band id = which 4-bit slice; band value = packed bits
      val banded = e.select(
        col("vec_id"), col("v"), col("norm"),
        posexplode(transform(sequence(lit(0), lit(nBands - 1)), b =>
          aggregate(slice(col("sig"), b * lit(nPlanes / nBands) + lit(1), lit(nPlanes / nBands)),
            lit(0), (acc, x) => acc * lit(2) + x))))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_val")
      // query-side filter BEFORE the bucket join: the join's left input is
      // k query vectors, not the whole corpus — at 100 TB this is the
      // difference between a broadcast probe and a full self-join.
      val left = banded.filter(col("vec_id") < lit(5L))
        .select(col("band"), col("band_val"), col("vec_id").as("qid"),
          col("v").as("qv"), col("norm").as("qn"))
      val right = banded.select(col("band"), col("band_val"), col("vec_id").as("nid"),
        col("v").as("nv"), col("norm").as("nn"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
      left.join(right, Seq("band", "band_val"))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"), col("qv"), col("nv"), col("qn"), col("nn"))
        .distinct()
        .withColumn("cos", dotDouble(col("qv"), col("nv")) / (col("qn") * col("nn")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= lit(5L))
        .select(col("qid"), col("rank"), col("nid"),
          round(col("cos") * lit(1000000), 0).cast("long").as("cos_q6"))
        .orderBy(col("qid"), col("rank"))
    },
    oracle = None,
    headline = true)

  /** MinHash+LSH near-dup over documents: word shingles → 32 minhashes
    * (xxhash64 with per-permutation salt) → 8 bands of 4 → per-bucket
    * keeper assignment → exact Jaccard verify ≥ 50%.
    *
    * Scale design: the classic all-pairs-within-bucket join is quadratic
    * in duplicate-cluster size (a 10k-copy boilerplate cluster → 10^8
    * pairs). Instead each bucket elects a keeper (min doc_id) via a
    * window min — LINEAR in bucket size — and every doc is verified
    * against only its best (lowest-id) candidate keeper: one output row
    * per duplicate document, which is also the semantics a dedup pipeline
    * actually wants (keep one, drop the rest). Deterministic; rows-only
    * check (DuckDB lacks Spark's xxhash64). */
  val ddMinhash = QueryDef(
    "dd_minhash",
    (s, dir) => {
      val nHashes = 32
      val nBands = 8
      val rowsPerBand = nHashes / nBands
      val toks = array_distinct(filter(split(lower(col("text")), " "), w => length(w) > lit(3)))
      val d = T(s, dir).documents.select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) > lit(0))
      // signature[i] = min over tokens of xxhash64(i, token)
      val sig = transform(sequence(lit(0), lit(nHashes - 1)), i =>
        array_min(transform(col("toks"), t => xxhash64(i, t))))
      val banded = d.withColumn("sig", sig).select(
        col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(nBands - 1)), b =>
          hash(slice(col("sig"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      // keeper per (band, bucket) = min doc_id; then best candidate per doc
      val wB = Window.partitionBy(col("band"), col("bucket"))
      val cand = banded
        .withColumn("keeper", min(col("doc_id")).over(wB))
        .filter(col("keeper") < col("doc_id"))
        .groupBy(col("doc_id")).agg(min(col("keeper")).as("keeper"))
      // exact verify: fetch token sets for both sides (linear joins on id)
      cand
        .join(d, Seq("doc_id"))
        .join(d.select(col("doc_id").as("keeper"), col("toks").as("k_toks")),
          Seq("keeper"))
        .withColumn("inter", size(array_intersect(col("toks"), col("k_toks"))).cast("long"))
        .withColumn("uni", size(array_union(col("toks"), col("k_toks"))).cast("long"))
        .filter(col("uni") > lit(0L) && expr("(inter * 100) div uni") >= lit(50L))
        .select(col("doc_id"), col("keeper"), expr("(inter * 100) div uni").as("jaccard_pct"))
        .orderBy(col("doc_id"))
    },
    oracle = None,
    headline = true)

  /** SimHash near-dup: 32-bit simhash over token xxhashes, banded by 4x8
    * bits, hamming-verified ≤ 4. Deterministic; rows-only check. */
  val ddSimhash = QueryDef(
    "dd_simhash",
    (s, dir) => {
      val bits = 32
      val toks = array_distinct(filter(split(lower(col("text")), " "), w => length(w) > lit(3)))
      val d = T(s, dir).documents.select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) > lit(0))
      // simhash bit i = sign of sum over tokens of (bit i of xxhash64(tok) ? 1 : -1)
      val sim = aggregate(
        sequence(lit(0), lit(bits - 1)),
        lit(0L),
        (acc, i) => {
          val bitSum = aggregate(col("toks"), lit(0L),
            (a, t) => a + when(call_function("shiftright", xxhash64(t), i)
              .bitwiseAND(lit(1L)) === lit(1L), lit(1L)).otherwise(lit(-1L)))
          acc + when(bitSum > lit(0L),
            call_function("shiftleft", lit(1L), i).cast("long")).otherwise(lit(0L))
        })
      val withSim = d.withColumn("simhash", sim)
      val banded = withSim.select(col("doc_id"), col("simhash"),
        posexplode(transform(sequence(lit(0), lit(3)), b =>
          call_function("shiftright", col("simhash"), b * lit(8))
            .bitwiseAND(lit(255L)))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      // same linear keeper-assignment shape as dd_minhash: window-min per
      // bucket, one verified candidate per doc — no all-pairs join.
      val wB = Window.partitionBy(col("band"), col("bucket"))
      banded
        .withColumn("keeper", min(col("doc_id")).over(wB))
        .filter(col("keeper") < col("doc_id"))
        .groupBy(col("doc_id")).agg(min(col("keeper")).as("keeper"))
        .join(withSim.select(col("doc_id"), col("simhash").as("d_sim")), Seq("doc_id"))
        .join(withSim.select(col("doc_id").as("keeper"), col("simhash").as("k_sim")),
          Seq("keeper"))
        .withColumn("hamming", bit_count(col("d_sim").bitwiseXOR(col("k_sim"))).cast("long"))
        .filter(col("hamming") <= lit(4L))
        .select(col("doc_id"), col("keeper"), col("hamming"))
        .orderBy(col("doc_id"))
    },
    oracle = None)

  val defs: Seq[QueryDef] = Seq(simTopkDot, simTopkCosine, simLshTopk, ddMinhash, ddSimhash)
}
