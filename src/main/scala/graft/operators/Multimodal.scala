package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver brief): media as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / resize /
  * frame-sample stages. The container has no image/audio codecs, so the
  * *decode kernel* is a clearly-marked deterministic stub ([[fakeDecode]])
  * — everything around it (schema, partition-wise batch processing, column
  * plumbing, explode shapes) is the real Spark pipeline a codec would drop
  * into. The batch stage runs as Scala `mapPartitions` — the JVM
  * equivalent of a `mapInPandas` Pandas-UDF stage (same per-partition
  * batch shape, same schema contract; this build has no Python runtime,
  * and a JVM kernel additionally avoids the Arrow serialization hop).
  *
  * The media relation is synthesized deterministically from `documents`
  * (bytes = UTF-8 of text), so every stage is oracle-checkable or at
  * least deterministic across runs. */
object Multimodal {

  private def T(s: SparkSession, dir: String) = Tables(s, dir)

  /** The media relation: media_id, kind, bytes, meta struct. */
  def media(s: SparkSession, dir: String): DataFrame =
    T(s, dir).documents.select(
      col("doc_id").as("media_id"),
      // deterministic kind assignment from id
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + lit(1)).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        col("n_chars").as("n_bytes"),
        (col("n_chars") % lit(640)).cast("int").as("width"),
        (col("n_chars") % lit(480)).cast("int").as("height")).as("meta"))

  /** STUB decode kernel — stands in for an image/audio codec. Maps each
    * media row's bytes to a fixed-width feature vector: byte histogram
    * folded to 8 buckets, L1-normalized in integer permille. Deterministic
    * and partition-local, so the surrounding pipeline (mapPartitions batch
    * shape, schema) is tested for real even though the "decode" is fake. */
  def fakeDecode(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % 8) += 1
      i += 1
    }
    val total = math.max(1L, bytes.length.toLong)
    hist.map(h => h * 1000L / total)
  }

  /** mm_ingest: binary ingest + metadata projection — oracle-checkable
    * (byte length must equal the source text's UTF-8 length). */
  val mmIngest = QueryDef(
    "mm_ingest",
    (s, dir) => media(s, dir)
      .select(col("media_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"))
      .orderBy(col("media_id")),
    oracle = Some("""
      SELECT doc_id AS media_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        n_chars % 640 AS width,
        n_chars % 480 AS height
      FROM documents ORDER BY media_id"""))

  /** mm_features: partition-wise feature extraction through the stub
    * decode kernel (the mapPartitions shape a Pandas-UDF/Arrow batch
    * kernel would use). The feature vector stays a typed array inside the
    * pipeline and is CSV-stringified only at the output boundary — the
    * driver's pandas canonicalizer cannot hash ndarray cells.
    * Deterministic → rows-only check. */
  val mmFeatures = QueryDef(
    "mm_features",
    (s, dir) => {
      val m = media(s, dir)
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val outSchema = StructType(Seq(
        StructField("media_id", LongType),
        StructField("features", ArrayType(LongType))))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      m.select(col("media_id"), col("bytes"))
        .mapPartitions { rows =>
          // batch-shaped: one decode kernel invocation per row, state
          // (codec context) could be initialized once per partition here
          rows.map { r =>
            Row(r.getLong(0), fakeDecode(r.getAs[Array[Byte]](1)).toSeq)
          }
        }(enc)
        .select(col("media_id"),
          concat_ws(",", col("features").cast("array<string>")).as("features_csv"))
        .orderBy(col("media_id"))
    },
    oracle = None)

  /** mm_resize: the resize planning stage — integer aspect-preserving
    * target dimensions for a 224×224 model input (scale = max over both
    * axes so the short side covers, like a center-crop preprocessor).
    * All integer math (×1000 fixed-point ratio) so the oracle matches
    * exactly; the pixel kernel itself would slot into the mm_features
    * mapPartitions stage. */
  val mmResize = QueryDef(
    "mm_resize",
    (s, dir) => media(s, dir)
      .filter(col("kind") === lit("image") &&
        col("meta.width") > lit(0) && col("meta.height") > lit(0))
      .select(
        col("media_id"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"))
      // ratio_m = ceil-ish fixed-point scale so that round(dim*r) >= 224
      .withColumn("ratio_m",
        greatest(expr("(224000 + width - 1) div width"),
          expr("(224000 + height - 1) div height")))
      .select(
        col("media_id"), col("width"), col("height"),
        expr("(width * ratio_m) div 1000").as("out_w"),
        expr("(height * ratio_m) div 1000").as("out_h"))
      .orderBy(col("media_id")),
    oracle = Some("""
      WITH m AS (
        SELECT doc_id AS media_id,
          n_chars % 640 AS width, n_chars % 480 AS height
        FROM documents
        WHERE doc_id % 3 = 0 AND n_chars % 640 > 0 AND n_chars % 480 > 0),
      r AS (
        SELECT *, GREATEST((224000 + width - 1) // width,
                           (224000 + height - 1) // height) AS ratio_m
        FROM m)
      SELECT media_id, width, height,
        (width * ratio_m) // 1000 AS out_w,
        (height * ratio_m) // 1000 AS out_h
      FROM r ORDER BY media_id"""))

  /** mm_frame_sample: every 10th frame index of a synthetic frame count
    * (n_chars div 100 frames) — the frame-sampling explode shape. */
  val mmFrameSample = QueryDef(
    "mm_frame_sample",
    (s, dir) => T(s, dir).documents
      .withColumn("n_frames", expr("n_chars div 100"))
      .filter(col("n_frames") > lit(0L))
      .select(col("doc_id").as("media_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(10L))).as("frame_idx"))
      .orderBy(col("media_id"), col("frame_idx")),
    oracle = Some("""
      SELECT doc_id AS media_id, unnest(range(0, n_chars // 100, 10)) AS frame_idx
      FROM documents WHERE n_chars // 100 > 0
      ORDER BY media_id, frame_idx"""))

  val defs: Seq[QueryDef] = Seq(mmIngest, mmFeatures, mmResize, mmFrameSample)
}
