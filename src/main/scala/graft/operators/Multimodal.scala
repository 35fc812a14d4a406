package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the engine
  * as opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs as a per-partition batch transform (the Scala
  * analog of a pandas-batched UDF: one decoder instantiation per
  * partition, streaming row iterators, no driver involvement).
  *
  * The actual byte decoders (JPEG/PNG/audio codecs) are NOT available in
  * this environment — [[FakeDecoder]] is a clearly-marked deterministic
  * stand-in. The Spark-side contract (schema, batching, partitioning) is
  * real and tested; swapping in a real codec is a one-function change.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("declared_width", IntegerType),
    StructField("declared_height", IntegerType)))

  val featureType: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("checksum", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** Attach an opaque payload + metadata to a documents table (the harness
    * has no real image bytes; text bytes stand in — the engine treats them
    * as opaque either way).
    */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs
      .withColumn("media_bytes", col("text").cast("binary"))
      .withColumn("media_meta", struct(
        lit("image/fake").as("media_type"),
        octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("declared_width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("declared_height")))

  /** STUB decoder — deterministic fake standing in for an image codec.
    * Real deployments replace `decode` with e.g. a JNI JPEG decoder; the
    * signature (bytes → dims + feature vector) is the integration seam.
    */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte], w: Int, h: Int): Row = {
      var checksum = 0L
      var i = 0
      while (i < bytes.length) { checksum = (checksum * 31 + (bytes(i) & 0xff)) & 0xffffffffL; i += 1 }
      // fake 8-dim "embedding": byte histogram moments, deterministic
      val feats = new Array[Double](8)
      i = 0
      while (i < bytes.length) { feats(i % 8) += (bytes(i) & 0xff) / 255.0; i += 1 }
      Row(docId, bytes.length.toLong, checksum, w, h, feats.toSeq)
    }
  }

  /** Resize plan: pure-metadata transform computing target dimensions
    * with aspect-ratio-preserving fit (the actual pixel work happens in
    * the per-partition decode below; at plan level resize is just typed
    * column arithmetic — zero cost until decode).
    */
  def withResizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("media_meta.declared_width").cast("double")
    val h = col("media_meta.declared_height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    media.withColumn("resize_plan", struct(
      floor(w * scale).cast("int").as("target_width"),
      floor(h * scale).cast("int").as("target_height"),
      (scale < 1.0).as("needs_resize")))
  }

  /** Frame-sampling plan for video-like payloads: deterministic sample
    * offsets (every `stride`-th frame up to `maxFrames`), as typed
    * metadata the decoder consumes. Array arithmetic only.
    */
  def withFrameSamplePlan(media: DataFrame, declaredFramesCol: String,
      stride: Int, maxFrames: Int): DataFrame =
    media.withColumn("frame_sample_plan",
      slice(sequence(lit(0), greatest(col(declaredFramesCol) - 1, lit(0)),
        lit(stride)), 1, maxFrames))

  /** Per-partition batch decode: the mapPartitions boundary means one
    * decoder instance per partition and pipelined row streaming — the
    * idiomatic Spark shape for expensive per-row native work (and the
    * direct analog of `mapInPandas` batching).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureType)
    media
      .select(col("doc_id"), col("media_bytes"),
        col("media_meta.declared_width").as("w"),
        col("media_meta.declared_height").as("h"))
      .mapPartitions { rows =>
        // decoder init happens here, once per partition
        rows.map { r =>
          FakeDecoder.decode(r.getAs[Long]("doc_id"),
            r.getAs[Array[Byte]]("media_bytes"),
            r.getAs[Int]("w"), r.getAs[Int]("h"))
        }
      }(enc)
  }
}
