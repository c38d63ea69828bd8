package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-wise with
  * `mapPartitions` (the Scala analog of `mapInPandas`).
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB — the real codec
  * libraries are not in this container. Everything around it (schema,
  * batching, partitioning, output shape) is real and tested: swapping
  * `decodeStub` for a JNI/FFI decoder changes no plumbing.
  */
object Multimodal {

  /** Metadata-typed media schema: what a 100 TB multimodal table looks like
    * on disk — payload stays opaque binary; metadata columns drive pruning.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("byte_size", IntegerType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Wrap an arbitrary string column as a fake media payload table (for
    * plumbing tests: payload = UTF-8 bytes, deterministic).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadStrCol: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadStrCol).cast("binary").as("payload"),
      length(col(payloadStrCol)).cast("int").as("byte_size"),
      map(lit("src"), lit("synthetic")).as("meta"))

  // ================= DETERMINISTIC DECODE STUB =================
  // Real implementation would FFI into an image/audio codec. The stub
  // derives "decoded" dimensions and features purely from the payload
  // bytes so results are reproducible and oracle-checkable.
  // =============================================================

  /** STUB "decode": width/height from byte statistics. */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val n = payload.length
    (n % 512 + 1, (n / 7) % 512 + 1)
  }

  /** STUB "feature extraction": fixed-size float vector from byte histogram
    * moments.
    */
  def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Batch decode over binary payloads: schema/batching real, decode
    * stubbed. Output: (media_id, width, height, n_bytes).
    */
  def decodeBatch(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition batch loop — the real decoder would amortize codec
        // init across the partition exactly here
        it.map { case (id, payload) =>
          val (w, h) = decodeStub(payload)
          (id, w, h, payload.length)
        }
      }
      .toDF("media_id", "width", "height", "n_bytes")
  }

  /** Batch feature extraction: fixed-dim embedding per payload. */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        (id, featureStub(payload, dim))
      })
      .toDF("media_id", "features")
  }

  /** "Resize" planning: pure-metadata op computing target dims under a
    * max-edge constraint — runs as a column expression, no decode needed
    * (the scale-friendly pattern: prune/plan on metadata, decode late).
    */
  def resizePlan(decoded: DataFrame, maxEdge: Int): DataFrame = {
    val scale = least(
      lit(maxEdge).cast("double") / col("width"),
      lit(maxEdge).cast("double") / col("height"),
      lit(1.0))
    decoded
      .withColumn("target_w", ceil(col("width") * scale).cast("int"))
      .withColumn("target_h", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling plan for video-like payloads: every `stride`-th frame
    * index up to `nFrames` — an explode over a generated sequence (the
    * Spark-side shape of frame extraction; decode of each frame is the
    * same stub boundary).
    */
  def frameSamplePlan(media: DataFrame, nFrames: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0), lit((nFrames - 1) * stride), lit(stride))).as("frame_idx"))
}
