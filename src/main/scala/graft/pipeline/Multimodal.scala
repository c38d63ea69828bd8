package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-wise with
  * `mapPartitions` (the Scala analog of `mapInPandas`).
  *
  * Image decode is REAL: `javax.imageio.ImageIO` ships with the JDK and
  * reads PNG/JPEG/BMP/GIF with no external dependency, so [[decodeBatch]]
  * parses actual image bytes and reports true dimensions + pixel
  * statistics. Payloads no reader recognizes fall back to the documented
  * deterministic stub (the FFI boundary where an exotic codec would plug
  * in) — the `decoder` output column says which path each row took.
  *
  * Scale shape: decode runs inside `mapPartitions`, so codec setup
  * amortizes per partition, nothing touches the driver, and the pattern
  * ("prune and plan on metadata columns, decode late and batched") is the
  * same one a 100 TB multimodal table needs.
  */
object Multimodal {

  // In-memory payloads must not round-trip through java.io.tmpdir on
  // executors (ImageIO's default stream cache is a temp FILE per read).
  ImageIO.setUseCache(false)

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

  // ================= REAL DECODE (JDK ImageIO) =================

  /** Encode a grayscale image whose pixel (x, y) is `gray(x, y) & 0xff`,
    * as real PNG bytes via `ImageIO.write` — the deterministic fixture
    * generator for decode gates (PNG is lossless, so the decoded raster
    * returns exactly these values).
    */
  def encodePng(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"encodePng: bad dims ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic test pattern: gray(x, y) = (x + 3*y) % 256 — uses both
    * coordinates, mirrorable in SQL with integer arithmetic.
    */
  def syntheticPng(width: Int, height: Int): Array[Byte] =
    encodePng(width, height, (x, y) => (x + 3 * y) % 256)

  /** Deterministic fixture dims for a media id: width in [16, 63] from the
    * id, height in [16, 63] from id/7 — both mirrorable as integer SQL.
    */
  def fixtureDims(id: Long): (Int, Int) =
    ((id % 48 + 16).toInt, ((id / 7) % 48 + 16).toInt)

  /** A real-PNG media table keyed by the ids of `docs`: each row's payload
    * is `ImageIO.write`-encoded with [[fixtureDims]] and the
    * [[syntheticPng]] pattern. Generated inside `mapPartitions` — the
    * fixture path exercises the exact write→read codec round trip.
    */
  def pngMediaTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h) = fixtureDims(id)
        val payload = syntheticPng(w, h)
        (id, "image", payload, payload.length)
      })
      .toDF("media_id", "media_type", "payload", "byte_size")
      .withColumn("meta", map(lit("src"), lit("synthetic-png")))
  }

  // ================= REAL AUDIO DECODE (JDK javax.sound) =================

  /** Encode 16-bit signed little-endian mono PCM samples as real WAV bytes
    * via `AudioSystem.write` — the audio analog of [[encodePng]]. WAV/PCM
    * support ships with the JDK, so decode needs no external codec.
    */
  def encodeWav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic fixture: frame count in [100, 499] from the id; sample
    * i = ((i * 37 + id * 11) mod 4001) - 2000 — integer arithmetic a SQL
    * oracle can replay exactly.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (id % 400 + 100).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (((i.toLong * 37 + id * 11) % 4001) - 2000).toShort
      i += 1
    }
    encodeWav(samples)
  }

  /** A real-WAV media table keyed by the ids of `docs` (the audio analog
    * of [[pngMediaTable]]): each payload is `AudioSystem.write`-encoded
    * PCM with the [[syntheticWav]] pattern.
    */
  def wavMediaTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val payload = syntheticWav(id)
        (id, "audio", payload, payload.length)
      })
      .toDF("media_id", "media_type", "payload", "byte_size")
      .withColumn("meta", map(lit("src"), lit("synthetic-wav")))
  }

  /** Decode one payload with javax.sound: Some((sampleRate, channels,
    * nFrames, sum, absSum)) over all 16-bit PCM samples (all channels),
    * or None when the bytes aren't a recognized 16-bit PCM audio file.
    */
  private[pipeline] def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val big = fmt.isBigEndian
          var sum = 0L
          var absSum = 0L
          var i = 0
          while (i + 1 < bytes.length) {
            val s =
              if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            sum += s
            absSum += math.abs(s.toLong)
            i += 2
          }
          Some((fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength, sum, absSum))
        }
      } finally ais.close()
    } catch { case _: Throwable => None }

  /** Batch audio stats over binary payloads: real javax.sound decode for
    * WAV/PCM (exact sample sums), stub byte stats otherwise — the audio
    * counterpart of [[decodeBatch]], same mapPartitions batching.
    * Output: (media_id, sample_rate, channels, n_frames, pcm_sum,
    * pcm_abs_sum, decoder ∈ {javasound, stub}).
    */
  def audioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodeAudio(payload) match {
          case Some((rate, ch, frames, sum, absSum)) =>
            (id, rate, ch, frames, Some(sum), Some(absSum), "javasound")
          case None =>
            val (w, h) = decodeStub(payload)
            (id, w, h, payload.length.toLong,
              None: Option[Long], None: Option[Long], "stub")
        }
      })
      .toDF("media_id", "sample_rate", "channels", "n_frames",
        "pcm_sum", "pcm_abs_sum", "decoder")
  }

  /** Decode one payload with ImageIO: Some((width, height, hist256)) where
    * hist256 is the 256-bin histogram of band 0 (gray channel for
    * grayscale; red for RGB), or None when no installed reader recognizes
    * the bytes.
    */
  private[pipeline] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Long])] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](256)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { hist(raster.getSample(x, y, 0) & 0xff) += 1; x += 1 }
          y += 1
        }
        Some((w, h, hist))
      }
    } catch { case _: Throwable => None }

  /** Near-dup PNG fixture: ids in the same group of `groupSize` share
    * dims and a group-keyed sawtooth base pattern
    * `(7x + 13y + 31g) % 256` (the `%256` wraps, unlike the smooth
    * [[syntheticPng]] gradient, so different groups hash far apart);
    * each variant `v = id % groupSize` additionally offsets the 2x2
    * top-left corner by `96v % 256` — exactly one sample point of the
    * 8x8 aHash grid — making within-group pairs land a small Hamming
    * distance apart. Every pixel is integer-replayable in SQL.
    */
  def variedPngMediaTable(docs: DataFrame, idCol: String = "doc_id",
      groupSize: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val g = id / groupSize
        val v = (id % groupSize).toInt
        val w = (g % 48 + 16).toInt
        val h = ((g / 7) % 48 + 16).toInt
        val payload = encodePng(w, h, (x, y) =>
          ((7 * x + 13 * y + 31 * g + (if (x < 2 && y < 2) 96L * v else 0L)) % 256).toInt)
        (id, "image", payload, payload.length)
      })
      .toDF("media_id", "media_type", "payload", "byte_size")
      .withColumn("meta", map(lit("src"), lit("synthetic-png-varied")))
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint over the REAL
    * decoded raster: nearest-neighbor downsample band 0 to an 8x8 grid
    * (sample at `x_i = i*w/8`, `y_j = j*h/8`, integer division), then bit
    * `j*8+i` is set iff `64 * p(x_i, y_j) > sum` of the 64 samples
    * (strict — ties clear; the integer cross-multiply avoids a float
    * mean). Identical images hash identically; small edits flip a few
    * bits, so Hamming distance is the near-dup signal — the image
    * counterpart of text SimHash, and the standard first pass of image
    * dedup over a crawl. One mapPartitions projection, no shuffle;
    * payloads no ImageIO reader accepts are dropped (a perceptual hash of
    * undecoded bytes would be noise). Output: (media_id, ahash, width,
    * height).
    */
  def imageAHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          try {
            val img = ImageIO.read(new ByteArrayInputStream(payload))
            if (img == null) None
            else {
              val raster = img.getRaster
              val w = img.getWidth
              val h = img.getHeight
              val px = new Array[Int](64)
              var sum = 0L
              var j = 0
              while (j < 8) {
                var i = 0
                while (i < 8) {
                  val p = raster.getSample(i * w / 8, j * h / 8, 0) & 0xff
                  px(j * 8 + i) = p
                  sum += p
                  i += 1
                }
                j += 1
              }
              var hash = 0L
              var b = 0
              while (b < 64) {
                if (64L * px(b) > sum) hash |= (1L << b)
                b += 1
              }
              Some((id, hash, w, h))
            }
          } catch { case _: Throwable => None }
        }
      }
      .toDF("media_id", "ahash", "width", "height")
  }

  /** Image near-duplicate candidate pairs: [[imageAHash]] fingerprints
    * through the shared 64-bit banded-Hamming machinery
    * ([[Dedup.fingerprintPairs64]] — four 16-bit bands, exact recall at
    * hamming <= 3, hot-bucket cap). Output: (id_a < id_b, hamming).
    */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Option[Int] = Some(Dedup.DefaultMaxBucketSize)): DataFrame =
    Dedup.fingerprintPairs64(imageAHash(media), "media_id", "ahash",
      maxHamming, maxBucketSize)

  // ============ DETERMINISTIC FALLBACK STUB (unknown formats) ============

  /** STUB "decode" for payloads no ImageIO reader accepts (exotic codecs —
    * the FFI boundary): width/height from byte statistics, deterministic
    * and oracle-checkable.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val n = payload.length
    (n % 512 + 1, (n / 7) % 512 + 1)
  }

  /** STUB "feature extraction": fixed-size float vector from byte histogram
    * moments (generic featurizer for undecodable payloads).
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

  /** Batch decode over binary payloads: ImageIO for real images, the stub
    * for unknown formats. Output: (media_id, width, height, n_bytes,
    * px_sum, px_sumsq, decoder) — pixel sums are exact longs over the gray
    * channel (null on the stub path); `decoder` ∈ {imageio, stub}.
    */
  def decodeBatch(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition batch loop — codec init amortizes across the
        // partition exactly here
        it.map { case (id, payload) =>
          decodeImage(payload) match {
            case Some((w, h, hist)) =>
              var sum = 0L
              var sumSq = 0L
              var v = 0
              while (v < 256) {
                sum += v.toLong * hist(v)
                sumSq += v.toLong * v * hist(v)
                v += 1
              }
              (id, w, h, payload.length, Some(sum), Some(sumSq), "imageio")
            case None =>
              val (w, h) = decodeStub(payload)
              (id, w, h, payload.length, None: Option[Long], None: Option[Long], "stub")
          }
        }
      }
      .toDF("media_id", "width", "height", "n_bytes", "px_sum", "px_sumsq", "decoder")
  }

  /** Binned gray-channel histogram per image (256/bins-wide buckets over
    * the REAL decoded raster): (media_id, bucket, n_px) rows, empty
    * buckets omitted; undecodable payloads contribute no rows.
    */
  def grayHistogram(media: DataFrame, bins: Int = 8): DataFrame = {
    require(bins >= 1 && 256 % bins == 0, s"grayHistogram: 256 % bins != 0 ($bins)")
    val width = 256 / bins
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeImage(payload).toSeq.flatMap { case (_, _, hist) =>
            (0 until bins).flatMap { b =>
              var n = 0L
              var v = b * width
              while (v < (b + 1) * width) { n += hist(v); v += 1 }
              if (n > 0) Some((id, b.toLong, n)) else None
            }
          }
        }
      }
      .toDF("media_id", "bucket", "n_px")
  }

  /** Batch feature extraction: real 8-bin gray histogram (as floats) for
    * decodable images, [[featureStub]] byte moments otherwise — fixed-dim
    * either way, so the embedding column is uniform downstream.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodeImage(payload) match {
          case Some((_, _, hist)) if 256 % dim == 0 =>
            val w = 256 / dim
            val out = new Array[Float](dim)
            var v = 0
            while (v < 256) { out(v / w) += hist(v); v += 1 }
            (id, out)
          case _ => (id, featureStub(payload, dim))
        }
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
