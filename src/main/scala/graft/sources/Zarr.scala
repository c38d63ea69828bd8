package graft.sources

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** Zarr v2 chunk-store primitives: `.zarray` metadata, dtype codecs, and
  * chunk (de)compression — everything needed to read/write OME-NGFF raster
  * chunks from executor tasks without any zarr library.
  *
  * Format references (all public): the zarr v2 storage spec
  * (`.zarray` JSON fields, C-order chunk encoding, `dimension_separator`),
  * and the c-blosc1 container header for reading blosc-compressed chunks
  * (the numcodecs default in real-world OME-zarr stores, e.g. what
  * `reference/src/spatialdata/_io/io_raster.py:383-393` writes via
  * `numcodecs.Blosc`).
  *
  * Write path emits `zlib` (java.util.zip), `zstd` (zstd-jni, already on
  * Spark's classpath for parquet), or `blosc` frames (zstd/zlib inner
  * codec + byte-shuffle — the reference writers' numcodecs default); read
  * path additionally understands raw, gzip, and blosc1 frames with
  * lz4/zstd/zlib inner codecs.
  */
object Zarr {

  final case class Compressor(id: String, cname: String = "lz4",
      clevel: Int = 5, shuffle: Int = 1)

  /** Parsed `.zarray`. `shape`/`chunks` are C-order (slowest axis first).
    * `filters` carries codec ids only (the one supported filter, numcodecs
    * `vlen-utf8`, has no parameters).
    */
  final case class ArrayMeta(
      shape: Seq[Int],
      chunks: Seq[Int],
      dtype: String,
      compressor: Option[Compressor],
      fillValue: Double,
      order: String,
      dimSeparator: String,
      filters: Seq[String] = Nil) {
    require(order == "C", s"only C-order zarr supported, got '$order'")
    /** chunk-grid extent per axis: ceil(shape / chunks) */
    def gridShape: Seq[Int] =
      shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    def chunkKey(idx: Seq[Int]): String = idx.mkString(dimSeparator)
  }

  // ---- .zarray JSON ----

  def parseArrayMeta(json: String): ArrayMeta = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val comp = (j \ "compressor") match {
      case JNothing | JNull => None
      case c => Some(Compressor(
        id = (c \ "id").extract[String],
        cname = (c \ "cname").extractOrElse[String]("lz4"),
        clevel = (c \ "clevel").extractOrElse[Int]((c \ "level").extractOrElse[Int](5)),
        shuffle = (c \ "shuffle").extractOrElse[Int](0)))
    }
    val fill = (j \ "fill_value") match {
      case JNothing | JNull => 0.0
      case JString("NaN") => Double.NaN
      case v => v.extract[Double]
    }
    val filters = (j \ "filters") match {
      case JArray(fs) => fs.map(f => (f \ "id").extract[String])
      case _ => Nil
    }
    ArrayMeta(
      shape = (j \ "shape").extract[Seq[Int]],
      chunks = (j \ "chunks").extract[Seq[Int]],
      dtype = (j \ "dtype").extract[String],
      compressor = comp,
      fillValue = fill,
      order = (j \ "order").extractOrElse[String]("C"),
      dimSeparator = (j \ "dimension_separator").extractOrElse[String]("."),
      filters = filters)
  }

  def arrayMetaJson(m: ArrayMeta): String = {
    val comp: JValue = m.compressor match {
      case None => JNull
      case Some(c) if c.id == "zlib" || c.id == "gzip" =>
        ("id" -> c.id) ~ ("level" -> c.clevel)
      case Some(c) if c.id == "zstd" =>
        ("id" -> c.id) ~ ("level" -> c.clevel)
      case Some(c) =>
        ("id" -> c.id) ~ ("cname" -> c.cname) ~ ("clevel" -> c.clevel) ~
          ("shuffle" -> c.shuffle)
    }
    val root: JValue =
      ("zarr_format" -> 2) ~
        ("shape" -> m.shape) ~
        ("chunks" -> m.chunks) ~
        ("dtype" -> m.dtype) ~
        ("compressor" -> comp) ~
        ("fill_value" -> (if (m.fillValue.isNaN) JString("NaN"): JValue
                          else JDouble(m.fillValue): JValue)) ~
        ("order" -> m.order) ~
        ("filters" -> JNull) ~
        ("dimension_separator" -> m.dimSeparator)
    JsonMethods.pretty(JsonMethods.render(root))
  }

  // ---- dtype codec (C-order flat buffer <-> Array[Double]) ----

  def bytesPerElement(dtype: String): Int = dtype.substring(2).toInt match {
    case n => n
  }

  private def byteOrder(dtype: String): java.nio.ByteOrder = dtype.charAt(0) match {
    case '>' => java.nio.ByteOrder.BIG_ENDIAN
    case _ => java.nio.ByteOrder.LITTLE_ENDIAN // '<' and '|'
  }

  /** Decode a raw (already-decompressed) C-order chunk buffer. */
  def decodeValues(bytes: Array[Byte], dtype: String, n: Int): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(byteOrder(dtype))
    val kind = dtype.charAt(1)
    val width = bytesPerElement(dtype)
    val out = new Array[Double](n)
    var i = 0
    (kind, width) match {
      case ('u', 1) => while (i < n) { out(i) = bb.get(i) & 0xff; i += 1 }
      case ('i', 1) => while (i < n) { out(i) = bb.get(i).toDouble; i += 1 }
      case ('u', 2) => while (i < n) { out(i) = bb.getShort(i * 2) & 0xffff; i += 1 }
      case ('i', 2) => while (i < n) { out(i) = bb.getShort(i * 2).toDouble; i += 1 }
      case ('u', 4) => while (i < n) { out(i) = bb.getInt(i * 4) & 0xffffffffL; i += 1 }
      case ('i', 4) => while (i < n) { out(i) = bb.getInt(i * 4).toDouble; i += 1 }
      case ('i', 8) => while (i < n) { out(i) = bb.getLong(i * 8).toDouble; i += 1 }
      case ('u', 8) =>
        // values above Long.MaxValue must not decode as negative doubles
        while (i < n) {
          val l = bb.getLong(i * 8)
          out(i) = if (l >= 0) l.toDouble else l.toDouble + 1.8446744073709552e19
          i += 1
        }
      case ('f', 4) => while (i < n) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
      case ('f', 8) => while (i < n) { out(i) = bb.getDouble(i * 8); i += 1 }
      // numpy bool ('|b1'): one byte per element, nonzero = true
      case ('b', 1) => while (i < n) { out(i) = if (bb.get(i) != 0) 1.0 else 0.0; i += 1 }
      case other => sys.error(s"unsupported zarr dtype '$dtype'")
    }
    out
  }

  /** Encode values to a raw C-order chunk buffer. */
  def encodeValues(values: Array[Double], dtype: String): Array[Byte] = {
    val width = bytesPerElement(dtype)
    val bytes = new Array[Byte](values.length * width)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(byteOrder(dtype))
    val kind = dtype.charAt(1)
    var i = 0
    (kind, width) match {
      case ('u', 1) | ('i', 1) => while (i < values.length) { bb.put(i, values(i).toByte); i += 1 }
      case ('u', 2) | ('i', 2) => while (i < values.length) { bb.putShort(i * 2, values(i).toShort); i += 1 }
      case ('u', 4) | ('i', 4) => while (i < values.length) { bb.putInt(i * 4, values(i).toInt); i += 1 }
      case ('u', 8) | ('i', 8) => while (i < values.length) { bb.putLong(i * 8, values(i).toLong); i += 1 }
      case ('f', 4) => while (i < values.length) { bb.putFloat(i * 4, values(i).toFloat); i += 1 }
      case ('f', 8) => while (i < values.length) { bb.putDouble(i * 8, values(i)); i += 1 }
      case ('b', 1) => while (i < values.length) { bb.put(i, if (values(i) != 0.0) 1.toByte else 0.toByte); i += 1 }
      case other => sys.error(s"unsupported zarr dtype '$dtype'")
    }
    bytes
  }

  // ---- compression ----

  /** `typesize` matters only for blosc (byte-shuffle plane width); other
    * codecs ignore it.
    */
  def compress(raw: Array[Byte], compressor: Option[Compressor],
      typesize: Int = 1): Array[Byte] =
    compressor match {
      case None => raw
      case Some(Compressor("zlib", _, level, _)) => deflate(raw, level)
      case Some(Compressor("gzip", _, level, _)) =>
        val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
        val gz = new java.util.zip.GZIPOutputStream(bos) {
          `def`.setLevel(level)
        }
        gz.write(raw); gz.close()
        bos.toByteArray
      case Some(Compressor("zstd", _, level, _)) =>
        com.github.luben.zstd.Zstd.compress(raw, level)
      case Some(Compressor("blosc", cname, level, shuffle)) =>
        bloscEncode(raw, typesize, cname, level, shuffle)
      case Some(c) => sys.error(s"unsupported write compressor '${c.id}'")
    }

  private def deflate(raw: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def decompress(bytes: Array[Byte], compressor: Option[Compressor],
      nbytes: Int, typesize: Int): Array[Byte] =
    compressor match {
      case None => bytes
      case Some(Compressor("zlib", _, _, _)) => inflate(bytes, nbytes, raw = false)
      case Some(Compressor("gzip", _, _, _)) =>
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
        readFully(in, nbytes)
      case Some(Compressor("zstd", _, _, _)) =>
        com.github.luben.zstd.Zstd.decompress(bytes, nbytes)
      case Some(Compressor("blosc", _, _, _)) => bloscDecode(bytes, nbytes)
      case Some(c) => sys.error(s"unsupported read compressor '${c.id}'")
    }

  /** Decompress a chunk whose raw size is NOT known in advance (needed for
    * variable-length encodings like vlen-utf8, where the buffer is
    * `4 + sum(4 + len)` bytes rather than `chunks.product * width`).
    */
  def decompressAny(bytes: Array[Byte], compressor: Option[Compressor]): Array[Byte] =
    compressor match {
      case None => bytes
      case Some(Compressor("zlib", _, _, _)) =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(bytes)
        val bos = new java.io.ByteArrayOutputStream(bytes.length * 4 + 64)
        val buf = new Array[Byte](8192)
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(buf)
          if (n > 0) bos.write(buf, 0, n)
        }
        inf.end()
        bos.toByteArray
      case Some(Compressor("gzip", _, _, _)) =>
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
        val bos = new java.io.ByteArrayOutputStream(bytes.length * 4 + 64)
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      case Some(Compressor("zstd", _, _, _)) =>
        val size = com.github.luben.zstd.Zstd.getFrameContentSize(bytes)
        require(size > 0 && size < Int.MaxValue, s"zstd frame without content size")
        com.github.luben.zstd.Zstd.decompress(bytes, size.toInt)
      case Some(Compressor("blosc", _, _, _)) =>
        val nbytes = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4)
        bloscDecode(bytes, nbytes)
      case Some(c) => sys.error(s"unsupported read compressor '${c.id}'")
    }

  /** Decode a numcodecs `vlen-utf8` buffer: uint32-LE item count, then per
    * item uint32-LE byte length + UTF-8 payload (numcodecs vlen spec).
    */
  def vlenUtf8Decode(raw: Array[Byte]): Array[String] = {
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      out(i) = new String(b, "UTF-8")
      i += 1
    }
    out
  }

  /** Encode strings as a numcodecs `vlen-utf8` buffer (inverse of
    * [[vlenUtf8Decode]]); nulls encode as empty strings.
    */
  def vlenUtf8Encode(items: Array[String]): Array[Byte] = {
    val payloads = items.map(s => (if (s == null) "" else s).getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.allocate(4 + payloads.map(_.length + 4).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(items.length)
    payloads.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  private def inflate(bytes: Array[Byte], nbytes: Int, raw: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(raw)
    inf.setInput(bytes)
    val out = new Array[Byte](nbytes)
    var off = 0
    while (off < nbytes && !inf.finished()) off += inf.inflate(out, off, nbytes - off)
    inf.end()
    require(off == nbytes, s"zlib chunk: expected $nbytes bytes, got $off")
    out
  }

  private def readFully(in: java.io.InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    var r = in.read(out, 0, n)
    while (r > 0 && off + r <= n) { off += r; r = in.read(out, off, n - off) }
    require(off == n, s"chunk stream: expected $n bytes, got $off")
    out
  }

  // ---- blosc1 container ----
  //
  // Layout (c-blosc README_HEADER, public):
  //   byte 0: format version; 1: codec-format version; 2: flags; 3: typesize
  //   4-7:  nbytes  (uncompressed size, int32 LE)
  //   8-11: blocksize (int32 LE)
  //   12-15: cbytes (total compressed size, int32 LE)
  // flags bit0 = byte-shuffle, bit1 = pure memcpy, bit2 = bit-shuffle,
  // bits 5-7 = codec id (0 blosclz, 1 lz4/lz4hc, 3 zlib, 5 zstd).
  // Non-memcpy payload: int32-LE offsets (one per block, relative to frame
  // start), each block = int32-LE compressed length + codec data; a block
  // whose compressed length equals its uncompressed length is stored raw.
  // Byte-shuffle transposes each block into `typesize` byte-planes.
  private[sources] def bloscDecode(frame: Array[Byte], expected: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.wrap(frame).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val flags = frame(2) & 0xff
    val typesize = frame(3) & 0xff
    val nbytes = bb.getInt(4)
    val blocksize = bb.getInt(8)
    require(nbytes == expected, s"blosc frame nbytes=$nbytes, expected $expected")
    val byteShuffle = (flags & 0x1) != 0
    val memcpy = (flags & 0x2) != 0
    val bitShuffle = (flags & 0x4) != 0
    require(!bitShuffle, "blosc bit-shuffle not supported")
    val codec = (flags >> 5) & 0x7
    val out = new Array[Byte](nbytes)
    if (memcpy) {
      System.arraycopy(frame, 16, out, 0, nbytes)
      return out
    }
    val nblocks = (nbytes + blocksize - 1) / blocksize
    var b = 0
    while (b < nblocks) {
      val bstart = bb.getInt(16 + 4 * b)
      val neblock = math.min(blocksize, nbytes - b * blocksize)
      val cbytesBlock = bb.getInt(bstart)
      val block = new Array[Byte](neblock)
      if (cbytesBlock == neblock) {
        System.arraycopy(frame, bstart + 4, block, 0, neblock)
      } else codec match {
        case 1 => // lz4 / lz4hc (block format)
          net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
            .decompress(frame, bstart + 4, cbytesBlock, block, 0, neblock)
        case 3 =>
          val dec = inflate(java.util.Arrays.copyOfRange(frame, bstart + 4,
            bstart + 4 + cbytesBlock), neblock, raw = false)
          System.arraycopy(dec, 0, block, 0, neblock)
        case 5 =>
          val dec = com.github.luben.zstd.Zstd.decompress(
            java.util.Arrays.copyOfRange(frame, bstart + 4, bstart + 4 + cbytesBlock), neblock)
          System.arraycopy(dec, 0, block, 0, neblock)
        case other => sys.error(s"unsupported blosc inner codec id $other")
      }
      val unshuffled =
        if (byteShuffle && typesize > 1 && neblock % typesize == 0)
          byteUnshuffle(block, typesize)
        else block
      System.arraycopy(unshuffled, 0, out, b * blocksize, neblock)
      b += 1
    }
    out
  }

  /** Encode a c-blosc1 frame (the inverse of [[bloscDecode]], same public
    * header layout): optional byte-shuffle, then per-block inner codec —
    * `zstd` (id 5) or `zlib` (id 3). Blocks carry an int32-LE compressed
    * length; a block that doesn't compress is stored raw
    * (clen == neblock), and a frame that doesn't beat raw+overhead falls
    * back to the pure-memcpy form — both per the c-blosc spec, so
    * numcodecs' Blosc (what the reference's writers default to,
    * io_raster.py:383-393) reads these frames back unchanged.
    */
  private[sources] def bloscEncode(raw: Array[Byte], typesize: Int,
      cname: String, clevel: Int, shuffle: Int): Array[Byte] = {
    val codecId = cname match {
      case "zstd" => 5
      case "zlib" => 3
      case other => sys.error(s"unsupported blosc write cname '$other'")
    }
    require(shuffle == 0 || shuffle == 1,
      s"only byte-shuffle (1) or none (0) supported on write, got $shuffle")
    val nbytes = raw.length
    require(nbytes > 0, "cannot blosc-encode an empty chunk")
    val ts = if (typesize >= 1 && typesize <= 255) typesize else 1
    val doShuffle = shuffle == 1 && ts > 1 && nbytes % ts == 0
    // bounded blocks (c-blosc style), kept a multiple of typesize so every
    // block byte-shuffles cleanly
    val maxBlock = 1 << 18
    var blocksize = math.min(nbytes, maxBlock)
    if (doShuffle && blocksize % ts != 0)
      blocksize = math.max(blocksize - blocksize % ts, ts)
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val payloads = new Array[Array[Byte]](nblocks)
    var b = 0
    while (b < nblocks) {
      val neblock = math.min(blocksize, nbytes - b * blocksize)
      val src = java.util.Arrays.copyOfRange(raw, b * blocksize, b * blocksize + neblock)
      val shuffled =
        if (doShuffle && neblock % ts == 0) byteShuffle(src, ts) else src
      val comp = codecId match {
        case 5 => com.github.luben.zstd.Zstd.compress(shuffled, clevel)
        case 3 => deflate(shuffled, clevel)
      }
      // incompressible block -> stored raw, signalled by clen == neblock
      payloads(b) = if (comp.length < neblock) comp else src
      b += 1
    }
    val headerLen = 16 + 4 * nblocks
    val total = headerLen + payloads.map(4 + _.length).sum
    val bb =
      if (total >= nbytes + 16) {
        // frame doesn't beat raw: pure-memcpy form (flags bit1), payload
        // unshuffled
        val out = java.nio.ByteBuffer.allocate(nbytes + 16)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.put(0, 2.toByte).put(1, 1.toByte)
          .put(2, (0x2 | (codecId << 5)).toByte).put(3, ts.toByte)
        out.putInt(4, nbytes).putInt(8, blocksize).putInt(12, nbytes + 16)
        out.position(16)
        out.put(raw)
        out
      } else {
        val out = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val flags = (if (doShuffle) 0x1 else 0x0) | (codecId << 5)
        out.put(0, 2.toByte).put(1, 1.toByte)
          .put(2, flags.toByte).put(3, ts.toByte)
        out.putInt(4, nbytes).putInt(8, blocksize).putInt(12, total)
        var off = headerLen
        var i = 0
        while (i < nblocks) {
          out.putInt(16 + 4 * i, off)
          // clen: compressed length, or == neblock when the block is raw
          out.putInt(off, payloads(i).length)
          out.position(off + 4)
          out.put(payloads(i))
          off += 4 + payloads(i).length
          i += 1
        }
        out
      }
    bb.array()
  }

  private[sources] def byteShuffle(block: Array[Byte], typesize: Int): Array[Byte] = {
    val nelem = block.length / typesize
    val out = new Array[Byte](block.length)
    var k = 0
    while (k < typesize) {
      var j = 0
      while (j < nelem) {
        out(k * nelem + j) = block(j * typesize + k)
        j += 1
      }
      k += 1
    }
    out
  }

  private[sources] def byteUnshuffle(block: Array[Byte], typesize: Int): Array[Byte] = {
    val nelem = block.length / typesize
    val out = new Array[Byte](block.length)
    var k = 0
    while (k < typesize) {
      var j = 0
      while (j < nelem) {
        out(j * typesize + k) = block(k * nelem + j)
        j += 1
      }
      k += 1
    }
    out
  }

  // ---- whole-chunk helpers ----

  /** Decompress + decode one stored chunk into doubles (full chunk extent,
    * C order).
    */
  def decodeChunk(stored: Array[Byte], m: ArrayMeta): Array[Double] = {
    val n = m.chunks.product
    val width = bytesPerElement(m.dtype)
    val raw = decompress(stored, m.compressor, n * width, width)
    decodeValues(raw, m.dtype, n)
  }

  /** Encode + compress doubles (full chunk extent, C order) for storage. */
  def encodeChunk(values: Array[Double], m: ArrayMeta): Array[Byte] = {
    require(values.length == m.chunks.product,
      s"chunk payload ${values.length} != ${m.chunks.product}")
    compress(encodeValues(values, m.dtype), m.compressor, bytesPerElement(m.dtype))
  }
}
