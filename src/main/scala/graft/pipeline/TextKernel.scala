package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-sketch kernels, invoked via `StaticInvoke` so the call
  * is a plain static method inside whole-stage codegen (see
  * [[graft.geom.st]] for the pattern).
  *
  * The composed-expression forms of these sketches (sequence + transform +
  * md5 + slice + array_min) are higher-order functions — interpreted
  * per-element, with a fresh MessageDigest and a 32-char hex UTF8String
  * allocated per gram. At corpus scale that dominates the scan. These
  * kernels keep the exact same hash semantics (md5 over UTF8 bytes, hex
  * ordering) but reuse one digest instance per thread, compare raw digest
  * bytes (hex encoding of equal-length digests is order-preserving), and
  * hex-encode only the surviving sketch values.
  */
object TextKernel {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = HexChars((b(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(b(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic compare — the byte-level equivalent of
    * comparing the hex encodings as strings.
    */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** Winnowing sketch of `norm` (Schleimer/Wilkerson/Aiken local
    * fingerprinting): md5 over every k-char gram, minimum per sliding
    * window of `window` grams, distinct minima hex-encoded.
    *
    * Exactly mirrors the expression form
    * `array_distinct(transform(sequence(0, greatest(m - window, 0)),
    *    w => array_min(slice(gh, w + 1, window))))` over
    * `gh = transform(sequence(1, greatest(len - (k-1), 1)),
    *    i => md5(substr(norm, i, k)))`
    * including the short-document clamps (an empty document sketches to
    * {md5("")}), so the DuckDB oracle for q52 is unchanged.
    */
  def winnowing(norm: UTF8String, k: Int, window: Int): ArrayData = {
    val bytes = norm.getBytes // normalized text is ASCII (words() output)
    val len = bytes.length
    val m = math.max(len - (k - 1), 1)
    val md = mdLocal.get()
    val grams = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      md.reset()
      val gl = math.max(math.min(k, len - i), 0)
      md.update(bytes, i, gl)
      grams(i) = md.digest()
      i += 1
    }
    val nWin = math.max(m - window, 0) + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var w = 0
    while (w < nWin) {
      var best = grams(w)
      var j = w + 1
      val end = math.min(w + window, m)
      while (j < end) {
        if (less(grams(j), best)) best = grams(j)
        j += 1
      }
      seen.add(hex(best))
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature of one shingle: `numHashes` seeded digests
    * `md5(j + ":" + shingle)` hex-encoded — identical values to the
    * expression form, one reused digest instance, one call per row
    * instead of `numHashes` HOF evaluations.
    */
  def minhashRow(shingle: UTF8String, numHashes: Int): ArrayData = {
    val body = shingle.getBytes
    val md = mdLocal.get()
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      md.reset()
      md.update(String.valueOf(j).getBytes)
      md.update(':'.toByte)
      md.update(body)
      out(j) = hex(md.digest())
      j += 1
    }
    new GenericArrayData(out)
  }
}
