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

  /** Big-endian 32-bit word at `off` of a digest, as a non-negative long —
    * numerically identical to `CAST('0x' || substr(md5hex, 2*off+1, 8) AS
    * BIGINT)`, the SQL mirror the oracles use.
    */
  private def word32(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)

  /** MinHash values of one shingle under the one-digest double-hashing
    * family (Kirsch & Mitzenmacher, ESA 2006 — the standard way to get k
    * hash functions from one): md5 the shingle ONCE, take the digest's
    * first two 32-bit words (w1, w2), and h_j = (w1 + j*w2) mod 2^32.
    * One digest instead of `numHashes` seeded digests per shingle — the
    * digest loop was the dominant cost of the whole LSH pipeline — and
    * exactly mirrorable in SQL via hex substrings of md5(s) in BIGINT
    * arithmetic (all values < 2^36, exact).
    */
  def minhashRow(shingle: UTF8String, numHashes: Int): ArrayData = {
    val md = mdLocal.get()
    md.reset()
    val dig = md.digest(shingle.getBytes)
    val w1 = word32(dig, 0)
    // Known trade-off: when w2 == 0 (probability 2^-32 per distinct
    // shingle) all h_j collapse to w1 for that shingle, slightly
    // correlating bands. The standard mitigation forces w2 odd (w2 | 1),
    // but the family is oracle-pinned (exact BIGINT mirrors in the DuckDB
    // SQL) — at realistic corpus sizes the collision risk is negligible,
    // so we keep the plain form rather than break every mirror.
    val w2 = word32(dig, 4)
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      out(j) = (w1 + j * w2) % 4294967296L
      j += 1
    }
    new GenericArrayData(out)
  }

  /** All four Gopher-style repetition signals of one document in a single
    * pass: (dup_line_frac, dup_line_char_frac, top_2gram_char_frac,
    * dup_5gram_frac), unrounded. Replaces three explode + double-aggregate
    * pipelines (line counts, 2-gram counts, 5-gram counts) re-joined on
    * doc id with a shuffle-free projection.
    *
    * Semantics mirror the aggregate form exactly: lines = java-regex split
    * on \n, UTF8String.trim, code-point lengths, empty lines dropped;
    * grams from the pre-normalized word string; the top 2-gram ties break
    * on (count, shingle) max — binary string order, identical to the
    * max(struct(c, shingle)) aggregate for the ASCII-only normalized
    * vocabulary; ratios are integer-exact longs divided as doubles, the
    * same promotion SQL's CAST(... AS DOUBLE)/BIGINT performs. Documents
    * without lines/grams yield 0.0, matching the left-join + coalesce.
    */
  def repetitionSignals(text: UTF8String, norm: UTF8String): ArrayData = {
    // ---- line multiset ----
    val lineCounts = new java.util.HashMap[UTF8String, Array[Long]]()
    text.toString.split("\n", -1).foreach { raw =>
      val u = UTF8String.fromString(raw).trim()
      if (u.numChars > 0) {
        val e = lineCounts.get(u)
        if (e == null) lineCounts.put(u, Array(1L, u.numChars.toLong))
        else e(0) += 1
      }
    }
    var sumC = 0L; var nDistinct = 0L; var dupChars = 0L; var allChars = 0L
    val it = lineCounts.values().iterator()
    while (it.hasNext) {
      val e = it.next(); val c = e(0); val len = e(1)
      sumC += c; nDistinct += 1
      dupChars += (c - 1) * len
      allChars += c * len
    }
    val dupLineFrac = if (sumC == 0) 0.0 else (sumC - nDistinct).toDouble / sumC
    val dupLineCharFrac = if (allChars == 0) 0.0 else dupChars.toDouble / allChars

    // ---- word grams ----
    val words = norm.toString.split(' ')
    def gramCounts(k: Int): java.util.HashMap[String, Array[Long]] = {
      val m = new java.util.HashMap[String, Array[Long]]()
      val n = words.length - k + 1
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < n) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val s = sb.toString
        val e = m.get(s)
        if (e == null) m.put(s, Array(1L)) else e(0) += 1
        i += 1
      }
      m
    }
    val g2 = gramCounts(2)
    var topC = 0L; var topSh: String = null
    val it2 = g2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next(); val c = e.getValue()(0)
      if (c > topC || (c == topC && (topSh == null || e.getKey.compareTo(topSh) > 0))) {
        topC = c; topSh = e.getKey
      }
    }
    val normLen = norm.numChars.toLong
    val top2Frac = if (topSh == null) 0.0
      else (topC * topSh.length).toDouble / math.max(normLen, 1L)

    val g5 = gramCounts(5)
    var dup5 = 0L; var sum5 = 0L
    val it5 = g5.values().iterator()
    while (it5.hasNext) {
      val c = it5.next()(0)
      sum5 += c
      if (c > 1) dup5 += c
    }
    val dup5Frac = if (sum5 == 0) 0.0 else dup5.toDouble / sum5

    new GenericArrayData(Array[Any](dupLineFrac, dupLineCharFrac, top2Frac, dup5Frac))
  }

  /** Distinct k-word shingles of a pre-normalized document (single-space
    * separated words, the output of `Dedup.words` re-joined): shingle i =
    * words[i..i+k-1] joined by spaces, first occurrence order, duplicates
    * dropped. One pass per document — replaces the explode + window-lead +
    * global DISTINCT pipeline (a full (id, shingle) exchange) with a
    * shuffle-free projection. Fewer than k words -> empty array.
    */
  def distinctShingles(norm: UTF8String, k: Int): ArrayData = {
    val words = norm.toString.split(' ')
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** SimHash 16-bit fingerprint of a pre-normalized document (single-space
    * separated words, the output of `Dedup.words` re-joined): bit j is the
    * majority vote over word OCCURRENCES of the parity of hex digit j of
    * md5(word) — +1 when odd, -1 when even; ties and negative sums leave
    * the bit 0. Value-identical to the explode + 16-column aggregate form
    * (including the empty-document case, where the normalized text is ""
    * and the single empty-string "word" is hashed), but one static call
    * per document: a shuffle-free projection instead of explode + one
    * partial aggregation per doc. Hex digit j is nibble j of the digest;
    * its parity is the nibble's low bit.
    */
  def simhashDoc(norm: UTF8String): Int = {
    val words = norm.toString.split(' ')
    val votes = new Array[Int](16)
    val md = mdLocal.get()
    var i = 0
    while (i < words.length) {
      md.reset()
      val dig = md.digest(words(i).getBytes("UTF-8"))
      var j = 0
      while (j < 16) {
        val nib = if ((j & 1) == 0) (dig(j >> 1) >> 4) & 0xf else dig(j >> 1) & 0xf
        if ((nib & 1) == 1) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0
    var j = 0
    while (j < 16) { if (votes(j) > 0) fp |= 1 << j; j += 1 }
    fp
  }

  /** 64-bit SimHash fingerprint — the production fingerprint width (the
    * 16-bit form above keeps its oracle-pinned gate; at corpus scale 2^16
    * distinct values collide constantly, while 2^64 makes hamming distance
    * a meaningful near-dup signal). Bit j is the majority vote over word
    * OCCURRENCES of bit (j mod 4) of hex digit (j div 4) of md5(word) —
    * +1 when set, -1 when clear; ties and negative sums leave the bit 0.
    * Same per-doc single-static-call contract as [[simhashDoc]].
    */
  def simhash64Doc(norm: UTF8String): Long = {
    val words = norm.toString.split(' ')
    val votes = new Array[Int](64)
    val md = mdLocal.get()
    var i = 0
    while (i < words.length) {
      md.reset()
      val dig = md.digest(words(i).getBytes("UTF-8"))
      var j = 0
      while (j < 64) {
        val nibIdx = j >> 2
        val nib = if ((nibIdx & 1) == 0) (dig(nibIdx >> 1) >> 4) & 0xf else dig(nibIdx >> 1) & 0xf
        if (((nib >> (j & 3)) & 1) == 1) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  /** Whole-document MinHash signature under the one-digest double-hashing
    * family (see [[minhashRow]]): per distinct k-word shingle, md5 ONCE,
    * take the digest's first two 32-bit words (w1, w2), and fold
    * h_j = (w1 + j*w2) mod 2^32 into the per-permutation minima —
    * identical values to aggregating [[minhashRow]] over shingle rows
    * (the min over the shingle MULTISET equals the min over its distinct
    * set, so hashing each distinct shingle once is a pure saving).
    * Computed in one static call per document: minhash goes from explode +
    * window + groupBy (two wide stages) to a shuffle-free projection.
    * Returns null when the document has no shingles (< k words) — the same
    * docs the row form drops at the aggregate.
    *
    * CAUTION: the family is oracle-pinned — the DuckDB mirrors in
    * PipelinePack/CorpusPack implement the same hex-substring BIGINT
    * arithmetic; any change here must change them in lockstep.
    */
  def minhashDoc(norm: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val words = norm.toString.split(' ')
    val n = words.length - k + 1
    if (n <= 0) return null
    val seen = new java.util.HashSet[String]()
    val md = mdLocal.get()
    // per-permutation minima under the [[minhashRow]] double-hashing
    // family: ONE digest per distinct shingle, h_j = (w1 + j*w2) mod 2^32
    val best = new Array[Long](numHashes)
    java.util.Arrays.fill(best, Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        md.reset()
        val dig = md.digest(shingle.getBytes("UTF-8"))
        val w1 = word32(dig, 0)
        val w2 = word32(dig, 4) // w2 == 0 degeneracy: see note in minhashRow
        var h = 0
        while (h < numHashes) {
          val v = (w1 + h * w2) % 4294967296L
          if (v < best(h)) best(h) = v
          h += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) { out(h) = best(h); h += 1 }
    new GenericArrayData(out)
  }

  /** Parsed BPE merge models keyed by their spec string. The spec is a
    * query-literal (one trained model baked into the plan), so this map
    * holds O(distinct models) entries per executor — like a broadcast.
    */
  private val bpeModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[String]]]()

  private def bpeModel(spec: String): Array[Array[String]] = {
    var m = bpeModelCache.get(spec)
    if (m == null) {
      m =
        if (spec.isEmpty) Array.empty[Array[String]]
        else spec.split('\n').map { line =>
          val i = line.indexOf(' ')
          require(i > 0 && i < line.length - 1, s"bad BPE merge spec line: '$line'")
          Array(line.substring(0, i), line.substring(i + 1))
        }
      bpeModelCache.putIfAbsent(spec, m)
    }
    m
  }

  /** BPE-segment one normalized document (space-joined `[a-z0-9]+` words)
    * under a trained merge model and return `[n_words, n_pieces]`.
    *
    * `mergesSpec` is newline-separated "lhs rhs" rules in rank order
    * (parsed once per model per executor via [[bpeModel]]). Per word:
    * symbols start as single chars (ASCII by the tokenizer's contract);
    * each rule runs one greedy non-overlapping left-to-right pass fusing
    * adjacent (lhs, rhs) into lhs+rhs — bit-identical to the
    * `aggregate`-fold form this kernel replaces
    * ([[TextAnalysis.bpeMergePass]]), which as a HigherOrderFunction chain
    * was CodegenFallback: interpreted per symbol per rule per word, it
    * dominated the corpus scan (~1.4 ms/doc measured). One static call
    * per doc inside whole-stage codegen instead.
    */
  def bpeSegmentDoc(norm: UTF8String, mergesSpec: UTF8String): ArrayData = {
    val merges = bpeModel(mergesSpec.toString)
    val s = norm.toString
    var nWords = 0L
    var nPieces = 0L
    var start = 0
    val len = s.length
    val buf = new java.util.ArrayList[String](32)
    while (start <= len) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = len
      if (end > start) {
        nWords += 1
        buf.clear()
        var i = start
        while (i < end) { buf.add(String.valueOf(s.charAt(i))); i += 1 }
        var r = 0
        while (r < merges.length) {
          val a = merges(r)(0)
          val b = merges(r)(1)
          // greedy left-to-right non-overlapping pass, in place: `w` is the
          // write cursor; a fused symbol (a+b) can't re-match as `a`
          var w = 0
          var j = 0
          while (j < buf.size()) {
            val sym = buf.get(j)
            if (w > 0 && buf.get(w - 1) == a && sym == b) buf.set(w - 1, a + b)
            else { buf.set(w, sym); w += 1 }
            j += 1
          }
          while (buf.size() > w) buf.remove(buf.size() - 1)
          r += 1
        }
        nPieces += buf.size()
      }
      start = end + 1
    }
    new GenericArrayData(Array[Any](nWords, nPieces))
  }

  /** The <= d-deletion neighborhood of a string (FastSS/SymSpell key
    * set): the string itself plus every DISTINCT variant reachable by
    * deleting up to d characters (code-point-aware). One static call per
    * term inside whole-stage codegen — the composed
    * transform/sequence/substr/array_distinct form it replaces was a
    * CodegenFallback HOF chain, interpreted per character per level
    * (len^d work, the dominant cost of every FastSS expansion). BFS over
    * deletions with a seen-set, so each variant is produced and expanded
    * once — same distinct set as the level-wise array_distinct fold.
    */
  def deletionNeighborhood(s: UTF8String, d: Int): ArrayData = {
    val str = s.toString
    val out = new java.util.LinkedHashSet[String]()
    out.add(str)
    var cur: List[Array[Int]] = List(str.codePoints().toArray)
    var k = 0
    while (k < d && cur.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer.empty[Array[Int]]
      for (x <- cur; i <- 0 until x.length) {
        val y = new Array[Int](x.length - 1)
        System.arraycopy(x, 0, y, 0, i)
        System.arraycopy(x, i + 1, y, i, x.length - i - 1)
        val ys = new String(y, 0, y.length)
        if (out.add(ys)) next += y
      }
      cur = next.toList
      k += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  /** Unicode NFC canonical composition (UAX #15, via the JDK's
    * `java.text.Normalizer` tables): "é" as e+U+0301 and as U+00E9 become
    * the same bytes, so content hashes, shingles, and equality joins see
    * one form — the normalization step multilingual web corpora need
    * BEFORE any hash-keyed dedup (the two encodings of the same rendered
    * text would otherwise never collide). The all-ASCII common case takes
    * the `isNormalized` fast path: a scan, no allocation, input returned
    * as-is.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private val deflaterLocal = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true) // raw deflate, fixed level 6
  }

  /** DEFLATE compression ratio — the information-density quality signal
    * (Gopher-family filters): machine-generated boilerplate, keyword
    * stuffing and repeated spans compress far below natural prose, and
    * the ratio catches repetition patterns n-gram rules miss. Fixed
    * level-6 raw deflate, one thread-local Deflater reused per thread
    * (allocation-free on the scan path); ratio = compressedBytes /
    * inputBytes on the UTF-8 bytes, 6-dec snapped; empty input → 0.
    * Deterministic per zlib build — the JDK bundles its own — so specs
    * pin behavior; no cross-engine oracle exists (DuckDB has no deflate
    * surface), which keeps this SPEC-verified like the streaming ops.
    */
  def deflateRatio(s: UTF8String): Double = {
    val in = s.getBytes
    if (in.length == 0) return 0.0
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](1024)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    math.floor(out.toDouble / in.length * 1e6 + 0.5) / 1e6
  }

  /** Luhn checksum validation (ISO/IEC 7812) — the arithmetic gate that
    * separates a real payment-card number from the 13-19-digit noise a
    * regex alone flags (phone numbers, order ids, timestamps): from the
    * RIGHT, double every second digit, fold >9 back by subtracting 9, and
    * the sum must divide by 10. A PII redaction pass keyed on regex hits
    * alone over-redacts ~10x; Luhn keeps only the ~1-in-10 runs that
    * could be cards. Returns false for anything not a pure 13-19-digit
    * string.
    */
  def luhnValid(s: UTF8String): Boolean = {
    val str = s.toString
    val n = str.length
    if (n < 13 || n > 19) return false
    var sum = 0
    var i = 0
    while (i < n) {
      val ch = str.charAt(n - 1 - i)
      if (ch < '0' || ch > '9') return false
      var d = ch - '0'
      if (i % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      i += 1
    }
    sum % 10 == 0
  }

  /** Accent folding — strip diacritical marks while keeping the base
    * letters (café→cafe, Müller→Muller, łódź→łodz): the match-key
    * normalization record linkage and search indexing need ABOVE [[nfc]]
    * (NFC makes equal text hash equal; folding makes DIFFERENTLY-accented
    * text match). Algorithm = NFD decomposition, drop all mark characters
    * (Mn/Mc/Me — utf8proc's STRIPMARK set, which is what DuckDB's
    * `strip_accents` uses), NFC recompose. Characters that are not
    * base+mark sequences pass through UNCHANGED (Æ, ß, Đ, ligatures, CJK)
    * — folding is not transliteration. ASCII takes a scan-only fast path.
    */
  def foldAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) >= 0x80) i = Int.MaxValue else i += 1
    }
    if (i != Int.MaxValue) return s // pure ASCII: nothing to fold
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val ch = nfd.charAt(j)
      val t = Character.getType(ch)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
        t != Character.ENCLOSING_MARK) sb.append(ch)
      j += 1
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  /** Jaro-Winkler similarity (Winkler 1990) — the record-linkage string
    * score `levenshtein` can't replace: transposition-tolerant, short-
    * string-calibrated, prefix-boosted (names, usernames, addresses).
    * Textbook Jaro: match window = max(len)/2 − 1, greedy left-to-right
    * matching, transpositions = half the out-of-order matches,
    * jaro = (m/|a| + m/|b| + (m−t)/m) / 3; Winkler boost
    * jaro + ℓ·0.1·(1−jaro) with ℓ = common prefix ≤ 4, applied only when
    * jaro > 0.7 (the RapidFuzz/DuckDB convention, which also returns 0
    * when either string is empty — some libraries return 1 for two
    * empties; the q275 gate pins the DuckDB convention). Compares UTF-16
    * units: identical to codepoint comparison on BMP text; supplementary-
    * plane text counts surrogate pairs as two units.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString; val t = b.toString
    val la = s.length; val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val sMatch = new Array[Boolean](la)
    val tMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0; var trans = 0
    i = 0
    while (i < la) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - trans / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val lmax = math.min(4, math.min(la, lb))
      var l = 0
      while (l < lmax && s.charAt(l) == t.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  private val NonAlnum = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** The shared [[graft.pipeline.Dedup.words]] tokenizer as a kernel —
    * byte-for-byte the expression chain's semantics: UTF8String
    * lowercasing (what Spark's `lower` calls), `[^a-z0-9]+` collapsed to
    * single spaces via java.util.regex (what `regexp_replace` uses),
    * space-trim, single-space split, empties dropped.
    */
  private def wordsOf(s: UTF8String): Array[String] = {
    val norm = NonAlnum.matcher(s.toLowerCase.toString).replaceAll(" ").trim
    if (norm.isEmpty) new Array[String](0) else norm.split(" ")
  }

  /** n-gram counts (gram = n tokens joined by spaces) for n = 1..maxN.
    * One map per n; linear in tokens.
    */
  private def gramCounts(toks: Array[String], n: Int)
      : java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder()
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val g = sb.toString
      val e = m.get(g)
      if (e == null) m.put(g, Array(1L)) else e(0) += 1L
      i += 1
    }
    m
  }

  /** BLEU of one (candidate, reference) pair in a single row-local pass —
    * candidate and reference live on the SAME row, so clipped-precision
    * BLEU needs no token explode, no per-doc window and no gram-keyed
    * join (the aggregation form shuffled every n-gram of the corpus
    * twice for a value computable inside the row's own task).
    *
    * Bit-exactness contract with the aggregation form it replaces (and
    * with the DuckDB oracle): the clipped/total counts are exact longs
    * (order-free), and the float tail — log(m_n/t_n) summed in ascending
    * n, divided by maxN, exponentiated, scaled by the brevity penalty,
    * snapped by floor(x*1e6+0.5)/1e6 — runs the identical operation
    * sequence through java.lang.StrictMath, which is what Spark's
    * LOG/EXP codegen calls. Returns [cand_len, ref_len, bleu] (lens as
    * exact doubles; the caller casts back to int).
    */
  def bleuRow(cand: UTF8String, ref: UTF8String, maxN: Int): ArrayData = {
    // null-text rows reproduce the aggregation form it replaced:
    // size(words(NULL)) = -1 lengths, bleu 0.0 — not a NULLed-out row
    // (the call site invokes with propagateNull = false)
    if (cand == null || ref == null)
      return new GenericArrayData(Array[Any](
        (if (cand == null) -1 else wordsOf(cand).length).toDouble,
        (if (ref == null) -1 else wordsOf(ref).length).toDouble, 0.0))
    val c = wordsOf(cand)
    val r = wordsOf(ref)
    val candLen = c.length
    val refLen = r.length
    var allPos = true
    var logSum = 0.0
    var n = 1
    while (n <= maxN && allPos) {
      val cm = gramCounts(c, n)
      val rm = gramCounts(r, n)
      var m = 0L
      var t = 0L
      val it = cm.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cc = e.getValue()(0)
        t += cc
        val rc = rm.get(e.getKey)
        if (rc != null) m += math.min(cc, rc(0))
      }
      if (m <= 0L || t <= 0L) allPos = false
      else logSum += java.lang.StrictMath.log(m.toDouble / t.toDouble)
      n += 1
    }
    val bleu =
      if (candLen == 0 || !allPos) 0.0
      else {
        val bp =
          if (candLen >= refLen) 1.0
          else java.lang.StrictMath.exp(1.0 - refLen.toDouble / candLen.toDouble)
        val x = bp * java.lang.StrictMath.exp(logSum / maxN)
        math.floor(x * 1e6 + 0.5) / 1e6
      }
    new GenericArrayData(Array[Any](candLen.toDouble, refLen.toDouble, bleu))
  }
}
