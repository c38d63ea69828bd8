package graft.pipeline

import org.apache.spark.sql.catalyst.util.ArrayData

/** Row-local ADC (asymmetric distance computation) scoring kernel for the
  * pivoted at-rest IVF-PQ layout (one code ARRAY per vector instead of m
  * (vec, sub, code) rows), invoked via `StaticInvoke` so the whole score
  * is one codegen'd static call per candidate row — no per-sub explode,
  * no (query, vec) groupBy exchange.
  *
  * Bit-exactness contract with the join+aggregate form it replaces
  * ([[Similarity.pqSearch]]'s scoring tail — still live on the recompute
  * paths, and pinned against this kernel by VectorIndexSpec's at-rest ==
  * recompute parity test):
  *
  *   - per-subspace distance: Σ (qᵢ−cᵢ)² accumulated LEFT-TO-RIGHT from
  *     0.0 (the [[graft.functions.VecDist2]] fold order);
  *   - the 6-decimal snap `floor(d*1e6 + 0.5)/1e6` (Spark's Floor on a
  *     double calls Math.floor and casts to long — replicated exactly);
  *   - the cross-subspace sum ran as exact DECIMAL(28,6): a snapped
  *     double `micro/1e6` casts to DECIMAL(28,6) with unscaled value
  *     exactly `micro` (its shortest decimal representation IS the
  *     6-decimal value for every |micro| this kernel can produce), so
  *     the decimal sum is the plain long sum of micros;
  *   - DECIMAL(28,6) → double: `BigDecimal(unscaled, 6).doubleValue`.
  *
  * Null/malformed handling mirrors the old pipeline's observable
  * behavior: a vector whose code array is missing a subspace (length ≠ m)
  * or carries a code absent from the codebook is NOT scored (the old
  * `count == m` filter dropped it); a duplicated (sub, code) codebook
  * entry also refuses to score (the old join fanned such vectors to
  * count > m — dropped); null ELEMENTS inside a vector throw loudly
  * (the VecFold convention — no legitimate embedding has one).
  */
object AdcKernel {

  private def find(cbSubs: ArrayData, cbCodes: ArrayData, n: Int,
      sub: Int, code: Long): Int = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val s = cbSubs.getInt(mid)
      val c = cbCodes.getLong(mid)
      if (s < sub || (s == sub && c < code)) lo = mid + 1
      else if (s > sub || c > code) hi = mid - 1
      else return mid
    }
    -1
  }

  /** ADC distance of one candidate vector to one query, or null when the
    * vector cannot be scored completely (missing/unknown/duplicated
    * codes) — the caller filters nulls, reproducing the old
    * `count == m` completeness gate.
    *
    * @param codes  the candidate's per-subspace code ids, position = sub
    * @param qv     the query embedding (m * subDim doubles; width is
    *               asserted by the caller before the join)
    * @param cbSubs aligned codebook keys, sorted by (sub, code)
    * @param cbCodes aligned codebook keys, sorted by (sub, code)
    * @param cbFlat codebook subvectors flattened in the same order
    *               (entry i occupies [i*subDim, (i+1)*subDim))
    */
  def adcSum(codes: ArrayData, qv: ArrayData, cbSubs: ArrayData,
      cbCodes: ArrayData, cbFlat: ArrayData, m: Int,
      subDim: Int): java.lang.Double = {
    if (codes.numElements() != m) return null
    val n = cbSubs.numElements()
    if (cbCodes.numElements() != n || cbFlat.numElements() != n.toLong * subDim)
      throw new IllegalArgumentException(
        s"adcSum: misaligned codebook arrays ($n keys, " +
          s"${cbFlat.numElements()} flattened dims, subDim $subDim)")
    if (qv.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"adcSum: query width ${qv.numElements()} != m*subDim (${m * subDim})")
    var micros = 0L
    var sub = 0
    while (sub < m) {
      if (codes.isNullAt(sub)) return null
      val code = codes.getLong(sub)
      val idx = find(cbSubs, cbCodes, n, sub, code)
      if (idx < 0) return null
      // a duplicated (sub, code) codebook entry fanned the old join out to
      // count > m — such vectors were dropped; refuse to score them here too
      if ((idx > 0 && cbSubs.getInt(idx - 1) == sub && cbCodes.getLong(idx - 1) == code) ||
          (idx + 1 < n && cbSubs.getInt(idx + 1) == sub && cbCodes.getLong(idx + 1) == code))
        return null
      var d = 0.0
      var i = 0
      val qOff = sub * subDim
      val cOff = idx * subDim
      while (i < subDim) {
        if (qv.isNullAt(qOff + i) || cbFlat.isNullAt(cOff + i))
          throw new IllegalArgumentException(
            s"adcSum: null element at dim $i (vectors must be dense)")
        val t = qv.getDouble(qOff + i) - cbFlat.getDouble(cOff + i)
        d += t * t
        i += 1
      }
      micros += Math.floor(d * 1e6 + 0.5).toLong
      sub += 1
    }
    java.lang.Double.valueOf(
      new java.math.BigDecimal(java.math.BigInteger.valueOf(micros), 6)
        .doubleValue())
  }
}
