package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the native Catalyst expressions
  * ([[expressions]]). Each is bit-identical to the portable SQL
  * higher-order-function formulation in [[graft.operators.TextOps]] /
  * [[graft.operators.VectorOps]] (specs assert the equivalence), so the
  * DuckDB oracle twins keep working unchanged — the native path only
  * removes interpretation overhead: one virtual call per ROW instead of
  * per array element, a thread-local MessageDigest instead of per-call
  * allocation, and primitive accumulators instead of boxed lambdas.
  */
object Native {

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val Hex = "0123456789abcdef".getBytes

  /** Lowercase-hex md5 of `bytes` as ASCII bytes (32 chars). */
  def md5HexBytes(bytes: Array[Byte]): Array[Byte] = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((h(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(h(i) & 0xf)
      i += 1
    }
    out
  }

  /** Byte-wise compare of two ASCII-hex buffers (== UTF8String ordering
    * for pure-ASCII strings). */
  private def lt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      if (a(i) != b(i)) return (a(i) & 0xff) < (b(i) & 0xff)
      i += 1
    }
    a.length < b.length
  }

  /** MinHash signature: entry k = min over shingles of
    * `md5(k || '|' || shingle)` in lowercase hex — identical to
    * [[graft.operators.TextOps.minhashSignature]]. Empty input yields an
    * array of k nulls (as `array_min(array())` does in SQL).
    */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val out = new Array[AnyRef](k)
    var ki = 0
    while (ki < k) {
      val prefix = (ki.toString + "|").getBytes("UTF-8")
      var best: Array[Byte] = null
      var i = 0
      while (i < n) {
        // null elements skipped — md5(NULL) is NULL and array_min
        // ignores nulls in the SQL formulation.
        if (shingles.isNullAt(i)) { i += 1 }
        else {
        val s = shingles.getUTF8String(i).getBytes
        val buf = new Array[Byte](prefix.length + s.length)
        System.arraycopy(prefix, 0, buf, 0, prefix.length)
        System.arraycopy(s, 0, buf, prefix.length, s.length)
        val hx = md5HexBytes(buf)
        if (best == null || lt(hx, best)) best = hx
        i += 1
        }
      }
      out(ki) = if (best == null) null else UTF8String.fromBytes(best)
      ki += 1
    }
    new GenericArrayData(out)
  }

  private def hexVal(c: Byte): Int =
    if (c <= '9') c - '0' else c - 'a' + 10

  /** 32-bit SimHash of a feature array — identical to
    * [[graft.operators.TextOps.simhash32]]: bit j (emitted at output
    * position 31-j) comes from bit (3 - j%4) of hex digit j/4 of
    * `md5(feature)`, weighted +1/-1 and sign-thresholded.
    */
  def simhash32(features: ArrayData): Long = {
    val acc = new Array[Int](32)
    val n = features.numElements()
    var i = 0
    while (i < n) {
      if (features.isNullAt(i)) {
        // SQL formulation: md5(NULL) makes the membership CASE null,
        // which falls to the ELSE branch — a null feature contributes
        // -1 to every bit.
        var j = 0
        while (j < 32) { acc(j) -= 1; j += 1 }
      } else {
        val hx = md5HexBytes(features.getUTF8String(i).getBytes)
        var j = 0
        while (j < 32) {
          val digit = hexVal(hx(j >> 2))
          if (((digit >> (3 - (j & 3))) & 1) == 1) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 32) {
      if (acc(j) > 0) res |= 1L << (31 - j)
      j += 1
    }
    res
  }

  /** Sequential-order double dot product with the SQL fold's exact null
    * semantics: `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (acc,v)->acc+v)`
    * yields NULL when lengths differ (zip_with null-pads → null product →
    * null sum) or when any element is null. Same accumulation order as
    * the fold in [[graft.operators.VectorOps.dotApprox]], so the
    * optimizer rewrite ([[graft.plans.NativeKernelRules]]) is
    * result-identical, not just approximately equal. */
  def dotDoubleChecked(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
