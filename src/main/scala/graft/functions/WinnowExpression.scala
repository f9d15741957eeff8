package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints of a token array (Schleimer–Wilkerson–Aiken,
  * SIGMOD'03): hash every word k-gram in position order (md5, first 14 hex
  * chars as int64 — the engine's portable [[graft.operators.Hashing]]
  * idiom, computed here straight from the digest bytes), then keep the
  * distinct minima of every sliding window of w consecutive hashes.
  *
  * Replaces a two-layer interpreted pipeline
  * (`transform(word_shingles(t,k), s -> conv(substr(md5(s),1,14),16,10))`
  * + `transform(sequence(...), i -> array_min(slice(h,i,w)))`): each token
  * position paid a lambda dispatch, a hex-string round-trip, and an array
  * slice allocation. This is ONE virtual call per document with tight
  * byte-level loops inside — the same CodegenFallback batching argument as
  * [[WordShingles]] — so the winnow scan stage really does run at scan
  * speed, matching the operator's 100 TB claim. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1)

  private val space = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < k) return new GenericArrayData(Array.empty[Any])
    val m = len - k + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val words = new Array[UTF8String](k)
      var j = 0
      while (j < k) { words(j) = arr.getUTF8String(i + j); j += 1 }
      md.reset()
      val d = md.digest(UTF8String.concatWs(space, words: _*).getBytes)
      // first 7 digest bytes big-endian == conv(substr(hex,1,14),16,10)
      var acc = 0L
      var b = 0
      while (b < 7) { acc = (acc << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = acc
      i += 1
    }
    val nWin = math.max(m - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s < nWin) {
      var mn = hs(s)
      val end = math.min(s + w, m)
      var e = s + 1
      while (e < end) { if (hs(e) < mn) mn = hs(e); e += 1 }
      seen.add(mn)
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpression {
  def winnow_fps(tokens: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFingerprints(GraftSqlBridge.expression(tokens), k, w))
}
