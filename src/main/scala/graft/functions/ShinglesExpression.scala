package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a token array: ["a","b","c","d"], n=3 →
  * ["a b c", "b c d"].
  *
  * Replaces `transform(sequence(0, size-n), i -> concat_ws(' ', t[i]...))`:
  * higher-order functions evaluate interpreted — a lambda dispatch plus
  * boxed element_at lookups per shingle — and that path was the moving
  * hotspot behind intermittent 10× slowdowns of both shingle consumers
  * (minhash, jaccard). This expression is one virtual call per DOCUMENT
  * with a tight UTF8String loop inside (CodegenFallback: the per-row work
  * is already batch-sized, so fallback costs one call, not per-element
  * interpretation).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)

  private val space = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i + n <= len) {
        val words = new Array[UTF8String](n)
        var k = 0
        while (k < n) { words(k) = arr.getUTF8String(i + k); k += 1 }
        out(i) = UTF8String.concatWs(space, words: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesExpression {
  def word_shingles(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(tokens), n))
}
