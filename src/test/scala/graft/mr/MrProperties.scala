package graft.mr

import java.math.BigInteger

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure MR kernel (SURVEY.md §5 calls out that the
  * reference ships none — these strengthen the port's test posture). */
object MrProperties extends Properties("graft.mr") {

  val line: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("word"))).map(_.mkString(" "))
  val corpus: Gen[List[String]] = Gen.listOfN(30, line)

  property("md5 partition ∈ [0,R) and stable") = forAll(Gen.asciiPrintableStr, Gen.choose(1, 64)) {
    (k, r) =>
      val p = Md5Partitioning.partition(k, r)
      p >= 0 && p < r && p == Md5Partitioning.partition(k, r)
  }

  property("md5 partition matches an independent digest-fold implementation") =
    forAll(Gen.asciiPrintableStr, Gen.choose(1, 64)) { (k, r) =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(k.getBytes("UTF-8"))
      // Fold bytes MSB-first instead of BigInteger — independent arithmetic.
      val m = d.foldLeft(0L)((acc, b) => ((acc << 8) | (b & 0xffL)) % r).toInt
      Md5Partitioning.partition(k, r) == m
    }

  property("CByteOrdering == unsigned byte-array lexicographic order") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      def ref(x: String, y: String): Int = {
        val (xb, yb) = (x.getBytes("UTF-8").map(_ & 0xff), y.getBytes("UTF-8").map(_ & 0xff))
        xb.zip(yb).find { case (p, q) => p != q }
          .map { case (p, q) => p - q }.getOrElse(xb.length - yb.length)
      }
      Integer.signum(CByteOrdering.compare(a, b)) == Integer.signum(ref(a, b))
    }

  property("wcReduceSh over a sorted stream == groupBy counts") = forAll(corpus) { lines =>
    val mapped = NativeQueries.wcMapSh(lines.iterator).toList.sorted(CByteOrdering)
    val reduced = NativeQueries.wcReduceSh(mapped.iterator).toList
    val expect = mapped.groupBy(Md5Partitioning.keyOf).view
      .mapValues(_.size.toLong).toMap
    val got = reduced.map { l =>
      val i = l.lastIndexOf('\t'); l.substring(0, i) -> l.substring(i + 1).toLong
    }.toMap
    got == expect && reduced.map(Md5Partitioning.keyOf) == reduced.map(Md5Partitioning.keyOf).sorted(CByteOrdering)
  }

  property("wc map+reduce conserves token count") = forAll(corpus) { lines =>
    val mapped = NativeQueries.wcMapSh(lines.iterator).toList
    val reduced = NativeQueries.wcReduceSh(mapped.sorted(CByteOrdering).iterator).toList
    reduced.map(l => l.substring(l.lastIndexOf('\t') + 1).toLong).sum == mapped.size
  }

  property("partition routing splits keys disjointly across R") = forAll(corpus, Gen.choose(1, 8)) {
    (lines, r) =>
      val mapped = NativeQueries.wcMapSh(lines.iterator).toList
      val routed = mapped.groupBy(l => Md5Partitioning.partition(Md5Partitioning.keyOf(l), r))
      routed.keys.forall(p => p >= 0 && p < r) &&
        routed.values.map(_.size).sum == mapped.size
  }
}
