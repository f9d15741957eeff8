package graft.mr

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.Partitioner

/** Reference-exact data routing: partition = int(md5(key_utf8), 16) % R.
  *
  * The reference's shuffle routes each `key TAB value` line by the md5 of
  * its key (verified against the goldens in
  * `/root/reference/tests/test_worker_08.py:226-243`: at R=2, keys "",
  * "bye", "hello" → part 0; "world", "goodbye", "hadoop" → part 1).
  * Spark's built-in hashpartitioning is Murmur3, so byte-compat needs this
  * custom routing — a cheap pure function, usable both as an RDD
  * [[Partitioner]] and as a column expression ([[graft.mr.MrJob]]).
  */
object Md5Partitioning {
  /** Stateless + thread-safe: MessageDigest is per-call. */
  def partition(key: String, numPartitions: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val digest = md.digest(key.getBytes("UTF-8"))
    // Positive 128-bit interpretation of the hex digest, as in the
    // reference contract int(md5(key).hexdigest(), 16) % R.
    new BigInteger(1, digest).mod(BigInteger.valueOf(numPartitions)).intValue()
  }

  /** Key of a `key TAB value` line: prefix before the first TAB; a line
    * with no TAB is all key. Empty keys are legal records
    * (`/root/reference/tests/test_worker_04.py:120`). */
  def keyOf(line: String): String = {
    val i = line.indexOf('\t')
    if (i < 0) line else line.substring(0, i)
  }
}

/** RDD partitioner wrapping [[Md5Partitioning.partition]]; keys are the
  * line-prefix strings. */
class Md5Partitioner(val numPartitions0: Int) extends Partitioner {
  override def numPartitions: Int = numPartitions0
  override def getPartition(key: Any): Int =
    Md5Partitioning.partition(key.asInstanceOf[String], numPartitions0)
  override def equals(other: Any): Boolean = other match {
    // getClass, not instanceof: Md5LinePartitioner(R) routes by the line's
    // KEY PREFIX while this routes by the raw key — treating them as equal
    // would let Spark skip a shuffle on a cogroup/join of RDDs partitioned
    // by each, silently mis-colocating keys.
    case o: Md5Partitioner => o.getClass == getClass && o.numPartitions0 == numPartitions0
    case _ => false
  }
  override def hashCode: Int = getClass.hashCode * 31 + numPartitions0
}
