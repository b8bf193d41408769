package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter as a typed Aggregator — the single-pass, mergeable
  * set-membership sketch (Bloom 1970). M-bit array, K hash functions;
  * membership test is one-sided: a present key ALWAYS tests positive
  * (no false negatives), an absent key tests positive with probability
  * ≈ (1 − e^{−Kn/M})^K.
  *
  * Why an Aggregator: at 100 TB the exact key set is corpus-sized; the
  * filter is CONSTANT-size state (M/64 longs) that map-side combines and
  * merges associatively (bitwise OR) across partitions — one reduction to
  * a 2 KiB array instead of a key-set shuffle, then a broadcast-able gate
  * for streaming/batch ingestion dedup.
  *
  * The K bucket positions of a key come from ONE md5 via double hashing
  * (Kirsch & Mitzenmacher 2006): h1 = hex[1..15], h2 = hex[16..30] of
  * md5(key) (60 bits each), pos_i = (h1 + i·h2) mod M. Deterministic and
  * engine-portable: the DuckDB oracle reproduces every position — and
  * therefore every false positive — bit-for-bit.
  */
object BloomFilterAgg extends Aggregator[String, Array[Long], Seq[Long]] {

  /** Sized so the sf0.01 fixture (~500 keys) lands near 50% fill — real
    * false positives for the gate audit, not a degenerate all-zero tail.
    */
  val M = 2048
  val K = 3
  private val Words = M / 64

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 30 hex chars (15 bytes) of md5(key). */
  private def hexOf(key: String): String = {
    val md = mdLocal.get()
    md.reset()
    md.digest(key.getBytes(StandardCharsets.UTF_8))
      .take(15).map("%02x".format(_)).mkString
  }

  /** The K bit positions of a key (shared by reduce and the spec). */
  def positions(key: String): Array[Int] = {
    val hex = hexOf(key)
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
    Array.tabulate(K)(i => ((h1 + i.toLong * h2) % M).toInt)
  }

  override def zero: Array[Long] = new Array[Long](Words)

  override def reduce(b: Array[Long], key: String): Array[Long] = {
    val ps = positions(key)
    var i = 0
    while (i < ps.length) {
      b(ps(i) >> 6) |= 1L << (ps(i) & 63)
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
