package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min Sketch as a typed Aggregator — the single-pass, mergeable
  * frequency sketch (Cormode & Muthukrishnan 2005). Depth×Width counter
  * matrix; estimate(t) = min over rows j of cell(j, h_j(t)); never
  * underestimates, overestimates by at most εN with probability 1−δ.
  *
  * Why an Aggregator and not a groupBy: at 100 TB the exact token
  * histogram is itself huge; the sketch is CONSTANT-size state that
  * map-side combines (partial aggregation) and merges associatively
  * across partitions — one reduction to a Depth×Width array instead of a
  * vocabulary-sized shuffle. That is the canonical use of Spark's typed
  * UDAF machinery (buffer encoder carries the array state).
  *
  * Hashes bottom out in md5 (row j = a 16-bit slice of md5(token)), so
  * the DuckDB oracle reproduces every cell and every estimate
  * bit-for-bit.
  */
object CountMinSketchAgg extends Aggregator[String, Array[Long], Seq[Long]] {

  val Depth = 4
  val Width = 64

  /** The Depth buckets of a token come from ONE md5: row j reads hex chars
    * [4j, 4j+4) (16 bits) of md5(tok), mod Width. One digest per token
    * instead of Depth salted digests — measured 2-3x on the sf0.1 token
    * stream — and 16-bit md5 slices are independent enough for the CMS
    * error bound at any realistic Width. Byte-identical to the oracle's
    * CAST(('0x' || substr(md5(t), 1+4*j, 4)) AS BIGINT) % Width.
    */
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def hexOf(tok: String): String = {
    val md = mdLocal.get()
    md.reset()
    md.digest(tok.getBytes(StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
  }

  def bucket(j: Int, tok: String): Int =
    (Integer.parseInt(hexOf(tok).substring(4 * j, 4 * j + 4), 16) % Width)

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(b: Array[Long], tok: String): Array[Long] = {
    val hex = hexOf(tok)
    var j = 0
    while (j < Depth) {
      b(j * Width + Integer.parseInt(hex.substring(4 * j, 4 * j + 4), 16) % Width) += 1L
      j += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
