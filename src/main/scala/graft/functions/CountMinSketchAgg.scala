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
  * Hashes bottom out in md5 (same 60-bit construction as TextHash.h60,
  * salted per row with "cms<j>:"), so the DuckDB oracle reproduces every
  * cell and every estimate bit-for-bit.
  */
object CountMinSketchAgg extends Aggregator[String, Array[Long], Seq[Long]] {

  val Depth = 4
  val Width = 64

  /** Row-j bucket of a token: first 15 md5 hex chars of "cms<j>:<tok>"
    * parsed base-16, mod Width — byte-identical to the oracle's
    * CAST(('0x' || substr(md5(...),1,15)) AS BIGINT) % Width.
    */
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def bucket(j: Int, tok: String): Int = {
    val md = mdLocal.get()
    md.reset()
    val dig = md.digest(s"cms$j:$tok".getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = upper 60 bits of the first 8 bytes, minus the
    // low nibble of byte 7 — parse via the hex string for clarity/parity
    val hex = dig.take(8).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % Width).toInt
  }

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(b: Array[Long], tok: String): Array[Long] = {
    var j = 0
    while (j < Depth) { b(j * Width + bucket(j, tok)) += 1L; j += 1 }
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
