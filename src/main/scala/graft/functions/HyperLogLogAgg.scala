package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog-style distinct-count sketch as a typed Aggregator (Flajolet
  * et al. 2007) — the third mergeable sketch next to [[CountMinSketchAgg]]
  * (frequency) and [[BloomFilterAgg]] (membership).
  *
  * Why an Aggregator: an exact `countDistinct` over a 100 TB corpus
  * shuffles the full key set; the HLL state is a CONSTANT M-byte register
  * array that map-side combines and merges associatively (element-wise
  * max) — the cardinality reduces to one tiny array per group with no
  * key shuffle, and per-partition sketches union for free.
  *
  * Hash layout (engine-portable, like the Bloom/CMS family): from
  * hex = md5(key),
  *   - register index = hex[1..2]  (8 bits, M = 256 registers),
  *   - rank           = 1 + number of leading zero BITS of the 60-bit
  *                      value hex[3..17].
  * The rank is computed on the HEX STRING — 4 bits per leading '0' char
  * plus a 16-way lookup on the first nonzero digit — so the DuckDB oracle
  * reproduces every register with string functions only (no 64-bit parse
  * edge cases). All-zero tail (p = 16^-15) would yield rank 61.
  */
object HyperLogLogAgg extends Aggregator[String, Array[Int], Seq[Int]] {

  /** 256 registers: the sf0.01 token vocabulary (~1-2k distinct) lands at
    * a few keys per register — a genuinely exercised estimator, not the
    * sparse linear-counting-only regime.
    */
  val M = 256

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def hexOf(key: String): String = {
    val md = mdLocal.get()
    md.reset()
    md.digest(key.getBytes(StandardCharsets.UTF_8))
      .take(9).map("%02x".format(_)).mkString // 18 hex chars: idx + 15 + 1 spare
  }

  /** Leading zero bits contributed by one hex digit (0 never reaches here). */
  private def digitLz(c: Char): Int = c match {
    case '1' => 3
    case '2' | '3' => 2
    case '4' | '5' | '6' | '7' => 1
    case _ => 0
  }

  /** (register index, rank) of a key — shared by reduce, the column
    * mirror in Sketches, and the spec.
    */
  def slot(key: String): (Int, Int) = {
    val hex = hexOf(key)
    val idx = Integer.parseInt(hex.substring(0, 2), 16)
    val sub = hex.substring(2, 17)
    var i = 0
    while (i < sub.length && sub.charAt(i) == '0') i += 1
    val rank = if (i == sub.length) 61 else 4 * i + digitLz(sub.charAt(i)) + 1
    (idx, rank)
  }

  override def zero: Array[Int] = new Array[Int](M)

  override def reduce(b: Array[Int], key: String): Array[Int] = {
    val (idx, rank) = slot(key)
    if (rank > b(idx)) b(idx) = rank
    b
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Int]): Seq[Int] = r.toSeq

  /** The classic two-regime estimator over a finished register array —
    * used by the accuracy spec and the `within`-style audit query (the
    * registers themselves are the bit-exact oracled surface).
    */
  def estimate(regs: Seq[Int]): Double = {
    val m = regs.length.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val s = regs.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / s
    val zeros = regs.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    Encoders.kryo[Array[Int]]
  override def outputEncoder: Encoder[Seq[Int]] =
    ExpressionEncoder[Seq[Int]]()
}
