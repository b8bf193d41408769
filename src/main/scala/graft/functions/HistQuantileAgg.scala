package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Equi-width histogram quantile sketch as a typed Aggregator — the
  * mergeable RANK/quantile summary completing the sketch family
  * (frequency = CMS, membership = Bloom, distinct = HLL, quantiles =
  * this). The reference has no aggregate machinery at all (SURVEY.md
  * §2.4-2.5); Spark's own approx_percentile is neither deterministic
  * across partitionings nor oracle-reproducible, which is why this one
  * is built on a FIXED value domain instead.
  *
  * State: `Bins` counters over the integer-cent domain [0, HiCents),
  * bin = cents * Bins DIV HiCents (clamped) — pure integer arithmetic,
  * bit-identical to the DuckDB oracle's floor division. Elementwise-add
  * merge is associative+commutative, so the state map-side combines and
  * is partition-count-independent (SketchesSpec proves it), and any
  * order statistic is pinned to exactly one bin: rank error <= one bin
  * width (HiCents/Bins cents), a deterministic contract the `qsketch_*`
  * queries oracle end-to-end.
  *
  * Why an Aggregator and not a sort: at 100 TB an exact quantile is a
  * full shuffle+sort per group; this is one constant-size (8 KiB) array
  * per group reduced map-side — the classic single-pass distributed
  * equi-width histogram, the deterministic baseline the mergeable
  * quantile-sketch literature (GK, KLL, t-digest) refines.
  */
object HistQuantileAgg extends Aggregator[Long, Array[Long], Seq[Long]] {

  val Bins = 1024
  /** Domain upper bound in cents: [0, $110,000) covers l_extendedprice
    * at every TPC-H scale factor (price <= ~$104,950 by construction).
    */
  val HiCents = 11000000L

  def binOf(cents: Long): Int = {
    val b = cents * Bins / HiCents
    if (b < 0L) 0 else if (b >= Bins) Bins - 1 else b.toInt
  }

  override def zero: Array[Long] = new Array[Long](Bins)

  override def reduce(b: Array[Long], cents: Long): Array[Long] = {
    b(binOf(cents)) += 1L
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
