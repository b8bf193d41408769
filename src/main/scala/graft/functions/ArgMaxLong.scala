package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF machinery demo: arg-max with a total tie-break.
  *
  * `ArgMaxLong` returns the `payload` of the row with the largest
  * `ordering`; ties break toward the larger payload, making the aggregate
  * fully deterministic under any partitioning / merge order (essential for
  * the DuckDB oracle compare and for distributed reproducibility — a
  * plain max_by is underdetermined on ties).
  *
  * Register per session:
  *   spark.udf.register("argmax_long", functions.udaf(ArgMaxLong))
  */
object ArgMaxLong extends Aggregator[(Long, Long), (Long, Long, Boolean), Long] {
  // buffer: (bestOrdering, bestPayload, seenAny)
  override def zero: (Long, Long, Boolean) = (Long.MinValue, Long.MinValue, false)

  override def reduce(b: (Long, Long, Boolean), in: (Long, Long)): (Long, Long, Boolean) =
    merge(b, (in._1, in._2, true))

  override def merge(a: (Long, Long, Boolean), b: (Long, Long, Boolean)): (Long, Long, Boolean) =
    if (!b._3) a
    else if (!a._3) b
    else if (b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)) b
    else a

  override def finish(r: (Long, Long, Boolean)): Long = r._2

  override def bufferEncoder: Encoder[(Long, Long, Boolean)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaBoolean)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
