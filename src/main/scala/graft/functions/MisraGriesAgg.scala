package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries k-counter heavy-hitters summary as a typed Aggregator
  * (Misra & Gries 1982), with the mergeable-summaries merge (Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi — PODS 2012): add counter maps, then
  * subtract the (k+1)-th largest combined count from every counter and
  * drop non-positives, restoring the k-counter bound.
  *
  * Contract (holds under ANY reduce/merge order):
  *   - est(t) ≤ exact(t)                        (never overestimates)
  *   - exact(t) − est(t) ≤ (N − S) / (k + 1)    (S = Σ stored counters)
  *   - hence every item with exact(t) > N/(k+1) is IN the summary.
  *
  * Unlike CMS/HLL/Bloom, the merge is NOT commutative on the summary
  * VALUES — which counters survive a decrement depends on merge order, and
  * Spark's final-aggregation merge order follows shuffle-fetch timing. So
  * the raw summary is never oracle-hashed; the oracled queries check the
  * order-INVARIANT contracts above (mg_guaranteed_hitters,
  * mg_bounds_check), or run with k ≥ |domain| where no decrement can fire
  * and the summary IS the exact histogram (mg_exact_histogram). This is
  * the sketch-family pattern for summaries whose state is order-dependent
  * but whose guarantees are not.
  *
  * Why an Aggregator: at 100 TB the top-k question must not shuffle the
  * full key histogram; MG state is ≤ k counters, map-side combined and
  * merged associatively — constant-size like the other sketches in this
  * family, but directly answering "which items", where CMS only answers
  * point queries.
  */
class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1L)
      case None if b.size < k => b.updated(tok, 1L)
      // full and unseen: the classic decrement-all step (the new item and
      // one unit of every stored counter annihilate)
      case None =>
        b.iterator.collect { case (t, c) if c > 1L => (t, c - 1L) }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count; ≤ k strictly-larger counters
      // survive. Deterministic given the combined map (ties all subtract
      // the same value), order-dependence comes only from WHICH maps meet.
      val d = combined.valuesIterator.toArray.sortBy(-_).apply(k)
      combined.iterator.collect { case (t, c) if c > d => (t, c - d) }.toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
