package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Misra-Gries frequent-items summary as a typed `Aggregator` — the
 * streaming heavy-hitters sketch beside [[graft.operators.CountMin]]
 * (CMS answers "how often is x?", this answers "which x are frequent?"
 * without a candidate set). The buffer never holds more than k counters;
 * when an insert would exceed k, every counter drops by the (k+1)-th
 * largest value and non-positive entries vanish — the generalized
 * decrement step, which is also the MERGE rule, so partial (map-side)
 * aggregates stay k-bounded and the shuffle moves O(k · partitions)
 * rows where the exact formulation shuffles the full key table
 * (Agarwal et al., "Mergeable Summaries", PODS 2012).
 *
 * Guarantee (any merge order, any partitioning): for every key x with
 * true count n(x) over a length-N stream,
 *   n(x) − N/(k+1)  ≤  est(x)  ≤  n(x),
 * with est(x) = 0 for absent keys — so every key with n(x) > N/(k+1)
 * is PRESENT in the summary. The candidate set and estimates themselves
 * depend on merge order (inherent to MG); the bounds are theorems, so
 * the registered query oracles the bounds, the HLL/GK verdict
 * convention (`q_agg_approx`).
 */
class FreqItemsAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] = {
    // null keys are ignored, not counted: a null map key cannot be
    // encoded for the shuffle/state store (Catalyst throws), and "how
    // often is NULL" is a count(*) question, not a heavy-hitters one
    if (key == null) return buf
    val b = buf.updated(key, buf.getOrElse(key, 0L) + 1L)
    if (b.size <= k) b else shrink(b)
  }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val m = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (m.size <= k) m else shrink(m)
  }

  /** Subtract the (k+1)-th largest count from every entry; drop ≤ 0.
    * Each application removes ≥ (k+1)·dec of total mass, and total mass
    * only enters via increments (≤ N), so any single key's cumulative
    * decrement is ≤ N/(k+1) — the error bound. At most k entries can
    * exceed the (k+1)-th largest, so the result is k-bounded. */
  private def shrink(m: Map[String, Long]): Map[String, Long] = {
    val dec = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
    m.collect { case (t, c) if c > dec => t -> (c - dec) }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
