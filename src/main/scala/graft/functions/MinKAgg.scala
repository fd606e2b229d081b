package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded-state per-group min-k aggregate over longs — [[TopKAgg]]'s
 * ascending sibling, built for KMV sketches: the buffer never holds more
 * than k values, kept ascending, so the PARTIAL (map-side) aggregate is
 * already capped at k and the shuffle moves O(k · groups · partitions)
 * values instead of every row (the window-rank formulation sorts each
 * group's full row set at its reducer — a table-sized sort at 100 TB).
 *
 * Callers feed DISTINCT values per group (the KMV contract: a sketch is
 * the k smallest distinct hashes); the buffer does not re-deduplicate.
 * Deterministic: plain ascending long order, no ties possible on
 * distinct input.
 */
class MinKAgg(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], v: Long): List[Long] =
    merge(buf, List(v))

  /** Merge two ascending lists, keeping the k smallest — O(k). */
  override def merge(a: List[Long], b: List[Long]): List[Long] = {
    val out = scala.collection.mutable.ListBuffer.empty[Long]
    var (x, y) = (a, b)
    while (out.size < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && x.head <= y.head)) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
    }
    out.toList
  }

  override def finish(r: List[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
