package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded-state per-group top-k aggregate: the buffer never holds more
 * than k (score, id) pairs, kept descending by (score, id). Because the
 * PARTIAL (map-side) aggregate is already capped at k, the shuffle moves
 * O(k · groups · partitions) rows — the window-rank formulation of the
 * same question shuffles EVERY row to its group's reducer and then
 * discards all but k, which is the difference between a bounded merge
 * and a table-sized sort at 100 TB.
 *
 * Deterministic: score ties break on id (descending), so results are
 * reproducible under any partitioning. This is the typed `Aggregator`
 * extension point SURVEY §2.10 reserves for bounded custom aggregation
 * state; `functions.udaf` slots it into untyped DataFrame plans.
 */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive: $k")

  private def gt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
      in: (Double, Long)): List[(Double, Long)] = merge(buf, List(in))

  /** Merge two descending lists, keeping the k largest — O(k). */
  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(Double, Long)]
    var (x, y) = (a, b)
    while (out.size < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && !gt(y.head, x.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
    }
    out.toList
  }

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
