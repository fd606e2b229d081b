package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Second-moment accumulator over micro-quantized vectors — the covariance
 * front-end of [[graft.operators.Pca]]. One buffer of
 * dim·(dim+1)/2 + dim + 1 longs holds the upper-triangle pair products
 * (flat row-major: (0,0)..(0,d−1),(1,1)..), the first moments, and the
 * row count; update is the straight dim²/2 multiply-add loop (BLAS-1
 * work, no per-row allocation), merge is elementwise add. Replaces an
 * explode to dim·(dim+1)/2 + dim struct rows per vector — the exploded
 * two-level hash aggregate spent ~2.5 s at sf0.1 building 4.3M
 * short-lived structs through non-codegen'd higher-order functions;
 * this buffer form is one object-hash aggregate whose shuffle carries
 * nSalt buffers total.
 *
 * Exactness contract (the caller stripes rows into nSalt groups): within
 * a stripe everything sums as longs — exact while n ≤
 * nSalt·9.2·10¹⁸/(10⁶·|v|_max)², the same striped-long bound the exploded
 * form had — and the stripe subtotals finish in decimal(38,0) downstream.
 * Elements past `dim` are ignored; index pairs past a SHORT vector's
 * length contribute nothing while the row still counts — exactly the
 * null-product semantics of the element_at formulation and the oracle's
 * list indexing. The input is `Seq[java.lang.Long]` (not `Seq[Long]`) so
 * a NULL ELEMENT inside a vector deserializes instead of NPE-ing: any
 * product or first moment touching a null element is skipped while the
 * row still counts — again the element_at/sum() semantics.
 */
class MomentsAgg(dim: Int)
    extends Aggregator[Seq[java.lang.Long], Array[Long], Seq[Long]] {
  require(dim > 0, s"dim must be positive: $dim")

  private val pairCells = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](pairCells + dim + 1)

  override def reduce(b: Array[Long], v: Seq[java.lang.Long]): Array[Long] = {
    val a = v.toArray
    val n = math.min(a.length, dim)
    var i = 0
    var idx = 0
    while (i < n) {
      val bi = a(i)
      if (bi != null) {
        val vi = bi.longValue
        var j = i
        while (j < n) {
          val bj = a(j)
          if (bj != null) b(idx + j - i) += vi * bj.longValue
          j += 1
        }
        b(pairCells + i) += vi
      }
      idx += dim - i
      i += 1
    }
    b(pairCells + dim) += 1L
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
