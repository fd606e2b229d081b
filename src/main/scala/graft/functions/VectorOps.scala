package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector math over `array<float>` embedding columns, built from Spark's
 * higher-order functions (`zip_with`/`aggregate`/`transform`) — native
 * Catalyst expressions, no UDFs, so they distribute and survive column
 * pruning like any built-in.
 *
 * All arithmetic is done in double: float inputs are widened exactly, the
 * fold is strictly sequential, so results are bit-reproducible across
 * engines (the DuckDB oracle's list_dot_product folds the same way).
 */
object VectorOps {

  /** `array<float>` → `array<double>` (exact widening). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Fail fast (scan-local `raise_error`, no extra job) on any vector
    * whose length ≠ `dim`: [[dot]]/zip_with truncate or null-pad to
    * min(len), so a wrong-dimension vector would SILENTLY produce wrong
    * scores/cells/codes — fatal anywhere the result feeds a persisted
    * serving artifact (Ann --build/--append/--search, the streaming
    * index ingests). Shared so every ingress path guards identically. */
  def requireDim(vec: Column, dim: Int, what: String): Column =
    when(size(vec) === dim, vec).otherwise(raise_error(concat(
      lit(s"$what: vector dim must be $dim, got "),
      size(vec).cast("string"))))

  /**
   * Sequential dot product of two double arrays — the codegen'd
   * [[DotProduct]] expression (bit-identical to the higher-order-function
   * fold it replaced, ~20x faster on all-pairs scans; see DotProduct docs).
   */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(DotProduct(
      org.apache.spark.sql.GraftBridge.expression(a),
      org.apache.spark.sql.GraftBridge.expression(b)))

  /** The pure-built-in fold formulation, kept as the portability fallback. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
