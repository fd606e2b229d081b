package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * OPQ-style orthogonal rotation in front of product quantization — the
 * standard recall lift at equal code budget (FAISS `OPQMatrix` /
 * "Optimized Product Quantization", Ge et al. 2013): PQ quantizes each
 * contiguous subspace independently, so when variance CONCENTRATES in a
 * few coordinates one subspace eats most of the quantization error.
 * Rotating the space first spreads energy evenly across coordinates —
 * and therefore across the m subspaces — before the codebooks see it.
 *
 * This is the deterministic-rotation variant: a WALSH–HADAMARD
 * transform (entries ±1/√dim), the classic cheap stand-in for the
 * learned OPQ matrix (a structured rotation already captures most of
 * the lift when energy is unbalanced — the same trick as FAISS's
 * random-rotation baseline and the fast-Hadamard preconditioners in
 * recent quantization work). Unlike a learned or random matrix it is
 * bit-portable: the rotation of the MICRO-QUANTIZED vector (the
 * round(x·10⁶) recipe shared with [[Pca]]) is an EXACT INTEGER
 * Walsh–Hadamard transform — every output coordinate is a ± sum of
 * integers, immune to addition order — and the single rescale by
 * √dim·10⁶ is one fixed-order IEEE op per element. Both engines
 * reproduce the rotated vectors bit-for-bit (the oracle computes the
 * same ± sums via `bit_count((i−1) & (j−1)) % 2`), so the ENTIRE
 * rotated IVF-PQ recall pipeline oracle-checks (q_opq_recall), not
 * just its pieces.
 *
 * Exactness contract (OpqSpec): H·Hᵀ = dim·I exactly over the integers,
 * so (a) rotate∘rotate recovers the quantized input exactly up to the
 * second quantization (the involution law), (b) norms and dot products
 * — hence cosine rankings — are preserved up to the 10⁻⁶ quantization
 * (the isometry law): exact top-k in rotated space equals exact top-k
 * in the original space.
 *
 * Scale shape: the butterfly is O(dim · log dim) interpreted array ops
 * per row, scan-local, zero joins, zero shuffle — the rotation
 * composes in front of [[Pq]]/[[Ivf]] without touching their plans.
 */
object Opq {

  /** Input quantization scale (the [[Pca]] recipe): micro-units. */
  private val S = 1e6

  /**
   * Walsh–Hadamard rotation of an `array<double>` column: quantize once
   * to integer micro-units, run the log₂(dim)-stage integer butterfly
   * (stage b pairs index i with i xor b: the lower of the pair becomes
   * the sum, the upper the difference — exactly the (−1)^popcount((i−1)
   * & (j−1)) matrix in natural ordering), then rescale by √dim·10⁶.
   * Null vectors stay null; vectors of the wrong length are the
   * caller's contract (compose with a size filter), as everywhere in
   * the ANN family.
   */
  def rotate(v: Column, dim: Int): Column = {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"Walsh-Hadamard needs a power-of-two dim, got $dim")
    val q = transform(v, x => round(x * S, 0).cast("long"))
    // the stage list IS the aggregate's input, so the running array is a
    // BOUND lambda variable — evaluated once per stage. (Chaining the
    // stages as nested transform(...) expressions was tried and
    // REJECTED: the interpreter re-evaluates the whole previous stage
    // for EVERY element_at call, 128^stages work per row — a hang.)
    val bits = (0 until Integer.numberOfTrailingZeros(dim)).map(1 << _)
    val wht = aggregate(typedlit(bits), q,
      (acc: Column, b: Column) =>
        transform(sequence(lit(1), lit(dim)), i => {
          val lower = (i - 1).bitwiseAND(b) === 0
          val partner = (i - 1).bitwiseXOR(b) + 1
          when(lower, element_at(acc, i) + element_at(acc, partner))
            .otherwise(element_at(acc, partner) - element_at(acc, i))
        }))
    val scale = lit(math.sqrt(dim.toDouble) * S)
    transform(wht, x => x.cast("double") / scale)
  }
}
