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
 * TWO variants, both bit-portable and both measured (q_opq_recall /
 * q_opq_pca_recall): [[rotate]] is the OBLIVIOUS Walsh–Hadamard
 * transform (entries ±1/√dim), the classic cheap stand-in for the
 * learned OPQ matrix (a structured rotation already captures most of
 * the lift when energy is unbalanced — the same trick as FAISS's
 * random-rotation baseline and the fast-Hadamard preconditioners in
 * recent quantization work); [[rotateHouseholder]] over
 * [[householderFromPca]] is the LEARNED one — a reflection derived
 * from the corpus' top principal direction that maps the
 * dominant-variance axis onto the all-ones diagonal. Unlike a float
 * rotation matrix both are exact: the WHT of the MICRO-QUANTIZED
 * vector (the
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
    val scale = lit(math.sqrt(dim.toDouble) * S)
    transform(rotateInt(v, dim), x => x.cast("double") / scale)
  }

  /**
   * The EXACT-INTEGER half of [[rotate]]: micro-quantize, run the
   * butterfly, and return the raw `array<long>` WHT coefficients
   * WITHOUT the √dim·10⁶ rescale — i.e. the rotated vector expressed in
   * units of 1/(√dim·10⁶). Every coordinate is a ± sum of integers
   * (order-free, bit-portable with zero float ops), which is what the
   * exact-integer error accounting (q_opq_balance) consumes directly:
   * working in this scaled-integer frame keeps PQ reconstruction error
   * an exact integer end to end, where re-quantizing the rescaled
   * doubles would reintroduce a per-element rounding.
   */
  def rotateInt(v: Column, dim: Int): Column = {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"Walsh-Hadamard needs a power-of-two dim, got $dim")
    val q = transform(v, x => round(x * S, 0).cast("long"))
    // the stage list IS the aggregate's input, so the running array is a
    // BOUND lambda variable — evaluated once per stage. (Chaining the
    // stages as nested transform(...) expressions was tried and
    // REJECTED: the interpreter re-evaluates the whole previous stage
    // for EVERY element_at call, 128^stages work per row — a hang.)
    val bits = (0 until Integer.numberOfTrailingZeros(dim)).map(1 << _)
    aggregate(typedlit(bits), q,
      (acc: Column, b: Column) =>
        transform(sequence(lit(1), lit(dim)), i => {
          val lower = (i - 1).bitwiseAND(b) === 0
          val partner = (i - 1).bitwiseXOR(b) + 1
          when(lower, element_at(acc, i) + element_at(acc, partner))
            .otherwise(element_at(acc, partner) - element_at(acc, i))
        }))
  }

  /**
   * The LEARNED rotation's reflection vector, from the corpus' top
   * principal direction ([[Pca.topDirection]]): u ∝ q̂ − t̂, the
   * Householder axis that maps the dominant-variance direction onto
   * the all-ones diagonal — after reflecting, the top component's
   * energy spreads evenly across ALL coordinates, hence across the m
   * PQ subspaces (the actual OPQ objective, data-driven where
   * [[rotate]]'s Walsh–Hadamard is oblivious). Kept EXACT-INTEGER:
   * u_i = round(√dim)·q_i − round(|q|) — the roundings perturb the
   * target direction ~1e-6 (irrelevant for energy spreading) while a
   * Householder is EXACTLY orthogonal for ANY exact u, so the isometry
   * law holds as tightly as the WHT's. All-zero q (degenerate corpus)
   * yields u = 0 → [[rotateHouseholder]] degrades to identity.
   */
  def householderFromPca(q: Array[Long]): Array[Long] = {
    if (q.forall(_ == 0L)) return Array.fill(q.length)(0L)
    // scale-16 rationals: t/16 ≈ √dim and n/16 ≈ |q| to within 1/32 —
    // ≤0.4% of a coordinate for ANY dim (the unscaled round(√dim) was
    // exact only for perfect squares: ~3% off at dim = 128). The
    // reflection amplifies the axis error in the aimed IMAGE — measured
    // at dim 12: image spread around the diagonal 13% here vs 282%
    // unscaled (OpqSpec) — while isometry, the property the recall
    // pipeline rides on, stays EXACT for any exact-integer axis. The
    // ×16 also keeps |u|² = Σ(t·qᵢ − n)² inside a long for micro-quantized
    // directions (|qᵢ| ≤ 10⁶ ⇒ |uᵢ| ≤ 2.6e8 at dim 64 ⇒ |u|² ≤ 4.3e18
    // < 2⁶³; [[rotateHouseholder]]'s require guards the general case).
    // ×16 is exact in IEEE doubles, so the only rounding either engine
    // performs is inside sqrt — correctly rounded and bit-identical.
    val t = math.round(math.sqrt(q.length.toDouble) * 16)
    val nq = math.round(math.sqrt(
      q.map(x => BigInt(x) * BigInt(x)).sum.toDouble) * 16)
    q.map(x => t * x - nq)
  }

  /**
   * The SECOND learned reflection's axis — the rank-2 upgrade: a rank-1
   * Householder only relocates the single top-variance direction; this
   * axis lets a second reflection H₂ spread the SECOND principal
   * direction's energy too. Construction (the standard one): take
   * v = H₁·q₂ (the second direction's image under the first reflection,
   * computed here driver-side with the same exact-integer numerator and
   * one rounded division as [[rotateHouseholder]]'s per-element step)
   * and aim it at the ALTERNATING ±1 diagonal — orthogonal to the
   * all-ones diagonal H₁ targeted, and equally energy-spreading across
   * coordinates and hence across the m contiguous PQ subspaces. Because
   * q₂ ⊥ q₁ (principal directions), v ⊥ ones up to quantization, so
   * u₂ = t·v − n·alt is ⊥ ones too and H₂ FIXES H₁'s target: the
   * composition spreads both top directions instead of undoing one.
   * Same scale-16 rationals and degenerate-zero contract as
   * [[householderFromPca]]; every step is replayed by the oracle's
   * vq/uub CTEs (q_opq_pca2_recall).
   */
  def householder2FromPca(q2: Array[Long], u1: Array[Long]): Array[Long] = {
    val dim = q2.length
    val u1n2 = u1.map(x => BigInt(x) * BigInt(x)).sum
    if (u1n2 == 0 || q2.forall(_ == 0L)) return Array.fill(dim)(0L)
    val hq = q2.zip(u1).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    // v = H₁ q₂ in micro-units: exact integer numerator, ONE rounded
    // division per element (the oracle's vq CTE replays both)
    val v = Array.tabulate(dim) { i =>
      val num = BigInt(q2(i)) * u1n2 - 2 * hq * BigInt(u1(i))
      Pca.roundHalfUp(Pca.toD(num) / Pca.toD(u1n2), 0).toLong
    }
    if (v.forall(_ == 0L)) return Array.fill(dim)(0L)
    val t = math.round(math.sqrt(dim.toDouble) * 16)
    val nv = math.round(math.sqrt(
      v.map(x => BigInt(x) * BigInt(x)).sum.toDouble) * 16)
    Array.tabulate(dim)(i => t * v(i) - (if (i % 2 == 0) nv else -nv))
  }

  /**
   * Householder reflection H = I − 2uuᵀ/|u|² applied to a vector
   * column, bit-portably: the vector quantizes to micro-longs (the one
   * IEEE decision), u·v and |u|² are exact long sums (order-free), the
   * per-element numerator qv_i·|u|² − 2(u·v)·u_i is exact DECIMAL
   * arithmetic (it can exceed a long), and the single division by
   * |u|²·10⁶ is one fixed-order double op per element. The oracle
   * replays every step from its own `dir` CTE, so the whole learned
   * rotation — direction training included — hash-checks
   * (q_opq_pca_recall).
   *
   * The u·v dot is the FINISH-LAMBDA fold: `aggregate(products, 0,
   * +, hd => zip_with(...))` binds the accumulated dot as a lambda
   * variable that the per-element numerator READS — evaluated exactly
   * once per row. (The r12 version staged it as a `__hd` column
   * consumed by a second projection; CollapseProject inlines a
   * single-reference alias into the consumer, so the WHOLE corpus dot
   * re-evaluated per element inside the zip_with — dim× the work, the
   * measured 4.7× slowdown of q_opq_pca_recall vs its WHT sibling. A
   * bound lambda variable cannot be inlined — the same defence as
   * [[rotateInt]]'s stage fold.)
   *
   * Magnitude contract: |coordinate| < 10² (unit-normalized embeddings
   * sit 2 orders below it) — that keeps the quantized qv ≤ 10⁸, inside
   * the decimal(13,0) operand, and the long u·v dot below 2⁶³:
   * qv·|u|·dim ≤ 10⁸ · 2.6e8 · 128 ≈ 3.3e18 < 2⁶³ ≈ 9.2e18 for axis
   * magnitudes |u_i| ≤ ~2.6e8 at dim ≤ 128. (A 10⁴ coordinate bound
   * would NOT fit: qv ≤ 10¹⁰ pushes the dot to ~3e20, wrapping Spark's
   * long sum silently while DuckDB's HUGEINT keeps going — silent
   * cross-engine divergence.) The require below enforces the
   * qv·|u|·dim < 2⁶³ envelope at call time from the actual axis.
   * u = 0 passes vectors through unchanged (as doubles), the declared
   * degenerate contract.
   */
  def rotateHouseholder(df: org.apache.spark.sql.DataFrame,
      embCol: String, u: Array[Long]): org.apache.spark.sql.DataFrame = {
    val u2 = u.map(x => BigInt(x) * BigInt(x)).sum
    if (u2 == 0)
      return df.withColumn(embCol, transform(col(embCol),
        x => x.cast("double")))
    require(u2 <= BigInt(Long.MaxValue),
      s"|u|^2 must fit a long, got $u2")
    // the u·v dot accumulates in a plain long: the per-term bound
    // qv_max·max|u_i| times dim terms must stay under 2^63 (qv_max =
    // 10^8 from the |coordinate| < 10^2 contract above)
    require(BigInt(100000000L) * u.map(x => math.abs(x)).max * u.length
        <= BigInt(Long.MaxValue),
      s"axis too large for exact long dot at dim ${u.length}: " +
        s"max|u_i| = ${u.map(math.abs).max}")
    // decimal widths keep every product within DuckDB's 38-digit cap:
    // qv ≤ 13 digits (the |x| < 10⁴ contract), u ≤ 10, |u|² ≤ 19,
    // u·v ≤ 20 → widest intermediate is 32 digits, exact in both engines
    val uLit = typedlit(u.toSeq)
    val u2Dec = lit(new java.math.BigDecimal(u2.bigInteger))
      .cast("decimal(19,0)")
    val divisor = lit(u2.toDouble * S)
    def qv = transform(col(embCol), x => round(x * S, 0).cast("long"))
    df.withColumn(embCol,
      aggregate(
        zip_with(qv, uLit, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x,
        hd => zip_with(qv, uLit, (x, ui) =>
          (x.cast("decimal(13,0)") * u2Dec
            - lit(2).cast("decimal(2,0)")
              * hd.cast("decimal(20,0)")
              * ui.cast("decimal(10,0)"))
            .cast("double") / divisor)))
  }
}
