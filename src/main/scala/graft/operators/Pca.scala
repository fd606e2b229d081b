package graft.operators

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed PCA over an embedding column — the linear-projection half of
 * embedding hygiene in a training-data pipeline (FAISS runs exactly this as
 * its PCA/OPQ pre-transform before PQ; curation uses the first component as
 * a cheap "dominant direction" score for outlier screens and decorrelation
 * audits). REF has no vector analytics at all (its surface is masking); this
 * extends SURVEY §2.9-L2 the way Ivf/Pq do.
 *
 * Architecture: the corpus is touched by EXACTLY TWO distributed passes —
 * (1) one moments aggregate that reduces the data to the
 * dim·(dim+3)/2 exact integer second/first-moment sums, and (2) one
 * scan-local projection whose direction vectors are plan literals. Between
 * them, the covariance build, power iteration, Hotelling deflation, and
 * the Rayleigh spectrum run on the DRIVER over the collected dim²-cell
 * integer matrix — metadata-scale whatever the corpus size (64² = 4,096
 * cells here; even dim = 1k is 16 MB), the same bounded-collect pattern as
 * [[Ivf.train]]'s k×dim Lloyd means, and exactly where FAISS solves its
 * eigenproblem. The previous all-DataFrame power iteration planned ~35
 * metadata-scale jobs per query; at 1,000 executors those are pure
 * scheduler latency — an sf0.1 isolated A/B measured the eigen-solve's
 * job chain at 3-4× the cost of the two real passes.
 *
 * The arithmetic is FIXED-POINT and replicated bit-for-bit between the
 * driver and the DuckDB oracle: each vector quantizes ONCE to integer
 * micro-units (round(x·10⁶), the one IEEE decision per element), and every
 * moment, covariance cell, power step and projection after that is exact
 * integer math — immune to association order, shuffle order, and engine
 * summation differences. The few double steps (covariance normalization,
 * direction re-quantization, deflation term, final reports) are
 * fixed-order expressions over exact integers, reproduced on the driver
 * with the same IEEE ops Spark's codegen would emit (java
 * `BigDecimal.valueOf` HALF_UP rounding = Spark `round`; decimal→double =
 * `BigDecimal.doubleValue`), so the whole pipeline oracle-checks.
 *
 * Moments pass detail: one object-hash aggregate of
 * [[graft.functions.MomentsAgg]] buffers — each task accumulates the
 * dim·(dim+3)/2-cell long buffer in place (the dim²/2 multiply-add loop,
 * no per-row allocation; an earlier dim²-struct explode formulation
 * spent its time building 4.3M short-lived structs at sf0.1), and the
 * shuffle carries `nSalt` buffers total. Products sum as longs within
 * the nSalt row-striped groups (a stripe holds ~n/nSalt terms of
 * ≤ (10⁶·|v|_max)² each — with unit-normalized embeddings and the
 * default 16 stripes that is exact to ~1.5·10⁸ vectors; raise nSalt
 * linearly beyond), then the stripe subtotals finish in decimal(38,0) —
 * the per-row hot path never touches a BigDecimal. The stripe key is
 * row-content-free (monotonic id mod nSalt): any striping yields the
 * same exact totals. The update loop is O(dim²) per row — what an exact
 * covariance costs in ANY engine; past dim≈1k you subsample rows first
 * (estimation error shrinks as 1/√n, so a 1% sample of a 100 TB corpus
 * is still overkill).
 *
 * Projection pass detail: with the re-quantized direction(s) as literal
 * arrays, each row's component is an exact long dot via
 * `aggregate(zip_with(...))` — scan-local, zero joins, zero explode, zero
 * shuffle (≤ dim terms of ≤ 10¹²·|v|_max each, long-safe for any
 * |v|_max < 10⁵); the final double division happens once per row.
 *
 * Degenerate inputs (empty corpus, single row, zero variance) produce a
 * zero direction; the projection then reports 0.0 rather than NaN, and the
 * variance report guards its divisions the same way.
 */
object Pca {

  /** Input quantization scale: vectors live at micro-units. */
  private val S = 1e6

  /** Element-wise micro-unit quantization — the single IEEE decision. */
  private def quantize(v: Column): Column =
    transform(v, x => round(x * S, 0).cast("long"))

  /**
   * Second-moment sums over the micro-quantized vectors, as ONE
   * object-hash aggregate of [[graft.functions.MomentsAgg]] buffers over
   * the `nSalt` row stripes, finished by a decimal(38,0) sum per flat
   * buffer cell: (__p flat cell index, s exact integer sum). Flat layout
   * is MomentsAgg's: upper-triangle pair products, then first moments,
   * then the row count. `embCol` must be array<double>
   * ([[graft.functions.VectorOps.asDouble]]).
   */
  private def moments(df: DataFrame, embCol: String, dim: Int,
      nSalt: Int): DataFrame = {
    val magg = udaf(new graft.functions.MomentsAgg(dim))
    // Round-robin spread, NOT hash-of-vector: hashing every embedding just
    // to widen a narrow scan is wasted CPU, and a duplicate-heavy corpus
    // would pile all clones of a vector onto one partition. The downstream
    // stripe totals finish in exact decimal, so placement is free to be
    // arbitrary.
    Scale.spreadRoundRobin(df.filter(col(embCol).isNotNull))
      .select(quantize(col(embCol)).as("__qv"),
        pmod(monotonically_increasing_id(), lit(nSalt.toLong)).as("__sl"))
      .groupBy("__sl").agg(magg(col("__qv")).as("__m"))
      .select(posexplode(col("__m")).as(Seq("__p", "__v")))
      .groupBy("__p")
      .agg(sum(col("__v").cast("decimal(38,0)")).as("s"))
  }

  /** Spark `round(double, scale)` replicated exactly: java
    * `BigDecimal.valueOf` (shortest-decimal) then HALF_UP — NOT Scala's
    * `BigDecimal(double)` exact-binary constructor. */
  private[operators] def roundHalfUp(x: Double, scale: Int): Double =
    JBig.valueOf(x).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  /** Spark/DuckDB decimal(38,0)→double cast replicated exactly. */
  private[operators] def toD(b: BigInt): Double = new JBig(b.bigInteger).doubleValue()

  /** Driver-side eigen state: the full symmetric covariance matrix in
    * integer micro-units plus the current direction's exact pieces. */
  private final case class Mat(c: Array[Array[Long]], dim: Int)

  /** Collect the moments frame and decode MomentsAgg's flat layout:
    * (upper-triangle second moments, first moments, n). None when the
    * corpus had no non-null vectors. */
  private def collectMoments(df: DataFrame, embCol: String, dim: Int,
      nSalt: Int): Option[(Array[Array[BigInt]], Array[BigInt], Long)] = {
    val rows = moments(df, embCol, dim, nSalt).collect()
    if (rows.isEmpty) return None
    val pairCells = dim * (dim + 1) / 2
    val iOf = new Array[Int](pairCells)
    val jOf = new Array[Int](pairCells)
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      iOf(idx) = i; jOf(idx) = j; idx += 1
    }
    val s2 = Array.fill(dim, dim)(BigInt(0))
    val s1 = Array.fill(dim)(BigInt(0))
    var n = 0L
    rows.foreach { r =>
      val p = r.getInt(0)
      val s = BigInt(r.getDecimal(1).toBigInteger)
      if (p < pairCells) {
        s2(iOf(p))(jOf(p)) = s; s2(jOf(p))(iOf(p)) = s
      } else if (p < pairCells + dim) s1(p - pairCells) = s
      else n = s.toLong
    }
    Some((s2, s1, n))
  }

  /** Covariance in integer micro-units of the REAL covariance:
    * c = round((Sᵢⱼ − Sᵢ·Sⱼ/n)/n/10⁶) — the fixed-order double expression
    * over exact integer sums, identical to the oracle's. */
  private def covMatrix(s2: Array[Array[BigInt]], s1: Array[BigInt],
      n: Long, dim: Int): Mat = {
    val nd = n.toDouble
    val c = Array.fill(dim, dim)(0L)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = roundHalfUp(
          (toD(s2(i)(j)) - toD(s1(i)) * toD(s1(j)) / nd) / nd / S, 0).toLong
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    Mat(c, dim)
  }

  /**
   * Top principal DIRECTION of an integer matrix, re-quantized to
   * micro-units of its max component. The power seed is e_s for s =
   * argmax of the DIAGONAL (largest remaining variance coordinate, ties
   * to the smallest index) — data-driven, deterministic, and never
   * orthogonal to the top eigenvector in practice (a fixed-e₀ seed
   * degenerates exactly when the matrix has nothing on coordinate 0,
   * the common case for a DEFLATED matrix whose first component lay
   * along e₀). v₂ = C·(C·e_s) in exact integer arithmetic; the single
   * re-quantizing division is double-exact on identical inputs. Two
   * exact steps from a fixed seed make the direction a pure function of
   * the data — the convergence/accuracy trade is declared, not hidden.
   * A zero matrix yields q = 0 everywhere.
   */
  private def direction(m: Mat): Array[Long] = {
    val dim = m.dim
    var sd = 0
    var best = Long.MinValue
    var i = 0
    while (i < dim) {
      if (m.c(i)(i) > best) { best = m.c(i)(i); sd = i }
      i += 1
    }
    val w1 = Array.tabulate(dim)(k => m.c(k)(sd))
    val w2 = Array.tabulate(dim) { k =>
      var acc = BigInt(0)
      var j = 0
      while (j < dim) { acc += BigInt(m.c(k)(j)) * BigInt(w1(j)); j += 1 }
      acc
    }
    val mx = w2.map(_.abs).max
    if (mx == 0) Array.fill(dim)(0L)
    else w2.map(w => roundHalfUp(toD(w) / toD(mx) * S, 0).toLong)
  }

  /** Rayleigh pieces of direction q over matrix m: (num = qᵀCq exact,
    * den = |q|² exact). */
  private def rayleigh(m: Mat, q: Array[Long]): (BigInt, Long) = {
    val dim = m.dim
    var num = BigInt(0)
    var den = 0L
    var i = 0
    while (i < dim) {
      var v3 = BigInt(0)
      var j = 0
      while (j < dim) { v3 += BigInt(m.c(i)(j)) * BigInt(q(j)); j += 1 }
      num += BigInt(q(i)) * v3
      den += q(i) * q(i)
      i += 1
    }
    (num, den)
  }

  /** Hotelling deflation C' = C − λ̂₁·(q qᵀ)/|q|²: each cell subtracts one
    * fixed-order rounded double term (num/den·qᵢ·qⱼ/den), so the deflated
    * matrix is again exact integer micro-units. A zero direction
    * (den = 0) deflates nothing. */
  private def deflate(m: Mat, q: Array[Long], num: BigInt,
      den: Long): Mat = {
    if (den == 0L) return m
    val dim = m.dim
    val numD = toD(num); val denD = den.toDouble
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val t = numD / denD * q(i).toDouble * q(j).toDouble / denD
      m.c(i)(j) - roundHalfUp(t, 0).toLong
    }
    Mat(c, dim)
  }

  /** Exact long dot of the quantized vector with a literal direction —
    * scan-local `aggregate(zip_with(...))`, no join, no explode; length
    * mismatches contribute 0 (the old broadcast-join semantics). */
  private def dotLit(embCol: String, q: Array[Long]): Column =
    aggregate(
      zip_with(quantize(col(embCol)), typedlit(q.toSeq),
        (x, y) => coalesce(x * y, lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** pc score column: s/10⁶/√n2 rounded to 6 dp, 0.0 on a degenerate
    * direction — the same fixed-order expression the oracle runs. */
  private def pcCol(s: Column, n2: Long): Column =
    if (n2 == 0L) lit(0.0)
    else round(s.cast("double") / S / lit(math.sqrt(n2.toDouble)), 6)

  private def solveTop(df: DataFrame, embCol: String, dim: Int,
      nSalt: Int): (Array[Long], Long, Mat) =
    collectMoments(df, embCol, dim, nSalt) match {
      case None =>
        (Array.fill(dim)(0L), 0L, Mat(Array.fill(dim, dim)(0L), dim))
      case Some((s2, s1, n)) =>
        val m = covMatrix(s2, s1, n, dim)
        val q = direction(m)
        (q, q.map(x => x * x).sum, m)
    }

  /** The top principal DIRECTION as integer micro-units — the
    * driver-bounded artifact other operators compose with (the
    * OPQ-style learned rotation [[Opq.householderFromPca]] builds its
    * reflection vector from it). Exactly [[projectPc1]]'s direction:
    * same moments pass, same two power steps, same re-quantization, so
    * the SQL oracle's `dir` CTE reproduces it bit-for-bit. */
  def topDirection(df: DataFrame, embCol: String, dim: Int,
      nSalt: Int = 16): Array[Long] =
    solveTop(df, embCol, dim, nSalt)._1

  /** [[topDirection]] plus its exact squared norm — for callers that
    * apply the projection themselves via [[pc1ColFor]] (composing extra
    * columns into the SAME scan instead of joining projectPc1's frame). */
  def topDirectionWithNorm(df: DataFrame, embCol: String, dim: Int,
      nSalt: Int = 16): (Array[Long], Long) = {
    val (q, n2, _) = solveTop(df, embCol, dim, nSalt)
    (q, n2)
  }

  /** The scan-local pc1 COLUMN against a trained direction — exactly
    * [[projectPc1]]'s projection expression (exact long dot of the
    * micro-quantized vector with the literal direction, one fixed-order
    * double division, 6 dp), detached from its select so a caller can
    * compute pc1 NEXT TO other columns in one pass. Same null/degenerate
    * contract as projectPc1: compose with a non-null, non-empty filter. */
  def pc1ColFor(embCol: String, q: Array[Long], n2: Long): Column =
    pcCol(dotLit(embCol, q), n2)

  /** Top TWO principal directions as integer micro-units — the rank-2
    * learned-rotation front end ([[graft.operators.Opq.householder2FromPca]]):
    * [[topDirection]]'s q1 plus one Hotelling deflation and a second
    * power run, exactly [[projectTop2]]'s pair, so the SQL oracle's
    * dir/dir2 CTEs reproduce both bit-for-bit. Same ONE moments pass —
    * the deflation and both power steps are driver-side dim² work. */
  def topDirections2(df: DataFrame, embCol: String, dim: Int,
      nSalt: Int = 16): (Array[Long], Array[Long]) = {
    val (q1, _, m) = solveTop(df, embCol, dim, nSalt)
    val (num, den) = rayleigh(m, q1)
    (q1, direction(deflate(m, q1, num, den)))
  }

  /**
   * Per-vector projection onto the first principal direction:
   * (idCol, pc1 = q(v)·q / (10⁶·|q|) rounded to 6 dp), one row per
   * non-null vector — ONE scan-local pass, the direction a plan literal.
   * pc1 = 0.0 when the direction is degenerate-zero.
   */
  def projectPc1(df: DataFrame, idCol: String, embCol: String,
      dim: Int, nSalt: Int = 16): DataFrame = {
    val (q, n2, _) = solveTop(df, embCol, dim, nSalt)
    // size > 0 alongside isNotNull: the oracle's unnest+join projection
    // emits NO row for an empty vector, and dotLit's zip_with would
    // otherwise pad one out to pc1 = 0.0 — a rows/hash desync in waiting.
    df.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol), pcCol(dotLit(embCol, q), n2).as("pc1"))
  }

  /**
   * Per-vector projection onto the TOP TWO principal directions:
   * (idCol, pc1, pc2) — [[projectPc1]] plus one Hotelling deflation and a
   * second power run on the driver matrix; both dots come out of the ONE
   * scan-local pass. The standard PCA-scatter / whitening-front-end
   * shape; components beyond the second repeat the same
   * deflate-and-project step. pc2 = 0.0 when the deflated spectrum is
   * degenerate-zero.
   */
  def projectTop2(df: DataFrame, idCol: String, embCol: String,
      dim: Int, nSalt: Int = 16): DataFrame = {
    val (q1, n21, m) = solveTop(df, embCol, dim, nSalt)
    val (num, den) = rayleigh(m, q1)
    val q2 = direction(deflate(m, q1, num, den))
    val n22 = q2.map(x => x * x).sum
    df.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol),
        pcCol(dotLit(embCol, q1), n21).as("pc1"),
        pcCol(dotLit(embCol, q2), n22).as("pc2"))
  }

  /**
   * One-row spectrum report: (lambda1, trace, frac) — the Rayleigh-quotient
   * estimate of the top eigenvalue over the quantized direction, the total
   * variance, and the explained-variance fraction (the number that decides
   * whether a PCA pre-transform is worth running before PQ, and how many
   * components a whitening step should keep). Exact integer numerator/
   * denominator on the driver matrix, doubles only in the final
   * divisions; degenerate inputs report 0.0 rather than NaN; an empty
   * corpus reports the all-null row (the aggregate-of-nothing shape).
   */
  def varianceExplained(df: DataFrame, embCol: String, dim: Int,
      nSalt: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("lambda1", DoubleType), StructField("trace", DoubleType),
      StructField("frac", DoubleType)))
    val row = collectMoments(df, embCol, dim, nSalt) match {
      case None => org.apache.spark.sql.Row(null, null, null)
      case Some((s2, s1, n)) =>
        val m = covMatrix(s2, s1, n, dim)
        val q = direction(m)
        val (num, den) = rayleigh(m, q)
        var tr = 0L
        var i = 0
        while (i < dim) { tr += m.c(i)(i); i += 1 }
        val lambda1 =
          if (den == 0L) 0.0
          else roundHalfUp(toD(num) / den.toDouble / S, 6)
        val trace = roundHalfUp(tr.toDouble / S, 6)
        val frac =
          if (den == 0L || tr == 0L) 0.0
          else roundHalfUp(toD(num) / den.toDouble / tr.toDouble, 6)
        org.apache.spark.sql.Row(lambda1, trace, frac)
    }
    spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
  }
}
