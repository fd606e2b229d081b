package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed PCA over an embedding column — the linear-projection half of
 * embedding hygiene in a training-data pipeline (FAISS runs exactly this as
 * its PCA/OPQ pre-transform before PQ; curation uses the first component as
 * a cheap "dominant direction" score for outlier screens and decorrelation
 * audits). REF has no vector analytics at all (its surface is masking); this
 * extends SURVEY §2.9-L2 the way Ivf/Pq do.
 *
 * Everything is expressed as metadata-scale DataFrame algebra — there is no
 * driver-side matrix anywhere — and the arithmetic is FIXED-POINT: each
 * vector quantizes ONCE to integer micro-units (round(x·10⁶), the one
 * IEEE decision per element, identical in any engine), and every moment,
 * covariance cell, power step and projection after that is exact integer
 * math — immune to association order, shuffle order, and engine summation
 * differences, so the whole pipeline oracle-checks bit-for-bit:
 *
 *  1. ONE corpus pass aggregates the second moments of the quantized
 *     vectors: each row explodes to its dim·(dim+1)/2 upper-triangle long
 *     products plus dim singletons, and a two-level hash aggregate reduces
 *     them to dim²-scale exact integer sums. Long products sum as longs
 *     within `nSalt` row-striped buckets first (a bucket holds ~n/nSalt
 *     terms of ≤ (10⁶·|v|_max)² each — with unit-normalized embeddings and
 *     the default 16 stripes that is exact to ~1.5·10⁸ vectors; raise nSalt
 *     linearly beyond, the bound is n ≤ nSalt·9.2·10¹⁸/(10⁶·|v|_max)²),
 *     then the dim²·nSalt bucket subtotals finish in decimal(38,0) — the
 *     per-row hot path never touches a BigDecimal (measured 3.5× faster
 *     than decimal-summing the products at sf0.1). The stripe key is
 *     row-content-free (monotonic id mod nSalt): any striping yields the
 *     same exact totals, so the nondeterminism is result-invisible. At
 *     production dims the explode is O(dim²) per row — what an exact
 *     covariance costs in ANY engine (map-side combine keeps shuffle
 *     traffic at dim²·stripes cells per task, independent of row count);
 *     past dim≈1k you subsample rows first (estimation error shrinks as
 *     1/√n, so a 1% sample of a 100 TB corpus is still overkill) — the
 *     orchestration is unchanged.
 *  2. The covariance matrix materializes as an (i, j, c) frame quantized
 *     to integer micro-units via one fixed-order double expression over
 *     the exact integer sums (IEEE-identical on identical inputs).
 *  3. Two power-iteration steps from the deterministic seed e₀ run as tiny
 *     broadcast joins over that frame (v₂ = C·(C·e₀), exact integers). Two
 *     exact steps from a fixed seed make the DIRECTION a pure function of
 *     the data — the convergence/accuracy trade is declared, not hidden:
 *     more steps only sharpen the estimate and drop into the same shape.
 *  4. v₂ re-quantizes to micro-units of its max component (`q`, ≤10⁶ —
 *     keeping every later product inside long range whatever the data
 *     magnitude), and each vector's projection is an exact long dot of
 *     the quantized vector with `q` via one posexplode + broadcast join
 *     (≤ dim·10¹²·|v|_max per doc — long-safe for any |v|_max < 10⁵),
 *     normalized by |q| only at the final double division.
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
   * Second-moment sums over the micro-quantized vectors: (i, j,
   * s = Σ qᵢ·qⱼ exact integer, n) for the upper triangle, plus
   * (i, -1, Σ qᵢ, n) first-moment rows — ONE exploded two-level
   * aggregate, dim²-scale output. `embCol` must be array<double>
   * ([[graft.functions.VectorOps.asDouble]]).
   */
  private def moments(df: DataFrame, embCol: String, dim: Int,
      nSalt: Int): DataFrame = {
    val v = col("__qv")
    val pairs = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        struct(i.as("i"), j.as("j"),
          (element_at(v, i + 1) * element_at(v, j + 1)).as("p")))))
    val firsts = transform(sequence(lit(0), lit(dim - 1)), i =>
      struct(i.as("i"), lit(-1).as("j"), element_at(v, i + 1).as("p")))
    df.filter(col(embCol).isNotNull)
      .select(quantize(col(embCol)).as("__qv"),
        pmod(monotonically_increasing_id(), lit(nSalt.toLong)).as("__sl"))
      .select(col("__sl"), explode(concat(pairs, firsts)).as("__e"))
      .groupBy(col("__e.i").as("i"), col("__e.j").as("j"), col("__sl"))
      .agg(sum(col("__e.p")).as("s1"), count(lit(1)).as("n1"))
      .groupBy("i", "j")
      .agg(sum(col("s1").cast("decimal(38,0)")).as("s"),
        sum(col("n1")).as("n"))
  }

  /**
   * Full covariance matrix as (i, j, c) with c = round(cov·10⁶) in integer
   * micro-units of the REAL covariance — the upper triangle computed from
   * the (persisted) moments frame, mirrored below the diagonal. The only
   * float arithmetic is the fixed-order (Sᵢⱼ − Sᵢ·Sⱼ/n)/n/10⁶ expression
   * over exact integer sums (Sᵢⱼ carries scale 10¹², Sᵢ·Sⱼ scale 10⁶·10⁶)
   * — IEEE doubles both engines reproduce bit-for-bit.
   */
  private def covFull(m: DataFrame): DataFrame = {
    val si = m.filter(col("j") === -1).select(col("i").as("k"), col("s").as("sk"))
    val cov = m.filter(col("j") >= 0)
      .join(broadcast(si), col("i") === col("k"))
      .drop("k").withColumnRenamed("sk", "si")
      .join(broadcast(si), col("j") === col("k"))
      .drop("k").withColumnRenamed("sk", "sj")
      .select(col("i"), col("j"),
        round((col("s").cast("double")
          - col("si").cast("double") * col("sj").cast("double")
            / col("n").cast("double")) / col("n").cast("double") / S, 0)
          .cast("decimal(12,0)").as("c"))
    cov.unionByName(cov.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("c")))
  }

  /**
   * Top principal DIRECTION of an integer matrix frame, re-quantized to
   * micro-units of its max component: (i, q decimal(7,0)). The power seed
   * is e_s for s = argmax of the DIAGONAL (largest remaining variance
   * coordinate, ties to the smallest index) — data-driven, deterministic,
   * and never orthogonal to the top eigenvector in practice (the fixed-e₀
   * seed degenerates exactly when the matrix has nothing on coordinate 0,
   * which is the common case for a DEFLATED matrix whose first component
   * lay along e₀). v₂ = C·(C·e_s) in exact integer decimal (tiny
   * broadcast joins over the dim²-row matrix frame); the single
   * re-quantizing division is double-exact on identical inputs. A zero
   * matrix yields q = 0 everywhere.
   */
  private def direction(covf: DataFrame): DataFrame = {
    val sd = covf.filter(col("i") === col("j"))
      .agg(max(struct(col("c"), (-col("i")).as("ni"))).as("m"))
      .select((-col("m.ni")).as("sd"))
    val v1 = covf.crossJoin(broadcast(sd)).filter(col("j") === col("sd"))
      .select(col("i").as("k1"), col("c").as("w1"))
    val v2 = covf.join(broadcast(v1), col("j") === col("k1"))
      .groupBy("i")
      .agg(sum(col("c").cast("decimal(12,0)") * col("w1").cast("decimal(12,0)"))
        .as("w2"))
    val mx = v2.agg(max(abs(col("w2"))).as("mx"))
    v2.crossJoin(broadcast(mx))
      .select(col("i"),
        when(col("mx") === 0, lit(0).cast("decimal(7,0)"))
          .otherwise(round(col("w2").cast("double") / col("mx").cast("double")
            * 1e6, 0).cast("decimal(7,0)")).as("q"))
  }

  /**
   * Per-vector projection onto the first principal direction:
   * (idCol, pc1 = q(v)·q / (10⁶·|q|) rounded to 6 dp), one row per
   * non-null vector. The dot is an exact long sum over the quantized
   * vector (posexplode + broadcast direction join — the standard
   * distributed-projection shape, map-side combined; ≤ dim terms of
   * ≤ 10¹²·|v|_max each, so a per-doc long sum can never overflow for
   * any realistic magnitude); |q| enters once, at the final double
   * division. pc1 = 0.0 when the direction is degenerate-zero.
   */
  /** Materialize a dim- or dim²-row frame as a flat LogicalRDD leaf.
    * The power-iteration chain is ~10 tiny stages each referencing its
    * predecessors several times, every broadcast in it plans as its own
    * job, and AQE re-optimizes per stage — with persist() alone (which
    * caches blocks but keeps the LOGICAL plan) Catalyst re-walks the
    * whole deepening lineage on every one of those jobs, and q_pca_top2
    * spent 90+ s of a 97 s run in the OPTIMIZER at sf0.1. Eager
    * localCheckpoint truncates the lineage so each stage plans over a
    * constant-size tree — the connectedComponents rhythm
    * ([[Dedup.connectedComponents]]); on a cluster, reliable
    * `checkpoint()` is the fault-tolerant variant. (Isolated min-of-3
    * A/B at sf0.1: q_pca_top2 97.6 → 5.2 s standalone; the residual is
    * ~35 metadata-scale jobs' scheduling, not compute or planning.) */
  private def pin(df: DataFrame): DataFrame = df.localCheckpoint()

  def projectPc1(df: DataFrame, idCol: String, embCol: String,
      dim: Int, nSalt: Int = 16): DataFrame = {
    // moments backs covFull's three self-references for the one eager
    // checkpoint job, then frees — nothing downstream sees its lineage
    val m = moments(df, embCol, dim, nSalt).persist(StorageLevel.MEMORY_AND_DISK)
    val covf = pin(covFull(m))
    m.unpersist(false)
    val dir = pin(direction(covf))
    val n2 = dir.agg(sum(col("q") * col("q")).as("n2"))
    Scale.spreadForCompute(
        df.filter(col(embCol).isNotNull).select(col(idCol), col(embCol)),
        col(idCol))
      .select(col(idCol), posexplode(quantize(col(embCol)))
        .as(Seq("__pos", "__x")))
      .join(broadcast(dir), col("__pos") === col("i"))
      .groupBy(idCol)
      .agg(sum(col("__x") * col("q").cast("long")).as("__s"))
      .crossJoin(broadcast(n2))
      .select(col(idCol),
        when(col("n2") === 0, lit(0.0))
          .otherwise(round(col("__s").cast("double") / S
            / sqrt(col("n2").cast("double")), 6)).as("pc1"))
  }

  /**
   * Hotelling deflation on the integer frames: C' = C − λ̂₁·(q qᵀ)/|q|²,
   * with λ̂₁ = num/den the Rayleigh pieces (exact integers) — each cell
   * subtracts one fixed-order rounded double term, so the deflated matrix
   * is again an exact integer micro-unit frame and [[direction]] runs on
   * it unchanged. A zero direction (den = 0) deflates nothing.
   */
  private def deflate(covf: DataFrame, dir: DataFrame): DataFrame = {
    val v3 = covf.join(broadcast(dir.select(col("i").as("k3"), col("q"))),
        col("j") === col("k3"))
      .groupBy("i")
      .agg(sum(col("c").cast("decimal(12,0)") * col("q").cast("decimal(8,0)"))
        .as("w3"))
    val num = dir.join(broadcast(v3), "i")
      .agg(sum(col("q").cast("decimal(8,0)") * col("w3")).as("num"))
    val den = dir.agg(sum(col("q") * col("q")).as("den"))
    val t = when(col("den") === 0, lit(0.0))
      .otherwise(col("num").cast("double") / col("den").cast("double")
        * col("qi").cast("double") * col("qj").cast("double")
        / col("den").cast("double"))
    covf
      .join(broadcast(dir.select(col("i"), col("q").as("qi"))), Seq("i"))
      .join(broadcast(dir.select(col("i").as("j"), col("q").as("qj"))),
        Seq("j"))
      .crossJoin(broadcast(num)).crossJoin(broadcast(den))
      .select(col("i"), col("j"),
        (col("c").cast("decimal(13,0)") - round(t, 0).cast("decimal(13,0)"))
          .cast("decimal(12,0)").as("c"))
  }

  /**
   * Per-vector projection onto the TOP TWO principal directions:
   * (idCol, pc1, pc2) — [[projectPc1]] plus one Hotelling deflation and a
   * second power run; both dots come out of ONE posexplode + broadcast
   * join + hash aggregate (the corpus is scanned once for both
   * components). The standard PCA-scatter / whitening-front-end shape;
   * components beyond the second repeat the same deflate-and-project
   * step. pc2 = 0.0 when the deflated spectrum is degenerate-zero.
   */
  def projectTop2(df: DataFrame, idCol: String, embCol: String,
      dim: Int, nSalt: Int = 16): DataFrame = {
    val m = moments(df, embCol, dim, nSalt).persist(StorageLevel.MEMORY_AND_DISK)
    val covf = pin(covFull(m))
    m.unpersist(false)
    val dir1 = pin(direction(covf))
    val covf2 = pin(deflate(covf, dir1))
    val dir2 = pin(direction(covf2))
    val n21 = dir1.agg(sum(col("q") * col("q")).as("n21"))
    val n22 = dir2.agg(sum(col("q") * col("q")).as("n22"))
    val both = dir1.select(col("i"), col("q").as("q1"))
      .join(dir2.select(col("i"), col("q").as("q2")), Seq("i"))
    Scale.spreadForCompute(
        df.filter(col(embCol).isNotNull).select(col(idCol), col(embCol)),
        col(idCol))
      .select(col(idCol), posexplode(quantize(col(embCol)))
        .as(Seq("__pos", "__x")))
      .join(broadcast(both), col("__pos") === col("i"))
      .groupBy(idCol)
      .agg(sum(col("__x") * col("q1").cast("long")).as("__s1"),
        sum(col("__x") * col("q2").cast("long")).as("__s2"))
      .crossJoin(broadcast(n21)).crossJoin(broadcast(n22))
      .select(col(idCol),
        when(col("n21") === 0, lit(0.0))
          .otherwise(round(col("__s1").cast("double") / S
            / sqrt(col("n21").cast("double")), 6)).as("pc1"),
        when(col("n22") === 0, lit(0.0))
          .otherwise(round(col("__s2").cast("double") / S
            / sqrt(col("n22").cast("double")), 6)).as("pc2"))
  }

  /**
   * One-row spectrum report: (lambda1, trace, frac) — the Rayleigh-quotient
   * estimate of the top eigenvalue over the quantized direction, the total
   * variance, and the explained-variance fraction (the number that decides
   * whether a PCA pre-transform is worth running before PQ, and how many
   * components a whitening step should keep). Exact integer numerator/
   * denominator (v₃ = C·q as one more tiny join), doubles only in the
   * final divisions; degenerate inputs report 0.0 rather than NaN.
   */
  def varianceExplained(df: DataFrame, embCol: String, dim: Int,
      nSalt: Int = 16): DataFrame = {
    val m = moments(df, embCol, dim, nSalt).persist(StorageLevel.MEMORY_AND_DISK)
    val covf = pin(covFull(m))
    m.unpersist(false)
    val dir = pin(direction(covf))
    val v3 = covf.join(broadcast(dir.select(col("i").as("k3"), col("q"))),
        col("j") === col("k3"))
      .groupBy("i")
      .agg(sum(col("c").cast("decimal(12,0)") * col("q").cast("decimal(8,0)"))
        .as("w3"))
    val num = dir.join(broadcast(v3), "i")
      .agg(sum(col("q").cast("decimal(8,0)") * col("w3")).as("num"))
    val den = dir.agg(sum(col("q") * col("q")).as("den"))
    val tr = covf.filter(col("i") === col("j")).agg(sum(col("c")).as("tr"))
    val out = num.crossJoin(broadcast(den)).crossJoin(broadcast(tr))
      .select(
        when(col("den") === 0, lit(0.0))
          .otherwise(round(col("num").cast("double") / col("den").cast("double")
            / 1e6, 6)).as("lambda1"),
        round(col("tr").cast("double") / 1e6, 6).as("trace"),
        when(col("den") === 0 || col("tr") === 0, lit(0.0))
          .otherwise(round(col("num").cast("double") / col("den").cast("double")
            / col("tr").cast("double"), 6)).as("frac"))
    out
  }
}
