package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SQ8 scalar quantization — the FAISS IndexScalarQuantizer (QT_8bit)
 * serving mode, the third point on the repo's compression/recall curve
 * beside exact top-k (`Similarity.exactTopK`) and IVF-PQ (`Pq`): each
 * DIMENSION gets an affine int8 range trained on the corpus (per-dim
 * min/max), every vector stores one byte per dimension (8 bytes/dim of
 * fp64 → 1, vs PQ's m bytes per VECTOR), and queries score against the
 * RECONSTRUCTED corpus asymmetrically (query exact, corpus quantized —
 * the SQ-ADC shape).
 *
 * Bit-portability (the repo's oracle discipline): the corpus enters the
 * shared micro-integer frame X_d = round(x_d·10⁶) — the ONE IEEE
 * decision — and everything downstream is exact integer arithmetic:
 * scales are per-dim (min, max−min) over the X frame; the code is the
 * exact half-up integer division c_d = ⌊((X_d−mn_d)·255·2 + d_d) /
 * (2·d_d)⌋ ∈ [0, 255]; the reconstruction is the 255-scaled integer
 * R_d = 255·mn_d + c_d·d_d; and the query-to-corpus score is the exact
 * long dot Σ_d X_d(q)·R_d. DuckDB replays every step with BIGINT `//`.
 *
 * Magnitude contract: |coordinate| < 8 (unit-normalized embeddings sit
 * an order below) keeps X ≤ 8·10⁶, R ≤ 255·2·8·10⁶ ≈ 4.1e9 and the
 * dim-64 dot ≤ 2.1e18 < 2⁶³ — exact in a plain long sum.
 *
 * Scale shape: training is ONE position-exploded aggregate (2·dim longs
 * collected — metadata-scale, the `Ivf.train` declared-quantizer
 * convention); encode + reconstruction are scan-local `transform`
 * lambdas against dim-length literal arrays (no join, no shuffle);
 * serving broadcasts the query set and ranks per query — the flat-index
 * shape, O(corpus) per batch of queries like `q_sim_exact`. At 100 TB
 * the same codes drop into the IVF cell layout exactly as PQ codes do
 * (cell-restricted scoring at nprobe cells); the flat variant here is
 * the measured-recall baseline for that composition.
 */
object Sq {

  /** Per-dimension scales over the micro-integer frame: (mn_d, d_d =
    * mx_d − mn_d) as dim-length long arrays. One posexplode + hash
    * aggregate over the corpus; the collect is 2·dim values —
    * metadata-scale by construction. */
  def trainScales(emb: DataFrame, embCol: String,
      dim: Int): (Array[Long], Array[Long]) = {
    val rows = emb
      .select(posexplode(col(embCol)).as(Seq("pos", "x")))
      .select(col("pos"), round(col("x") * 1e6, 0).cast("long").as("xq"))
      .groupBy("pos")
      .agg(min("xq").as("mn"), max("xq").as("mx"))
      .orderBy("pos").collect()
    // empty corpus: degenerate zero scales (every dim collapses to code
    // 0) so the pipeline stays total — the declared empty contract
    if (rows.isEmpty) return (Array.fill(dim)(0L), Array.fill(dim)(0L))
    require(rows.length == dim,
      s"corpus has ${rows.length} positions, expected $dim")
    (rows.map(_.getAs[Long]("mn")),
      rows.map(r => r.getAs[Long]("mx") - r.getAs[Long]("mn")))
  }

  /** The query-side frame: micro-integer quantization (exact, the one
    * shared rounding). */
  def microInts(vec: Column): Column =
    transform(vec, x => round(x * 1e6, 0).cast("long"))

  /** Scan-local SQ8 codes: c_d = half-up((X_d − mn_d)·255 / d_d) as the
    * EXACT integer division ⌊(a·2 + b) / (2·b)⌋ (a = (X−mn)·255 ≥ 0,
    * b = d > 0; d = 0 collapses the dimension to code 0). The division
    * itself is the pmod identity (a2 − a2 mod b2)/b2 — an exactly
    * divisible long ratio ≤ 255, so the IEEE quotient is exact. Values
    * OUTSIDE the trained [mn, mn+d] range (possible only for vectors
    * appended after training — never the training corpus itself, where
    * the clamp is provably a no-op) clamp to the 0/255 edge codes, the
    * FAISS SQ saturation convention. */
  def codes(vec: Column, mn: Array[Long], d: Array[Long]): Column = {
    val mnLit = typedlit(mn.toSeq)
    val dLit = typedlit(d.toSeq)
    transform(vec, (x, i) => {
      val xq = round(x * 1e6, 0).cast("long")
      val mnI = element_at(mnLit, i + 1)
      val dI = element_at(dLit, i + 1)
      val a2 = (xq - mnI) * lit(510L) + dI
      val b2 = dI * lit(2L)
      when(dI === 0L, lit(0L))
        .otherwise(greatest(lit(0L), least(lit(255L),
          ((a2 - pmod(a2, b2)) / b2).cast("long"))))
    })
  }

  /** 255-scaled integer reconstruction R_d = 255·mn_d + c_d·d_d from a
    * codes array — what the asymmetric score dots against. */
  def reconstruct(codesCol: Column, mn: Array[Long],
      d: Array[Long]): Column = {
    val mnLit = typedlit(mn.toSeq)
    val dLit = typedlit(d.toSeq)
    transform(codesCol, (c, i) =>
      lit(255L) * element_at(mnLit, i + 1) + c * element_at(dLit, i + 1))
  }

  /** Flat SQ8 top-k: encode the corpus once, broadcast the (small) query
    * set, score every (query, vector) pair by the exact long dot of the
    * query's micro-ints against the reconstruction, rank per query
    * (score desc, vec_id tiebreak — deterministic in any engine), keep
    * k. Self-pairs are excluded (the exactTopK recall-eval convention).
    * Returns (q_id, vec_id, rn, score). */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, topK: Int, dim: Int,
      idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (mn, d) = trainScales(corpus, embCol, dim)
    // spread (the sq8IvfTopK convention): the encode + per-pair long-dot
    // scoring otherwise runs inside the single-file scan task
    val recon = Scale.spreadForCompute(corpus, col(idCol))
      .select(col(idCol),
        reconstruct(codes(col(embCol), mn, d), mn, d).as("__r"))
    val qs = queries.select(col(qIdCol),
      microInts(col(qEmbCol)).as("__q"))
    val scored = recon.crossJoin(broadcast(qs))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("score",
        aggregate(zip_with(col("__r"), col("__q"), (r, q) => r * q),
          lit(0L), (acc, t) => acc + t))
    val w = Window.partitionBy(qIdCol)
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col(qIdCol), col(idCol), col("rn"), col("score"))
  }

  /** IVF-composed SQ8 — the production layout the flat variant baselines:
    * SQ8 codes live per IVF cell, queries probe `nprobe` cells, and the
    * asymmetric long-dot scoring touches ONLY the probed cells' codes —
    * per-query work drops from O(corpus) to O(corpus·nprobe/k), the same
    * composition [[Pq.searchIndex]] runs for PQ codes. Same exact-integer
    * frame as [[sq8TopK]]; the cell assignment is [[Ivf.nearestCentroid]]
    * (oracle-replayable fixed quantizer). Returns (q_id, vec_id, rn,
    * score). */
  def sq8IvfTopK(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[Seq[Double]], topK: Int, nprobe: Int, dim: Int,
      idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (mn, d) = trainScales(corpus, embCol, dim)
    val recon = Scale.spreadForCompute(corpus, col(idCol))
      .select(col(idCol),
        Ivf.nearestCentroid(col(embCol), centroids).as("__cell"),
        reconstruct(codes(col(embCol), mn, d), mn, d).as("__r"))
    val probes = queries.select(col(qIdCol),
        explode(Ivf.probeList(col(qEmbCol), centroids, nprobe)).as("__cell"),
        microInts(col(qEmbCol)).as("__q"))
    val scored = recon.join(broadcast(probes), Seq("__cell"))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("score",
        aggregate(zip_with(col("__r"), col("__q"), (r, q) => r * q),
          lit(0L), (acc, t) => acc + t))
    val w = Window.partitionBy(qIdCol)
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col(qIdCol), col(idCol), col("rn"), col("score"))
  }
}
