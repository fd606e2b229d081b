package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * KMV (k-minimum-values) distinct-value sketches (Beyer et al., "On
 * Synopses for Distinct-Value Estimation Under Multiset Operations",
 * SIGMOD 2007): a group's sketch is the k SMALLEST distinct portable
 * hashes of its members — a pure function of the set, so unlike
 * HyperLogLog-style register sketches it is bit-identical across engines,
 * partitionings and re-runs, and the whole estimation pipeline
 * oracle-checks. This is the ESTIMATION path beside the exact operators:
 * `Curation.sourceOverlap` answers cross-source overlap exactly by
 * joining shingles; at 100 TB a per-source KMV answers cardinality and
 * every pairwise Jaccard from O(k) state per source, merged with plain
 * set algebra. REF has no sketch surface; extends SURVEY §2.9 the way
 * CountMin does for frequency.
 *
 * Scale shape: one distinct on (group, hash), then ONE bounded-state
 * aggregate ([[graft.functions.MinKAgg]] — map-side partials already
 * capped at k, so the shuffle moves O(k·groups·partitions) longs);
 * estimation and pairwise merges run over the k·groups sketch rows —
 * metadata scale however large the corpus.
 *
 * Estimator: with h uniform in [0, 2⁶⁰) ([[Dedup.portableHash64]]),
 * n̂ = (k−1)·2⁶⁰/h₍ₖ₎ (the unbiased KMV estimator); a group with fewer
 * than k distinct members keeps its sketch complete and reports the
 * EXACT count. Pairwise Jaccard: the k smallest of A∪B are a uniform
 * sample of A∪B, so |sample ∩ A ∩ B|/|sample| estimates J(A,B) — the
 * MinHash argument over one merged sketch.
 */
object Sketch {

  /** 2⁶⁰ as an exact double — the portable-hash value space. */
  private val HashSpace = 1.152921504606846976e18

  /** Distinct (groupCol, h) canonical-fingerprint hashes: md5 canonical
    * text fingerprint ([[Dedup.fingerprint]]) re-hashed to the uniform
    * 60-bit long the estimator needs. */
  def fingerprintHashes(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(groupCol),
        Dedup.portableHash64(Dedup.fingerprint(col(textCol))).as("h"))
      .distinct()

  /**
   * Per-group KMV sketch + exact distinct count: (groupCol, sketch
   * array<long> ascending ≤ k, n_distinct). The input-distinct + bounded
   * aggregate pair is the whole pass; `n_distinct` rides along free
   * (the hash frame is already distinct).
   */
  def kmv(hashes: DataFrame, groupCol: String, k: Int): DataFrame = {
    val minK = udaf(new graft.functions.MinKAgg(k))
    hashes.groupBy(groupCol)
      .agg(minK(col("h")).as("sketch"), count(lit(1)).as("n_distinct"))
  }

  /** Cardinality estimate from a sketch column: exact size when the
    * sketch is incomplete (|group| < k), else (k−1)·2⁶⁰/h₍ₖ₎ rounded to
    * 6 dp — one fixed-order double expression, engine-portable. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(round(lit((k - 1).toDouble) * lit(HashSpace)
        / element_at(sketch, k).cast("double"), 6))

  /** Scalar twin of [[kmvEstimate]] for streaming state
    * ([[graft.streaming.Streams.kmvSketch]]): same branch structure and
    * the same rounding Spark's `round` applies to doubles
    * (BigDecimal.valueOf + HALF_UP), so streamed and batch estimates are
    * bit-identical on identical sketches. */
  def estimateScalar(sketch: Seq[Long], k: Int): Double =
    if (sketch.size < k) sketch.size.toDouble
    else java.math.BigDecimal.valueOf((k - 1).toDouble * HashSpace
      / sketch.last.toDouble)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /**
   * All pairwise overlap estimates from per-group sketches: (src_a,
   * src_b, n_merged, n_shared, jaccard_est) for every group pair a < b.
   * The merged sketch (k smallest of A∪B) is rebuilt relationally —
   * union of the two sketches' rows, per-pair rank ≤ k — and the shared
   * count semi-joins it back against both sides, so the whole merge is
   * engine-portable relational algebra over k·groups rows (no
   * list-function dialect anywhere). Pair enumeration is a broadcast
   * non-equi join of the group list with itself — groups are
   * metadata-scale (sources, shards, languages), never data-scale.
   */
  def kmvJaccardPairs(sketches: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val (mg, _, shared) = mergedSketchRows(sketches, groupCol, k)
    mg.groupBy("src_a", "src_b").agg(count(lit(1)).as("n_merged"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_merged"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)).cast("double")
          / col("n_merged").cast("double"), 6).as("jaccard_est"))
  }

  /** Shared pair-merge core of [[kmvJaccardPairs]]/[[kmvSetPairs]]: for
    * every ordered group pair, the merged sketch's rows (src_a, src_b, h,
    * __rn ≤ k — the k smallest of A∪B rebuilt relationally), the ranked
    * frame itself, and the per-pair shared-hash counts. */
  private def mergedSketchRows(sketches: DataFrame, groupCol: String,
      k: Int): (DataFrame, DataFrame, DataFrame) = {
    val rows = sketches
      .select(col(groupCol), explode(col("sketch")).as("h"))
    val a = rows.select(col(groupCol).as("src_a"), col("h"))
    val b = rows.select(col(groupCol).as("src_b"), col("h"))
    val groups = sketches.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("src_a"))
      .join(broadcast(groups.select(col(groupCol).as("src_b"))),
        col("src_a") < col("src_b"))
    val unionRows = pairs.join(a, "src_a")
      .unionByName(pairs.join(b, "src_b"))
      .select(col("src_a"), col("src_b"), col("h")).distinct()
    val w = Window.partitionBy("src_a", "src_b").orderBy("h")
    val mg = unionRows.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    val shared = mg
      .join(a, Seq("src_a", "h"), "left_semi")
      .join(b, Seq("src_b", "h"), "left_semi")
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    (mg, pairs, shared)
  }

  /**
   * KMV SET ALGEBRA: pairwise |A ∪ B| and |A ∩ B| estimates from the same
   * O(k)-per-group sketches — the other half of [[kmvJaccardPairs]]'s
   * report, closing the sketch family (cardinality / jaccard / union /
   * intersection). union_est applies [[kmvEstimate]]'s exact rule to the
   * merged sketch (exact count while the merge is incomplete, else
   * (k−1)·2⁶⁰/h₍ₖ₎); inter_est is the standard composed estimator
   * round((n_shared/n_merged) · union_est, 6) — the Jaccard estimate
   * scaled onto the union estimate, fixed operation order so it is
   * engine-portable. Same relational merge, no list dialect anywhere.
   */
  def kmvSetPairs(sketches: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val (mg, _, shared) = mergedSketchRows(sketches, groupCol, k)
    val agg = mg.groupBy("src_a", "src_b").agg(
      count(lit(1)).as("n_merged"),
      max(when(col("__rn") === k, col("h"))).as("__hk"))
    val unionEst = when(col("n_merged") < k, col("n_merged").cast("double"))
      .otherwise(round(lit((k - 1).toDouble) * lit(HashSpace)
        / col("__hk").cast("double"), 6))
    agg.join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), unionEst.as("union_est"),
        coalesce(col("n_shared"), lit(0L)).cast("double").as("__ns"),
        col("n_merged").cast("double").as("__nm"))
      .select(col("src_a"), col("src_b"), col("union_est"),
        round(col("__ns") / col("__nm") * col("union_est"), 6)
          .as("inter_est"))
  }
}
