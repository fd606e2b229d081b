package graft.operators

import graft.functions.VectorOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (SURVEY §2.9 L2).
 *
 * Two paths, as a 100 TB design requires:
 *  - [[exactTopK]] — brute-force cosine top-k for a SMALL broadcast query
 *    set. O(|corpus| × |queries|): correct, oracle-checkable, and the right
 *    tool when |queries| is tens — but NOT the scale path for all-pairs.
 *  - [[lshBuckets]] / [[lshTopK]] — random-hyperplane (sign) LSH: a
 *    scan-only signature per vector, then candidates meet inside a bucket.
 *    The only shuffle is the bucket groupBy/join; no O(n²) pair explosion.
 */
object Similarity {

  /**
   * Shared tail of every top-k variant: rank a scored candidate set per
   * query by cosine (id tiebreak), keep the first k, drop the helper norms.
   */
  private[operators] def rankTopK(scored: DataFrame, qIdCol: String,
      idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k).drop("__norm", "__qnorm")
  }

  /**
   * Norms are per-row, so compute them once per side before any pair
   * explosion instead of twice per pair (|candidates| times).
   */
  private[operators] def withCos(c: DataFrame, embCol: String,
      qEmbCol: String): DataFrame =
    c.withColumn("cos",
      dot(col(embCol), col(qEmbCol)) / (col("__norm") * col("__qnorm")))

  /**
   * Top-k cosine neighbours for each query vector. `queries` must be small
   * (it is broadcast); ranking ties break on vec_id for determinism.
   */
  def exactTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    val c = corpus.withColumn("__norm", l2Norm(col(embCol)))
    val q = queries.withColumn("__qnorm", l2Norm(col(qEmbCol)))
    val scored = withCos(c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col(qIdCol)), embCol, qEmbCol)
    rankTopK(scored, qIdCol, idCol, k)
  }

  /**
   * The standard recall@k verdict shared by every ANN measurement row
   * (IVF-PQ, rotated variants, SQ8, the rotate-auto probe): `exact` and
   * `approx` are (q_id, vec_id) id-frames of each pipeline's top-k; the
   * result is one row per query — (q_id, n_hit, recall) with recall =
   * hits / k. Keeping the join/denominator/null-handling in ONE place
   * means a convention change cannot silently diverge across
   * measurement rows.
   */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame =
    exact.join(approx.withColumn("__hit", lit(1L)),
        Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_hit"),
        (col("n_hit").cast("double") / k).as("recall"))
      .orderBy("q_id")

  /**
   * IVF-Flat (FAISS IndexIVFFlat): exact cosine over ONLY the probed
   * cells' vectors — the uncompressed middle of the accuracy/cost
   * curve between [[exactTopK]] (full scan per query) and the
   * quantized serves (Sq/Bq/Pq's `*IvfTopK`). One scan assigns each
   * corpus vector its cell ([[Ivf.nearestCentroid]] — scan-local
   * literal argmin); the query side explodes to nprobe (q, cell) rows
   * and BROADCASTS into a hash join on the cell, so the corpus never
   * shuffles and each query pays only its probed cells' candidates.
   * Ranking ties break on id, the [[rankTopK]] convention.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[Seq[Double]], topK: Int, nprobe: Int,
      idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    // spread the corpus side first (the Ivf.topK convention): a compact
    // corpus arrives as one scan partition and the assignment + in-cell
    // cosine ranking would serialize into a single task (measured: the
    // whole q_ivf_flat stage 0.97 s in 1 task); no-op on a wide scan
    val c = Scale.spreadForCompute(corpus, col(idCol))
      .withColumn("__cell", Ivf.nearestCentroid(col(embCol), centroids))
      .withColumn("__norm", l2Norm(col(embCol)))
    val q = queries
      .withColumn("__cell",
        explode(Ivf.probeList(col(qEmbCol), centroids, nprobe)))
      .withColumn("__qnorm", l2Norm(col(qEmbCol)))
    val scored = withCos(c.join(broadcast(q), Seq("__cell"))
      .filter(col(idCol) =!= col(qIdCol)), embCol, qEmbCol)
    rankTopK(scored, qIdCol, idCol, topK).drop("__cell")
  }

  /**
   * Hard-negative mining for contrastive training: per query, the top-k
   * MOST similar corpus vectors that are NOT near-duplicates of it
   * (cosine < `dupThreshold`). The near-dup band is what SemDeDup-style
   * dedup removes as redundant; just below it live the hardest negatives —
   * similar enough to be informative, distinct enough to be true
   * negatives. Same broadcast-crossJoin shape as [[exactTopK]] (queries
   * must be small); the dup gate is a scan-local predicate on the
   * already-computed cosine, so the plan is exactTopK's plus one Filter —
   * at 100 TB swap the candidate source for the LSH/IVF bucket join
   * exactly as [[lshTopK]] does.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      dupThreshold: Double,
      idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    val c = corpus.withColumn("__norm", l2Norm(col(embCol)))
    val q = queries.withColumn("__qnorm", l2Norm(col(qEmbCol)))
    val scored = withCos(c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col(qIdCol)), embCol, qEmbCol)
      .filter(col("cos") < dupThreshold)
    rankTopK(scored, qIdCol, idCol, k)
  }

  /**
   * Exact-cosine refinement of an ANN candidate list — the FAISS
   * IndexRefine serving shape: an approximate stage (ADC codes, LSH
   * buckets, BM25) proposes candidate ids per query; this fetches ONLY
   * those vectors from the corpus (the candidate list broadcasts into
   * ONE corpus scan — the corpus is never rescanned per query),
   * recomputes the EXACT cosine against the query vectors, and re-ranks
   * to `topK`. At 100 TB the refine cost is |queries|·candC vector
   * fetches against a single embeddings probe — independent of corpus
   * size — and the rerank window partitions per query over ≤ candC rows.
   *
   * `cands` needs (qIdCol, idCol); any extra columns (e.g. the
   * approximate distance the candidate arrived with) ride through to the
   * output, the [[graft.operators.TextAnalysis.retrieveRerank]] bm25
   * convention. Candidates without a corpus vector drop out (inner
   * probe); no self-filter is applied — refine exactly what the
   * candidate stage proposed. Returns cands' columns + (cos, rn).
   */
  def refineTopK(cands: DataFrame, corpus: DataFrame, queries: DataFrame,
      topK: Int, idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    val fetched = corpus
      .select(col(idCol), col(embCol), l2Norm(col(embCol)).as("__norm"))
      .join(broadcast(cands), Seq(idCol))
    val q = queries.select(col(qIdCol), col(qEmbCol),
      l2Norm(col(qEmbCol)).as("__qnorm"))
    val scored = withCos(fetched.join(broadcast(q), Seq(qIdCol)),
      embCol, qEmbCol)
    rankTopK(scored, qIdCol, idCol, topK).drop(embCol, qEmbCol)
  }

  /**
   * Deterministic random hyperplanes: `n` planes of dimension `dim`, seeded
   * Gaussian — the projection basis is part of the operator definition, so
   * signatures are reproducible across runs and engines.
   */
  def hyperplanes(n: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /**
   * Sign-LSH bucket id (0 .. 2^planes-1) for each row: bit i is the sign of
   * the projection onto plane i. Computed as one scan-only expression chain.
   */
  def withLshBucket(df: DataFrame, embCol: String,
      planes: Seq[Seq[Double]]): DataFrame = {
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(dot(col(embCol), typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("bucket", bucket.cast("long"))
  }

  /** Bucket histogram — the candidate-set size profile of the LSH index. */
  def lshBuckets(df: DataFrame, embCol: String, planes: Seq[Seq[Double]]): DataFrame =
    withLshBucket(df, embCol, planes)
      .groupBy("bucket").agg(count(lit(1)).as("n_vectors"))

  /**
   * Approximate top-k: rank candidates only within each query's bucket.
   * The scale path — the crossJoin of exactTopK is replaced by an equi-join
   * on bucket, so work is proportional to bucket sizes, not |corpus|².
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Seq[Seq[Double]],
      idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    val c = withLshBucket(corpus, embCol, planes)
      .withColumn("__norm", l2Norm(col(embCol)))
    val q = withLshBucket(queries, qEmbCol, planes)
      .withColumnRenamed("bucket", "q_bucket")
      .withColumn("__qnorm", l2Norm(col(qEmbCol)))
    val scored = withCos(c.join(q, col("bucket") === col("q_bucket") &&
      col(idCol) =!= col(qIdCol)), embCol, qEmbCol)
    rankTopK(scored, qIdCol, idCol, k)
  }

  /**
   * Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
   * from each query's top-`candK` cosine candidates, greedily pick `k`
   * maximizing `lambda·rel − mu·max_{s∈picked} cos(c, s)` — the
   * diversified re-rank every retrieval/few-shot sampler runs so the
   * result set is not k near-copies of the best hit. The first pick
   * scores `lambda·rel` (empty-set diversity term = 0), ties break on
   * the candidate id. `lambda`/`mu` are independent parameters (NOT
   * mu = 1−lambda computed here) so the caller — and the oracle —
   * control the exact double literals.
   *
   * Scale shape: candidates come from [[exactTopK]] (swap in the
   * LSH/IVF candidate source at 100 TB exactly as [[lshTopK]] does);
   * everything after is candidate-scale — |queries|·candK rows joined
   * per round against the ≤ |queries|·k broadcast picked set, one max
   * aggregate, one per-query argmax window. k−1 bounded rounds, picks
   * persisted and freed via [[Scale.releaseAfterUse]].
   */
  def mmrSelect(corpus: DataFrame, queries: DataFrame, candK: Int, k: Int,
      lambda: Double = 0.7, mu: Double = 0.3,
      idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    require(k >= 1 && candK >= k, s"need candK >= k >= 1: candK=$candK k=$k")
    val held = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val cands = exactTopK(corpus, queries, candK, idCol, embCol, qIdCol,
        qEmbCol)
      .select(col(qIdCol), col(idCol), col("cos").as("__rel"),
        col(embCol).as("__cemb"), col("rn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    held += cands
    var all = cands.filter(col("rn") === 1)
      .select(col(qIdCol), col(idCol), lit(1L).as("pick"),
        (lit(lambda) * col("__rel")).as("score"), col("__cemb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    held += all
    (2 to k).foreach { r =>
      val selEmb = all.select(col(qIdCol).as("__q2"), col("__cemb").as("__semb"))
      val remaining = cands
        .join(all.select(col(qIdCol), col(idCol)), Seq(qIdCol, idCol),
          "left_anti")
      val maxSim = remaining
        .join(broadcast(selEmb), col(qIdCol) === col("__q2"))
        .select(col(qIdCol), col(idCol),
          graft.functions.VectorOps.cosine(col("__cemb"), col("__semb"))
            .as("__s"))
        .groupBy(qIdCol, idCol).agg(max(col("__s")).as("__ms"))
      val w = Window.partitionBy(qIdCol)
        .orderBy(col("__mmr").desc, col(idCol))
      val pick = remaining.join(maxSim, Seq(qIdCol, idCol))
        .withColumn("__mmr",
          lit(lambda) * col("__rel") - lit(mu) * col("__ms"))
        .withColumn("__prn", row_number().over(w))
        .filter(col("__prn") === 1)
        .select(col(qIdCol), col(idCol), lit(r.toLong).as("pick"),
          col("__mmr").as("score"), col("__cemb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      held += pick
      all = all.unionByName(pick)
    }
    Scale.releaseAfterUse(
      all.select(col(qIdCol), col("pick"), col(idCol), col("score")),
      held.toSeq)
  }
}
