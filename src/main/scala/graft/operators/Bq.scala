package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Binary (1-bit) quantization — the FAISS IndexBinaryFlat /
 * IndexBinaryIVF serving shape and the FOURTH point on the repo's
 * compression/recall curve: exact fp64 (512 B/vec at dim 64) → SQ8
 * (64 B) → PQ (~5 B) → sign bits (8 B packed). Each dimension keeps
 * only its sign (x > 0); distance is the Hamming distance between the
 * packed sign words (for unit-ish embeddings, Hamming approximates
 * angle: P[sign disagree] = θ/π per random hyperplane — the same
 * geometry as sign-LSH, here with the COORDINATE basis as the planes).
 * Rank-coarse but byte-cheap; the production composition reranks the
 * binary top-c with exact cosine ([[Similarity.refineTopK]] — the
 * FAISS IndexBinaryFlat + refine recipe), which q_bq_refine_recall
 * measures against q_bq_recall's codes-only baseline.
 *
 * Packing is 32 sign bits per long word, MSB-first (word = fold of
 * acc·2 + bit over positions 32w..32w+31): a 64-bit word would need
 * bit 63 and both engines make that hazardous (Spark 4 runs ANSI mode
 * — long overflow throws; DuckDB BIGINT shift/multiply overflow
 * errors), exactly the repo's >2^53/2^63 discipline. 32-bit words keep
 * every intermediate < 2^32 in plain integer arithmetic, so the
 * packing replays in any engine. dim must divide by 32.
 *
 * Determinism/oracle: the sign predicate is `x > 0` (zero packs as 0 —
 * ties at exact zero are corpus facts, not float noise), Hamming sums
 * exact ints, ranking ties break on vec_id. The DuckDB oracle scores
 * by DIRECT sign-disagreement counting (no packing), so the oracle
 * additionally proves the pack/XOR/popcount path faithful — a packing
 * bug breaks the hash (the q_media_info parser/synth convention).
 *
 * Scale shape: encoding is one scan-local transform (no shuffle, no
 * join); flat serving broadcasts the bounded query set and ranks per
 * query (the [[Sq.sq8TopK]] shape); [[bqIvfTopK]] is the cell-bounded
 * production layout (score only the probed cells' codes). At 100 TB
 * the index is 8 B + a cell id per vector — the cheapest first-stage
 * filter that still carries geometry; refine fetches only |q|·candC
 * raw vectors (corpus-size independent).
 */
object Bq {

  /** Packed sign words: ceil-free dim/32 longs, word w = MSB-first fold
    * of the sign bits of positions 32w+1..32w+32 (1-based element_at).
    * Scan-local, codegen'd, integer-only. */
  def signWords(vec: Column, dim: Int): Column = {
    require(dim >= 32 && dim % 32 == 0,
      s"dim must be a positive multiple of 32, got $dim")
    val nWords = dim / 32
    transform(sequence(lit(0), lit(nWords - 1)), w =>
      aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, i) =>
        acc * 2L + when(element_at(vec, w * 32 + i + 1) > 0.0, 1L)
          .otherwise(0L)))
  }

  /** Hamming distance between two packed sign-word arrays: Σ popcount
    * (XOR) per word — exact integer, order-free. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))
      .cast("long")), lit(0L), (acc, t) => acc + t)

  /** Flat binary top-k: pack the corpus once, broadcast the (small)
    * query set packed the same way, rank per query by (hamming asc,
    * vec_id) — deterministic in any engine. Self-pairs excluded (the
    * recall-eval convention). Returns (q_id, vec_id, rn, hamming). */
  def bqTopK(corpus: DataFrame, queries: DataFrame, topK: Int, dim: Int,
      idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spread (the bqIvfTopK convention): the sign-pack + per-pair
    // XOR/popcount scoring otherwise runs inside the single scan task
    val codes = Scale.spreadForCompute(corpus, col(idCol))
      .select(col(idCol), signWords(col(embCol), dim).as("__b"))
    val qs = queries.select(col(qIdCol),
      signWords(col(qEmbCol), dim).as("__qb"))
    val scored = codes.crossJoin(broadcast(qs))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("hamming", hamming(col("__b"), col("__qb")))
    val w = Window.partitionBy(qIdCol)
      .orderBy(col("hamming"), col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col(qIdCol), col(idCol), col("rn"), col("hamming"))
  }

  /** In-word bit masks for the MSB-first 32-bit packing: in-word index
    * p (0-based) sits under mask 2^(31−p). */
  private val WordMasks: Seq[Long] = (0 until 32).map(p => 1L << (31 - p))

  /** ±1 sign of dimension `i` (0-based lambda column) read from the
    * PACKED words — pure bitwiseAND arithmetic, no dynamic shift. */
  private def signAt(words: Column, i: Column): Column = {
    val word = element_at(words, (i / 32).cast("int") + 1)
    val mask = element_at(typedlit(WordMasks), pmod(i, lit(32)) + 1)
    when(word.bitwiseAND(mask) =!= 0L, 1L).otherwise(-1L)
  }

  /**
   * ASYMMETRIC binary top-k — the recall upgrade at IDENTICAL 8 B/vec
   * storage: the corpus stays packed sign words, but the query keeps
   * full precision (micro-ints, the [[Sq]] frame) and scores
   * Σᵢ sign(xᵢ)·q̂ᵢ — the exact dot of the query against the corpus
   * vector's sign pattern. Symmetric Hamming throws away the query's
   * magnitudes AND collapses ranking into ≤ dim+1 distinct values
   * (huge tie groups, see q_bq_ivf_recall's inversion note); the
   * asymmetric score is a real-valued surrogate with the same index
   * bytes — the asymmetric-hashing idea (Dong et al. 2008; FAISS's ADC
   * applied at 1 bit/dim). Exact integer end to end: signs are ±1 from
   * the packed words (bitwiseAND against literal masks — no dynamic
   * shifts), q̂ = round(q·10⁶), |score| ≤ dim·8·10⁶ ≪ 2⁶³. Ranked by
   * (score desc, vec_id); self-pairs excluded. Returns (q_id, vec_id,
   * rn, score). */
  /** The asymmetric score Σᵢ sign(xᵢ)·q̂ᵢ of a micro-int query column
    * against packed sign words — shared by [[bqAsymTopK]] and the
    * `Ann --asym` serving path so batch and artifact serving can never
    * disagree. Exact long: |score| ≤ dim·8·10⁶ ≪ 2⁶³. */
  def asymScore(words: Column, qMicro: Column, dim: Int): Column =
    aggregate(sequence(lit(0), lit(dim - 1)), lit(0L), (acc, i) =>
      acc + signAt(words, i) * element_at(qMicro, i + 1))

  def bqAsymTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
      dim: Int, idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = corpus.select(col(idCol),
      signWords(col(embCol), dim).as("__b"))
    val qs = queries.select(col(qIdCol),
      transform(col(qEmbCol), x => round(x * 1e6, 0).cast("long"))
        .as("__q"))
    val scored = codes.crossJoin(broadcast(qs))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("score", asymScore(col("__b"), col("__q"), dim))
    val w = Window.partitionBy(qIdCol)
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col(qIdCol), col(idCol), col("rn"), col("score"))
  }

  /** IVF-composed binary search — the production layout ([[Pq
    * .searchIndex]]'s shape with Hamming over sign words as the code
    * distance): codes live per IVF cell, queries probe `nprobe` cells,
    * scoring touches only the probed cells' 8-byte codes. Same fixed
    * quantizer ([[Ivf.nearestCentroid]]) as every cell layout here, so
    * the whole search oracle-replays. Returns (q_id, vec_id, rn,
    * hamming). */
  def bqIvfTopK(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[Seq[Double]], topK: Int, nprobe: Int, dim: Int,
      idCol: String = "vec_id", embCol: String = "emb",
      qIdCol: String = "q_id", qEmbCol: String = "q_emb"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = Scale.spreadForCompute(corpus, col(idCol))
      .select(col(idCol),
        Ivf.nearestCentroid(col(embCol), centroids).as("__cell"),
        signWords(col(embCol), dim).as("__b"))
    val probes = queries.select(col(qIdCol),
      explode(Ivf.probeList(col(qEmbCol), centroids, nprobe)).as("__cell"),
      signWords(col(qEmbCol), dim).as("__qb"))
    val scored = codes.join(broadcast(probes), Seq("__cell"))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("hamming", hamming(col("__b"), col("__qb")))
    val w = Window.partitionBy(qIdCol)
      .orderBy(col("hamming"), col(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col(qIdCol), col(idCol), col("rn"), col("hamming"))
  }
}
