package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for a training-data pipeline: benchmark
 * decontamination, cross-document boilerplate detection, token-budget
 * sequence packing, and int8 embedding quantization.
 *
 * Scale design: decontamination meets the corpus via a broadcast
 * left-semi join on the (small) benchmark n-gram set — the 100 TB corpus
 * side is scan + broadcast probe, no corpus shuffle; boilerplate
 * detection is one hash aggregate over exploded chunks (partial
 * aggregation map-side); packing is a per-group running sum (single
 * shuffle on the group key); quantization is scan-only array arithmetic
 * inside whole-stage codegen.
 */
object Curation {

  /**
   * Benchmark decontamination: ids of training docs sharing at least one
   * word n-gram with the benchmark corpus. The benchmark n-gram set is
   * deduplicated and broadcast (eval sets are thousands of docs; corpora
   * are billions), so the corpus side never shuffles.
   */
  def contaminated(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    // words projected separately: tokenize once per row, not per shingle
    // slot (see Dedup.shingles hot-path note)
    val trainGrams = train
      .select(col(idCol), split(col(textCol), "\\s+").as("__words"))
      .select(col(idCol),
        explode(Dedup.shinglesFromWords(col("__words"), n)).as("gram"))
    val benchGrams = bench
      .select(split(col(textCol), "\\s+").as("__words"))
      .select(explode(Dedup.shinglesFromWords(col("__words"), n)).as("gram"))
      .distinct()
    trainGrams.join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(idCol).distinct()
  }

  /** Non-overlapping word chunks of width `w`; the trailing partial chunk
    * is kept (slice past the end returns what remains). Same hot-path
    * note as Dedup.shingles: prefer [[chunksFromWords]] over a projected
    * word array when chunking feeds a join or aggregate. */
  def chunks(text: Column, w: Int): Column =
    chunksFromWords(split(text, "\\s+"), w)

  /** [[chunks]] over an already-tokenized word array column. */
  def chunksFromWords(words: Column, w: Int): Column =
    transform(sequence(lit(0), ((size(words) - 1) / w).cast("int")),
      i => concat_ws(" ", slice(words, i * w + 1, lit(w))))

  /**
   * Cross-document boilerplate: word chunks of width `w` that occur in
   * more than one distinct document (headers, footers, license blocks in
   * a real corpus). One explode + one hash aggregate; no joins.
   */
  def boilerplateChunks(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    docs.select(col(idCol), split(col(textCol), "\\s+").as("__words"))
      .select(col(idCol),
        explode(chunksFromWords(col("__words"), w)).as("chunk"))
      .groupBy("chunk")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") > 1)

  /**
   * Token-budget sequence packing, first-fit by running offset: docs are
   * laid out in `orderCol` order within each `groupCol`, and a doc joins
   * the sequence its start offset falls in (offset div budget). Output is
   * one row per (group, seq_id) with doc and token counts. Deterministic,
   * engine-portable (integer arithmetic only), one shuffle on the group
   * key.
   */
  def packSequences(docs: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    docs
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("seq_id",
        floor((col("__cum") - col(tokensCol)) / budget).cast("long"))
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("sum_tokens"))
  }

  /**
   * Per-vector int8 scalar quantization: map [min, max] linearly onto
   * [-128, 127] with floor(x + 0.5) rounding (identical semantics in any
   * IEEE engine, unlike round()'s mode-dependent halves). Constant
   * vectors (mx == mn) quantize to -128.
   */
  def quantizeInt8(v: Column, mn: Column, mx: Column): Column =
    when(mx === mn, transform(v, _ => lit(-128)))
      .otherwise(transform(v, x =>
        floor((x - mn) * 255.0 / (mx - mn) + 0.5).cast("int") - 128))

  /** Inverse of [[quantizeInt8]] (lossy). */
  def dequantize(q: Column, mn: Column, mx: Column): Column =
    transform(q, qi => (qi + 128).cast("double") * (mx - mn) / 255.0 + mn)

  /** Mean absolute reconstruction error of a quantized vector, as a
    * left-fold so the summation order is engine-portable. */
  def meanAbsDequantError(v: Column, q: Column, mn: Column, mx: Column): Column =
    aggregate(zip_with(v, dequantize(q, mn, mx), (x, xr) => abs(x - xr)),
      lit(0.0), (acc, e) => acc + e) / size(v)
}
