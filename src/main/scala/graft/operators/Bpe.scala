package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed byte-pair-encoding (BPE) tokenizer training — the missing
 * piece between the text-curation operators (which count tokens with a
 * fixed splitter, TextAnalysis.tokenCountRe) and an actual LLM data
 * pipeline, which must LEARN its vocabulary from the corpus it just
 * curated.
 *
 * The scale shape is the classic one (Sennrich et al. 2016, adapted to
 * data-parallel execution): the corpus collapses to a WORD-FREQUENCY
 * table first (one hash aggregate — corpus size never matters again,
 * only vocabulary size), every pair-count pass is an explode + map-side-
 * combining aggregate over that vocabulary, and each merge round ships
 * exactly ONE (pair) scalar to the driver — the same metadata-only
 * driver traffic as connectedComponents' convergence counter.
 *
 * Determinism: pair counts are exact longs; the winning pair breaks ties
 * lexicographically; merging is a greedy left-to-right fold — so the
 * merge list is a pure function of the corpus, reproducible on any
 * engine/partitioning (the property BpeSpec pins and the q_bpe_pairs
 * oracle checks for the count stage).
 */
object Bpe {

  /** Word-frequency vocabulary: one hash aggregate over the tokenized
    * corpus. Everything downstream runs against THIS — at 100 TB the
    * vocabulary is millions of rows where the corpus is trillions. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    Scale.spreadForCompute(docs.filter(col(textCol).isNotNull),
        xxhash64(col(textCol)))
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs of one symbol array, space-joined ("l o"),
    * duplicates kept (multiplicity is the count being learned). */
  def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1),
        i => concat_ws(" ", element_at(syms, i), element_at(syms, i + 1))))

  /** Frequency-weighted adjacent-pair counts over a (word, freq) vocab
    * whose words are still raw strings (initial character symbols). */
  def pairCounts(vocabDf: DataFrame): DataFrame =
    symbolPairCounts(vocabDf.select(col("freq"),
      filter(split(col("word"), ""), s => s =!= lit("")).as("syms")))

  /** Pair counts over an already-symbolized (syms, freq) table. */
  def symbolPairCounts(symsDf: DataFrame): DataFrame =
    symsDf.select(col("freq"), explode(adjacentPairs(col("syms"))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("n"))

  /** Greedy left-to-right merge of one (a, b) pair inside a symbol array
    * — the BPE apply step as a scan-local fold: walking left to right,
    * when the accumulator's last symbol is `a` and the next is `b` they
    * fuse; the fused symbol immediately re-participates (so pair (a,a)
    * over "a a a" yields "aa a", the standard greedy semantics). */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(element_at(acc, -1), s))))
        .otherwise(concat(acc, array(s))))

  /**
   * Learn `numMerges` merges from the corpus. Returns the ordered merge
   * list and the final symbolized vocabulary (word, syms, freq).
   *
   * Each round: one pair-count aggregate over the vocabulary, ONE
   * driver-side row (the argmax pair, ties broken lexicographically —
   * plans as TakeOrderedAndProject), then a scan-local fold applies the
   * merge. The vocabulary re-persists per round because round k+1's
   * counts depend on round k's fold (same lazy-localCheckpoint rhythm as
   * connectedComponents); rounds stop early when no pair repeats.
   */
  def train(docs: DataFrame, textCol: String, numMerges: Int)
      : (Seq[(String, String)], DataFrame) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var syms = vocab(docs, textCol)
      .select(col("word"),
        filter(split(col("word"), ""), s => s =!= lit("")).as("syms"),
        col("freq"))
      .persist(lvl)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val top = symbolPairCounts(syms.select(col("syms"), col("freq")))
        .filter(col("n") >= 2)
        .orderBy(col("n").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val parts = top(0).getString(0).split(" ", 2)
        val (a, b) = (parts(0), parts(1))
        merges += ((a, b))
        val next = syms
          .select(col("word"), mergePair(col("syms"), a, b).as("syms"),
            col("freq"))
          .persist(lvl)
        next.count() // materialize before unpersisting the parent
        syms.unpersist()
        syms = next
      }
    }
    (merges.toSeq, syms)
  }

  /** Apply an already-learned merge list to a corpus' vocabulary —
    * tokenization with a trained tokenizer. Scan-local: the merge list
    * is plan state (it is vocabulary metadata, thousands of entries). */
  def applyMerges(vocabDf: DataFrame, merges: Seq[(String, String)])
      : DataFrame = {
    val init = vocabDf.select(col("word"),
      filter(split(col("word"), ""), s => s =!= lit("")).as("syms"),
      col("freq"))
    merges.foldLeft(init) { case (df, (a, b)) =>
      df.select(col("word"), mergePair(col("syms"), a, b).as("syms"),
        col("freq"))
    }
  }
}
