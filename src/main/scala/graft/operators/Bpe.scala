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

  /** Pair counts over an already-symbolized (syms, freq) table. Position
    * explode + codegen'd element_at, not the interpreted [[adjacentPairs]]
    * transform — same pairs, multiplicity kept (the trigram lesson, see
    * TextAnalysis.explodeTrigrams). */
  def symbolPairCounts(symsDf: DataFrame): DataFrame =
    symsDf.filter(size(col("syms")) >= 2)
      .select(col("freq"), col("syms"),
        explode(expr("sequence(1, size(syms) - 1)")).as("__bp"))
      .select(col("freq"), expr(
        "concat_ws(' ', element_at(syms, __bp), element_at(syms, __bp + 1))")
        .as("pair"))
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

  /** [[train]]'s result: the ordered merge list, the final symbolized
    * vocabulary (word, syms, freq), and how many count→select→apply
    * rounds actually ran (the job count driving wall-clock at scale). */
  final case class Trained(merges: Seq[(String, String)], vocab: DataFrame,
    rounds: Int)

  /**
   * Learn `numMerges` merges from the corpus.
   *
   * Each round: one pair-count aggregate over the vocabulary, ONE small
   * driver-side collect (the top of the count table, ties broken
   * lexicographically — plans as TakeOrderedAndProject), then a
   * scan-local fold applies the round's merges. The vocabulary
   * re-persists per round because the next round's counts depend on this
   * round's fold (same lazy-localCheckpoint rhythm as
   * connectedComponents); rounds stop early when no pair repeats.
   *
   * `batch` bounds how many merges one round may take. batch=1 (the
   * default) is EXACTLY classic sequential greedy BPE — the semantics
   * BpeSpec pins. batch=N takes up to N pairs from the round's count
   * table in greedy (n desc, pair asc) order, subject to two rejection
   * rules that keep the round's stale counts exact for every selected
   * pair: (1) symbol-disjointness — merging (a,b) cannot create or
   * destroy a (c,d) adjacency when {a,b} ∩ {c,d} = ∅; (2) no element of
   * a later pick may equal the MERGED symbol of an earlier pick this
   * round (e.g. ("abc","d") after ("a","bc")) — such a pick would consume
   * adjacencies the earlier merge mints mid-fold, which its count never
   * saw. The only divergence from sequential greedy is that a pair minted
   * mid-round cannot outrank a later pick until the next round — the
   * standard batched-BPE trade. A real 30k-merge vocabulary collapses
   * from 30k sequential Spark jobs to ~30k/N, the difference between
   * hours of job-scheduling overhead and minutes.
   */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      batch: Int = 1): Trained = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var syms = vocab(docs, textCol)
      .select(col("word"),
        filter(split(col("word"), ""), s => s =!= lit("")).as("syms"),
        col("freq"))
      .persist(lvl)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var done = false
    while (merges.size < numMerges && !done) {
      val want = math.min(batch, numMerges - merges.size)
      // Over-fetch ×4 so overlap skips don't starve a round; still a
      // metadata-scale collect (tiny strings), and with batch=1 the first
      // row is the classic argmax so the over-fetch is semantics-free.
      val pool = symbolPairCounts(syms.select(col("syms"), col("freq")))
        .filter(col("n") >= 2)
        .orderBy(col("n").desc, col("pair")).limit(want * 4)
        .collect()
      if (pool.isEmpty) done = true
      else {
        rounds += 1
        val used = scala.collection.mutable.Set.empty[String]
        // Merged symbols minted by pairs already picked THIS round: a later
        // pick whose element equals one (e.g. ("abc","d") after ("a","bc"))
        // would consume adjacencies the earlier merge creates mid-fold, so
        // its count table was stale — reject it; it can win next round.
        // Symbol-disjointness alone does not cover this case.
        val minted = scala.collection.mutable.Set.empty[String]
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val it = pool.iterator
        while (it.hasNext && picked.size < want) {
          val parts = it.next().getString(0).split(" ", 2)
          if (!used(parts(0)) && !used(parts(1)) &&
              !minted(parts(0)) && !minted(parts(1))) {
            used += parts(0); used += parts(1)
            minted += parts(0) + parts(1)
            picked += ((parts(0), parts(1)))
          }
        }
        merges ++= picked
        val next = syms
          .select(col("word"),
            picked.foldLeft(col("syms")) { case (c, (a, b)) =>
              mergePair(c, a, b)
            }.as("syms"),
            col("freq"))
          .persist(lvl)
        next.count() // materialize before unpersisting the parent
        syms.unpersist()
        syms = next
      }
    }
    Trained(merges.toSeq, syms, rounds)
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
