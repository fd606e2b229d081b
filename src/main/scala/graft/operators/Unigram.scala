package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-LM tokenizer training (Kudo 2018, the SentencePiece unigram
 * model) — the second production tokenizer beside [[Bpe]]: instead of
 * greedily growing merges, a CANDIDATE piece vocabulary is scored as a
 * unigram language model and each word is segmented by Viterbi into its
 * maximum-likelihood piece sequence; piece counts from that segmentation
 * re-estimate the model (the hard-EM variant of the paper's E step —
 * Viterbi counts instead of full forward-backward expectations, the
 * standard practical simplification).
 *
 * Scale shape (the [[Bpe.train]] argument): the corpus collapses to the
 * word-frequency vocabulary first — ONE hash aggregate, after which
 * corpus size never matters again. Candidate counting is a bounded
 * position explode over that vocabulary; Viterbi is a bounded dynamic
 * program unrolled as `maxWordLen` vocabulary-scale rounds (each ONE
 * piece-cost broadcast join + ONE min-struct aggregate — never a
 * per-row UDF, never driver state beyond the loop counter), and the
 * backward walk is the same number of equi-join rounds against the
 * persisted forward frames. Piece costs broadcast (a minCount-floored
 * piece vocabulary is bounded); per-round frames persist and free via
 * [[Scale.releaseAfterUse]].
 *
 * Determinism & oracle portability: costs are INTEGER micro-nats —
 * cost(x) = round((ln(total) − ln(cnt(x))) · 1e6) with each ln taken of
 * an integer and rounded once to decimal(17,10) (the bigramLmScore
 * recipe) — so DP sums are exact longs, the argmin tie-break is
 * (cost, shortest-piece j), and the whole trainer — candidates, both
 * Viterbi passes, the EM recount, the final scores — reproduces
 * bit-for-bit in any engine; q_unigram_lm oracle-checks it end to end
 * against an unrolled-DP SQL translation.
 *
 * Bounded-DP contract: words longer than `maxWordLen` characters are
 * excluded from training (the fixture's words are 100% ≤ 8 chars; a real
 * corpus picks maxWordLen at its word-length tail exactly as
 * SentencePiece caps sentence length). Single-character pieces are
 * always kept regardless of `minCount`, so every word is segmentable
 * and the DP always completes.
 */
object Unigram {

  private val Lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** ln of an integer-valued column, rounded once to decimal(17,10) —
    * the engine-portable ln recipe shared with Curation.bigramLmScore. */
  private def lnDec(c: org.apache.spark.sql.Column) =
    log(c.cast("double")).cast("decimal(17,10)")

  /** The word-frequency vocabulary restricted to the bounded-DP window:
    * (word, freq), words of 1..maxWordLen characters. */
  def boundedVocab(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    Bpe.vocab(docs, textCol).filter(length(col("word")) <= maxWordLen)

  /**
   * Candidate pieces: every substring of length 1..maxPieceLen of every
   * vocabulary word, counted with the word's corpus frequency
   * (multiplicity kept — a substring occurring twice in a word counts
   * twice). Pieces below `minCount` are dropped EXCEPT single characters
   * (the segmentability floor). One bounded double position-explode over
   * the vocabulary + one hash aggregate.
   */
  def candidatePieces(vocab: DataFrame, maxPieceLen: Int,
      minCount: Long): DataFrame =
    vocab
      .select(col("word"), col("freq"),
        explode(expr("sequence(1, length(word))")).as("__s"))
      .select(col("word"), col("freq"), col("__s"),
        explode(expr(
          s"sequence(1, least($maxPieceLen, length(word) - __s + 1))"))
          .as("__j"))
      .select(expr("substring(word, __s, __j)").as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .filter(col("cnt") >= minCount || length(col("piece")) === 1)

  /** Integer micro-nat costs from a (piece, cnt) table:
    * cost = round((ln Σcnt − ln cnt) · 1e6) — exact decimals throughout,
    * so DP sums are exact longs in any engine. */
  def pieceCosts(pieces: DataFrame): DataFrame = {
    val tot = pieces.agg(sum(col("cnt")).as("__t"))
    pieces.crossJoin(broadcast(tot))
      .select(col("piece"),
        round((lnDec(col("__t")) - lnDec(col("cnt"))) * lit(1000000), 0)
          .cast("long").as("cost"))
  }

  /**
   * Viterbi segmentation of every vocabulary word under `costs`
   * ((piece, cost) micro-nats): returns one (word, freq, piece) row per
   * chosen piece occurrence. Forward pass: maxWordLen rounds, round i
   * computing the best segmentation cost of each word's i-char prefix
   * from the ≤ maxPieceLen previous rounds (one broadcast cost join +
   * one min(struct(cost, j)) aggregate — ties prefer the SHORTER final
   * piece, deterministically). Backward pass: the same number of
   * equi-join rounds re-reading the persisted forward frames to emit
   * the argmin path. All frames are vocabulary-scale; persists freed
   * via releaseAfterUse once the caller's first action completes.
   */
  /**
   * The forward DP shared by [[viterbiSegment]] and [[viterbiCounts]]:
   * returns (bounded words frame, per-position frames B(i) holding
   * (word, best, jpick, np) — optimal prefix cost, the chosen final
   * piece length, and the PIECE COUNT of the optimal prefix path, which
   * rides the same (cost, j) argmin so counts need no backward walk).
   *
   * Every round is localCheckpoint'ed (eager), never merely persisted:
   * B(i)'s plan references up to maxPieceLen earlier rounds, so
   * unbroken lineage grows TRIBONACCI-fast in i and Catalyst
   * optimization hangs before any data moves (the connectedComponents
   * lesson, Dedup.scala:768). A checkpointed round is a flat
   * LogicalRDD — constant-size plans at the cost of one
   * vocabulary-scale job per round. (A two-round checkpoint window was
   * tried and REJECTED: the unflattened odd rounds nest into the
   * backward pass's ball union and Catalyst analysis blew past 10
   * minutes where this version runs in seconds.) The cost model is
   * checkpointed ONCE — it broadcasts into every round, and for the
   * retrain path its upstream is a whole training pass (17.8s → 9.3s
   * isolated min-of-3 on q_unigram_retrain at sf0.1 from that line).
   */
  private def forwardDp(vocab: DataFrame, costs: DataFrame,
      maxPieceLen: Int, maxWordLen: Int): (DataFrame, Array[DataFrame]) = {
    require(maxPieceLen >= 1 && maxWordLen >= 1,
      s"need maxPieceLen/maxWordLen >= 1: $maxPieceLen/$maxWordLen")
    val costsCp = costs.localCheckpoint()
    val words = vocab.filter(
      length(col("word")) >= 1 && length(col("word")) <= maxWordLen)
    // forward: best(i) = min over j of best(i-j) + cost(word[i-j+1 .. i])
    val B = new Array[DataFrame](maxWordLen + 1)
    B(0) = words.select(col("word"), lit(0L).as("best"), lit(0).as("jpick"),
        lit(0L).as("np"))
      .localCheckpoint()
    for (i <- 1 to maxWordLen) {
      val cand = (1 to math.min(maxPieceLen, i)).map { j =>
        B(i - j).filter(length(col("word")) >= i)
          .select(col("word"), col("best"), lit(j).as("__j"), col("np"),
            expr(s"substring(word, ${i - j + 1}, $j)").as("piece"))
      }.reduce(_ unionByName _)
        .join(broadcast(costsCp), "piece")
        .select(col("word"), (col("best") + col("cost")).as("__b"),
          col("__j"), col("np"))
      // np rides the (cost, j) argmin — j is unique per branch, so the
      // struct min never reaches the count field
      val bi = cand.groupBy("word")
        .agg(min(struct(col("__b"), col("__j"),
          (col("np") + 1L).as("__n"))).as("__m"))
        .select(col("word"), col("__m.__b").as("best"),
          col("__m.__j").as("jpick"), col("__m.__n").as("np"))
      B(i) = bi.localCheckpoint()
    }
    (words, B)
  }

  /**
   * Optimal-path piece count per word WITHOUT the backward walk — the
   * fertility half of the DP: np rides the forward argmin, so the count
   * at each word's full length IS its segmentation size. Returns
   * (word, freq, n_pieces). Used by [[fertilityUnder]]; callers that
   * need the actual pieces (the EM recount) pay for [[viterbiSegment]].
   */
  def viterbiCounts(vocab: DataFrame, costs: DataFrame,
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    val (words, b) = forwardDp(vocab, costs, maxPieceLen, maxWordLen)
    val ends = (1 to maxWordLen).map(i =>
      b(i).select(col("word"), lit(i).as("pos"), col("np")))
      .reduce(_ unionByName _)
    words.select(col("word"), col("freq"),
        length(col("word")).as("pos"))
      .join(ends, Seq("word", "pos"))
      .select(col("word"), col("freq"), col("np").as("n_pieces"))
  }

  def viterbiSegment(vocab: DataFrame, costs: DataFrame,
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    val (words, b) = forwardDp(vocab, costs, maxPieceLen, maxWordLen)
    val maxW = b.length - 1
    val ball = (1 to maxW).map(i =>
      b(i).select(col("word"), lit(i).as("pos"), col("jpick")))
      .reduce(_ unionByName _)
    // backward: walk the argmin path, emitting the chosen piece per hop.
    // Each step IS checkpointed: it has two consumers (the piece emit
    // and the next state), and leaving the chain lazy re-plans every
    // earlier step's ball-join per union branch — O(maxWordLen²)
    // SHUFFLE joins in one action, measured 8.5s vs 3.6s for this
    // checkpointed form on q_unigram_lm at sf0.1 (isolated min-of-3).
    var state = words.select(col("word"), col("freq"),
      length(col("word")).as("pos"))
    val segs = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (_ <- 1 to maxW) {
      val step = state.filter(col("pos") > 0)
        .join(ball, Seq("word", "pos"))
        .localCheckpoint()
      segs += step.select(col("word"), col("freq"),
        expr("substring(word, pos - jpick + 1, jpick)").as("piece"))
      state = step.select(col("word"), col("freq"),
        (col("pos") - col("jpick")).as("pos"))
    }
    segs.reduce(_ unionByName _)
  }

  /**
   * One hard-EM round over the corpus: candidate counts → initial costs
   * → Viterbi segmentation → piece re-count. Returns (piece, n, cost)
   * where n is the frequency-weighted count of the piece in the
   * maximum-likelihood segmentation and cost its UPDATED micro-nat
   * score — the trained model (further rounds fold the same two steps).
   */
  def trainOnce(docs: DataFrame, textCol: String, maxPieceLen: Int,
      maxWordLen: Int, minCount: Long): DataFrame = {
    val voc = boundedVocab(docs, textCol, maxWordLen).persist(Lvl)
    val cand = candidatePieces(voc, maxPieceLen, minCount).persist(Lvl)
    val seg = viterbiSegment(voc, pieceCosts(cand), maxPieceLen, maxWordLen)
    val n1 = seg.groupBy("piece").agg(sum(col("freq")).as("n"))
    Scale.releaseAfterUse(
      pieceCosts(n1.withColumnRenamed("n", "cnt"))
        .join(n1, "piece")
        .select(col("piece"), col("n"), col("cost")),
      Seq(voc, cand))
  }

  /**
   * [[trainOnce]] + [[pruneVocab]] fused so the candidate stage (vocab
   * scan, substring counts, initial costs) runs ONCE — the shape the
   * full Kudo loop uses (train, prune, re-train against the survivors).
   */
  def trainAndPrune(docs: DataFrame, textCol: String, maxPieceLen: Int,
      maxWordLen: Int, minCount: Long, keepPieces: Int): DataFrame = {
    val voc = boundedVocab(docs, textCol, maxWordLen).persist(Lvl)
    val cand = candidatePieces(voc, maxPieceLen, minCount).persist(Lvl)
    val cc = pieceCosts(cand)
    val seg = viterbiSegment(voc, cc, maxPieceLen, maxWordLen)
    val n1 = seg.groupBy("piece").agg(sum(col("freq")).as("n"))
    // piece-model scale, but pruneVocab reads it three times (chars
    // branch, the loss aggregate, the union) — flatten it once
    val trained = pieceCosts(n1.withColumnRenamed("n", "cnt"))
      .join(n1, "piece")
      .select(col("piece"), col("n"), col("cost"))
      .localCheckpoint()
    Scale.releaseAfterUse(pruneVocab(trained, cc, keepPieces),
      Seq(voc, cand))
  }

  /**
   * Vocabulary pruning (the Kudo trainer's shrink step, with a tractable
   * loss bound): every multi-character piece is scored by the corpus
   * log-likelihood loss of removing it, UPPER-BOUNDED by falling its
   * occurrences back to single characters — loss(x) = n(x) · (Σ_{c∈x}
   * cost(c) − cost(x)), exact integer micro-nats (the true loss
   * re-segments optimally and can only be smaller; the bound ranks
   * identically when piece interactions are weak, and is computable in
   * ONE scan + one broadcast char-cost join instead of a per-piece DP).
   * Keeps the `keepPieces` highest-loss multi-char pieces (ties on the
   * piece string) plus ALL single characters — the segmentability floor,
   * so the pruned model still covers every word. `charCosts` supplies
   * the single-character fallback costs ((piece, cost) — pass the
   * CANDIDATE-stage [[pieceCosts]] output, which provably contains every
   * corpus character; the trained frame alone may lack characters that
   * no optimal segmentation used). Returns (piece, n, cost, loss) for
   * the kept vocabulary; re-training against it is another
   * [[viterbiSegment]] round, exactly the Kudo loop.
   */
  def pruneVocab(trained: DataFrame, charCosts: DataFrame,
      keepPieces: Int): DataFrame = {
    require(keepPieces >= 0, s"keepPieces must be >= 0: $keepPieces")
    val chars = charCosts.filter(length(col("piece")) === 1)
      .select(col("piece").as("__c"), col("cost").as("__ccost"))
    val multi = trained.filter(length(col("piece")) > 1)
      .select(col("piece"), col("n"), col("cost"),
        explode(expr("sequence(1, length(piece))")).as("__s"))
      .select(col("piece"), col("n"), col("cost"),
        expr("substring(piece, __s, 1)").as("__c"))
      .join(broadcast(chars), "__c")
      .groupBy("piece")
      .agg(max(col("n")).as("n"), max(col("cost")).as("cost"),
        sum(col("__ccost")).as("__alt"))
      .select(col("piece"), col("n"), col("cost"),
        (col("n") * (col("__alt") - col("cost"))).as("loss"))
      .orderBy(col("loss").desc, col("piece"))
      .limit(keepPieces)
    trained.filter(length(col("piece")) === 1)
      .select(col("piece"), col("n"), col("cost"),
        lit(null).cast("long").as("loss"))
      .unionByName(multi)
  }

  /**
   * Per-language fertility of the TRAINED unigram tokenizer (pieces per
   * word over the corpus, frequency-weighted through the word join) —
   * the q_bpe_fertility shape, so the two tokenizer families compare
   * row-for-row. Words above maxWordLen are outside the bounded-DP
   * contract and excluded from both numerator and denominator.
   */
  def fertility(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, maxPieceLen: Int, maxWordLen: Int,
      minCount: Long): DataFrame = {
    val voc = boundedVocab(docs, textCol, maxWordLen).persist(Lvl)
    val cand = candidatePieces(voc, maxPieceLen, minCount).persist(Lvl)
    Scale.releaseAfterUse(
      fertilityUnder(docs, idCol, textCol, langCol, pieceCosts(cand),
        maxPieceLen, maxWordLen),
      Seq(voc, cand))
  }

  /**
   * [[fertility]] under an EXPLICIT piece-cost model ((piece, cost)
   * micro-nats) — the evaluation half of the Kudo loop: re-segment the
   * corpus with a trained or PRUNED vocabulary and read the fertility
   * delta row-for-row against the candidate-model baseline. The model
   * must contain every corpus character (all exported models do — the
   * segmentability floor); words above maxWordLen stay outside the
   * bounded-DP contract as everywhere else.
   */
  def fertilityUnder(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, costs: DataFrame, maxPieceLen: Int,
      maxWordLen: Int): DataFrame = {
    val voc = boundedVocab(docs, textCol, maxWordLen).persist(Lvl)
    // counts only — the forward-DP np field, no backward walk
    val perWord = viterbiCounts(voc, costs, maxPieceLen, maxWordLen)
      .select(col("word"), col("n_pieces"))
    Scale.releaseAfterUse(
      Scale.spreadForCompute(docs.filter(col(textCol).isNotNull),
          col(idCol))
        .select(col(langCol).as("lang"),
          explode(split(col(textCol), "\\s+")).as("word"))
        .filter(length(col("word")) > 0 &&
          length(col("word")) <= maxWordLen)
        .join(broadcast(perWord), "word")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"))
        .withColumn("fertility",
          round(col("n_pieces").cast("double") / col("n_words"), 6))
        .orderBy("lang"),
      Seq(voc))
  }
}
