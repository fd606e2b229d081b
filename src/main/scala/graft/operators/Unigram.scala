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
 * program FUSED scan-local (see [[dpStates]]): one substring explode,
 * ONE piece-cost broadcast join, one pivot aggregate, then both the
 * forward DP and the backward walk as pure codegen'd column
 * expressions — never a per-row UDF, no per-round jobs, no
 * checkpoints. Piece costs broadcast (a minCount-floored piece
 * vocabulary is bounded); the vocabulary frames persist and free via
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

  /** Unreachable-prefix sentinel cost: far above any real path
    * (maxWordLen · ln(corpus) · 1e6 ≲ 10⁹) yet small enough that
    * `sentinel.b + cost` can never overflow a long. */
  private val Inf = Long.MaxValue / 4

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
   * The SCAN-LOCAL fused Viterbi DP shared by [[viterbiSegment]] and
   * [[viterbiCounts]]: one bounded (position, length) substring explode
   * over the vocabulary, ONE broadcast cost join, one hash aggregate
   * folding each word's ≤ maxWordLen·maxPieceLen matched edges into a
   * small per-word cost MAP (key i·1000+j = the piece ENDING at
   * position i with length j), then the whole forward DP as ONE bounded
   * `aggregate` fold over positions 1..len: state(i) = least over j of
   * (best(i−j)+cost, j, np(i−j)+1) — struct comparison is
   * lexicographic, so ties on cost prefer the SHORTER final piece
   * exactly as the round-based min(struct) did, and j is unique per
   * candidate so the count field never decides. Returns the per-word
   * frame with `__st` = the array of len+1 state structs (index p+1 =
   * prefix p). An UNREACHABLE prefix is the sentinel (b = [[Inf]],
   * j = 0, n = 0), NEVER a null struct: real path costs are bounded by
   * maxWordLen · ln(corpus) micro-nats ≪ Inf, so `least` always
   * prefers reachable candidates, and a word the model cannot segment
   * ends with b = Inf at full length and is dropped by both consumers —
   * the same drop semantics as the round design's inner joins. (Null
   * unreachable states were tried first and REJECTED: Spark's generated
   * unsafe-projection/predicate code NPEs reading a struct field of a
   * null element of a higher-order-function result — the sentinel keeps
   * every struct non-null so claimed and actual nullability agree.)
   *
   * This replaces the round-11 design of maxWordLen localCheckpoint'ed
   * vocabulary-scale join+aggregate ROUNDS per DP block (plus the same
   * number of backward-walk joins): the entire DP is now ~3 stages
   * (vocab aggregate, edge join + map aggregate, fold projection), no
   * checkpoints, no per-round jobs. The fold lambda is interpreted
   * (higher-order functions don't codegen) but runs O(maxWordLen ·
   * maxPieceLen) tiny struct ops per VOCABULARY row — the measured
   * win over the round design is the deleted job/shuffle cascade:
   * isolated min-of-4 at sf0.1, old → fused: q_unigram_lm 3.99 → 1.24s,
   * q_unigram_prune 4.28 → 1.94s, q_unigram_retrain 7.97 → 2.51s,
   * q_unigram_fertility 3.25 → 1.28s (~2.8× family-wide), all four
   * unrolled-CTE oracles hash-matching unchanged.
   * A chained-column codegen variant (state per named column) was tried
   * and REJECTED: the optimizer inlines the chain through filter
   * pushdown/project collapse and the predicate tree grows
   * tribonacci-fast — 25 MiB task binaries at this geometry, OOM in
   * codegen on the retrain path's nested model.
   */
  private def dpStates(vocab: DataFrame, costs: DataFrame,
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= 1,
      s"need maxPieceLen/maxWordLen >= 1: $maxPieceLen/$maxWordLen")
    require(maxPieceLen < 1000, s"edge-map key is i*1000+j: $maxPieceLen")
    val words = vocab.filter(
      length(col("word")) >= 1 && length(col("word")) <= maxWordLen)
    val edges = words
      .select(col("word"), col("freq"),
        explode(expr("sequence(1, length(word))")).as("__i"))
      .select(col("word"), col("freq"), col("__i"),
        explode(expr(s"sequence(1, least($maxPieceLen, __i))")).as("__j"))
      .select(col("word"), col("freq"), col("__i"), col("__j"),
        expr("substring(word, __i - __j + 1, __j)").as("piece"))
      .join(broadcast(costs.select(col("piece"), col("cost"))), "piece")
    val cm = edges.groupBy(col("word"), col("freq"))
      .agg(map_from_entries(collect_list(struct(
        (col("__i") * 1000 + col("__j")).as("k"),
        col("cost").as("v")))).as("__cm"))
    val inf = lit(Inf)
    val sentinel = struct(inf.as("b"), lit(0).as("j"), lit(0L).as("n"))
    val zero = array(struct(lit(0L).as("b"), lit(0).as("j"),
      lit(0L).as("n")))
    val states = aggregate(expr("sequence(1, length(word))"), zero,
      (acc: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) => {
        val cands = (1 to maxPieceLen).map { j =>
          // the value branch only evaluates under i >= j, so the
          // element_at index i-j+1 is always >= 1 (ANSI-safe)
          when(i >= j, {
            val prev = element_at(acc, i - j + 1)
            val cc = try_element_at(col("__cm"), i * 1000 + j)
            when(cc.isNotNull && prev.getField("b") < inf,
              struct((prev.getField("b") + cc).as("b"), lit(j).as("j"),
                (prev.getField("n") + lit(1L)).as("n")))
              .otherwise(sentinel)
          }).otherwise(sentinel)
        }
        concat(acc, array(
          if (cands.size == 1) cands.head else least(cands: _*)))
      })
    cm.withColumn("__st", states)
  }

  /**
   * Optimal-path piece count per word WITHOUT the backward walk — the
   * fertility half of the DP: the count rides the forward argmin, so
   * the state at each word's full length holds its segmentation size.
   * Returns (word, freq, n_pieces). Used by [[fertilityUnder]]; callers
   * that need the actual pieces (the EM recount) pay [[viterbiSegment]].
   */
  def viterbiCounts(vocab: DataFrame, costs: DataFrame,
      maxPieceLen: Int, maxWordLen: Int): DataFrame =
    dpStates(vocab, costs, maxPieceLen, maxWordLen)
      .withColumn("__fin",
        element_at(col("__st"), length(col("word")) + 1))
      // unsegmentable = the Inf sentinel at full length (never null)
      .filter(col("__fin").getField("b") < Inf)
      .select(col("word"), col("freq"),
        col("__fin").getField("n").as("n_pieces"))

  /**
   * Viterbi segmentation of every vocabulary word under `costs`
   * ((piece, cost) micro-nats): one (word, freq, piece) row per chosen
   * piece occurrence. The backward walk is ALSO one bounded `aggregate`
   * fold over [[dpStates]]' state array: pos₀ = length(word); each of
   * ≤ maxWordLen hops reads the picked piece length at the current
   * position, emits substring(word, pos−j+1, j), and steps down; a
   * finished (pos = 0) or unsegmentable (sentinel state, j = 0) walk
   * passes its accumulator through unchanged, so unreachable words
   * yield an empty piece array that explode drops. No joins, no
   * checkpoints — the walk never leaves the scan.
   */
  /**
   * [[viterbiSegment]] with the piece ORDER exposed — the tokenizer's
   * actual serving output: one (word, freq, k, piece) row per chosen
   * piece, k = 1-based position from the word START (the backward walk
   * emits end→first, so k reverses the walk index). Same DP, same
   * tie-break; concatenating pieces in k order reconstructs the word
   * exactly (the round-trip law UnigramSpec pins).
   */
  def viterbiEncode(vocab: DataFrame, costs: DataFrame,
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    val df = dpStates(vocab, costs, maxPieceLen, maxWordLen)
    val walkZero = struct(length(col("word")).as("pos"),
      expr("cast(array() as array<string>)").as("pcs"))
    val walk = aggregate(expr(s"sequence(1, $maxWordLen)"), walkZero,
      (st: org.apache.spark.sql.Column, _: org.apache.spark.sql.Column) => {
        val pos = st.getField("pos")
        val jk = element_at(col("__st"), pos + 1).getField("j")
        when(pos >= 1 && jk >= 1,
          struct((pos - jk).as("pos"),
            array_append(st.getField("pcs"),
              col("word").substr(pos - jk + 1, jk)).as("pcs")))
          .otherwise(st)
      })
    // reverse the end→first walk so k counts from the word start
    df.select(col("word"), col("freq"),
        posexplode(reverse(walk.getField("pcs"))).as(Seq("__k0", "piece")))
      .select(col("word"), col("freq"),
        (col("__k0") + 1).as("k"), col("piece"))
  }

  def viterbiSegment(vocab: DataFrame, costs: DataFrame,
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    val df = dpStates(vocab, costs, maxPieceLen, maxWordLen)
    val walkZero = struct(length(col("word")).as("pos"),
      expr("cast(array() as array<string>)").as("pcs"))
    val walk = aggregate(expr(s"sequence(1, $maxWordLen)"), walkZero,
      (st: org.apache.spark.sql.Column, _: org.apache.spark.sql.Column) => {
        val pos = st.getField("pos")
        // index pos+1 is always in [1, len+1]: pos starts at len and
        // only decreases by the picked j <= pos (ANSI-safe)
        val jk = element_at(col("__st"), pos + 1).getField("j")
        when(pos >= 1 && jk >= 1,
          struct((pos - jk).as("pos"),
            array_append(st.getField("pcs"),
              col("word").substr(pos - jk + 1, jk)).as("pcs")))
          .otherwise(st)
      })
    df.select(col("word"), col("freq"),
      explode(walk.getField("pcs")).as("piece"))
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
  /**
   * ONE Kudo round against an explicit cost model: re-segment the
   * vocabulary under `costs` (hard-EM E step), recount and re-score the
   * pieces (M step), prune to `keepPieces` multi-char survivors with
   * `charCosts` supplying the single-char fallback floor. Returns the
   * round's kept vocabulary (piece, n, cost, loss). [[trainAndPrune]]
   * is the candidate stage + one kudoStep; further rounds feed the
   * previous round's (piece, cost) back in — exactly the SentencePiece
   * trainer's shrink loop (q_unigram_kudo2 runs round two,
   * oracle-checked end to end).
   */
  def kudoStep(voc: DataFrame, costs: DataFrame, charCosts: DataFrame,
      maxPieceLen: Int, maxWordLen: Int, keepPieces: Int): DataFrame = {
    val seg = viterbiSegment(voc, costs, maxPieceLen, maxWordLen)
    val n1 = seg.groupBy("piece").agg(sum(col("freq")).as("n"))
    // piece-model scale, but pruneVocab reads it three times (chars
    // branch, the loss aggregate, the union) — flatten it once. LAZY
    // checkpoint (the CC convention): the caller's first action
    // materializes it as a side effect, so the flatten costs zero extra
    // jobs instead of an eager materialization pass per kudo round.
    val trained = pieceCosts(n1.withColumnRenamed("n", "cnt"))
      .join(n1, "piece")
      .select(col("piece"), col("n"), col("cost"))
      .localCheckpoint(false)
    pruneVocab(trained, charCosts, keepPieces)
  }

  def trainAndPrune(docs: DataFrame, textCol: String, maxPieceLen: Int,
      maxWordLen: Int, minCount: Long, keepPieces: Int,
      vocab: Option[DataFrame] = None): DataFrame = {
    // `vocab` = an already-persisted boundedVocab(docs, textCol,
    // maxWordLen) when the CALLER also consumes it (the Kudo loop
    // re-segments with the same vocabulary) — one corpus scan instead
    // of two; ownership (the release hook) stays with the caller then
    val voc = vocab.getOrElse(
      boundedVocab(docs, textCol, maxWordLen).persist(Lvl))
    val cand = candidatePieces(voc, maxPieceLen, minCount).persist(Lvl)
    val cc = pieceCosts(cand)
    Scale.releaseAfterUse(
      kudoStep(voc, cc, cc, maxPieceLen, maxWordLen, keepPieces),
      if (vocab.isEmpty) Seq(voc, cand) else Seq(cand))
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
        maxPieceLen, maxWordLen, vocab = Some(voc)),
      Seq(voc, cand))
  }

  /**
   * [[fertility]] under an EXPLICIT piece-cost model ((piece, cost)
   * micro-nats) — the evaluation half of the Kudo loop: re-segment the
   * corpus with a trained or PRUNED vocabulary and read the fertility
   * delta row-for-row against the candidate-model baseline. Trained /
   * pruned models keep only pieces USED in some optimal segmentation,
   * so a character always covered by multi-char pieces may be absent;
   * words the model cannot segment at all are excluded from both the
   * fertility numerator and denominator (engine and oracle agree on the
   * exclusion). Words above maxWordLen stay outside the bounded-DP
   * contract as everywhere else — see [[fertilityOov]] for the
   * char-fallback serving path that segments them anyway.
   */
  /**
   * TOTAL serving-side fertility — [[fertilityUnder]] plus the OOV
   * char-level fallback every real corpus needs: a word OUTSIDE the
   * bounded-DP window (length > maxWordLen) or UNSEGMENTABLE under the
   * model (a pruned model may lack characters) is served as its
   * character sequence — n_pieces = length(word), the SentencePiece
   * byte/char-fallback convention with unknown characters as UNK
   * pieces — so every word segments and none drops from the report
   * (the totality contract UnigramSpec pins). The single-char floor
   * makes the fallback exactly expressible in SQL (`coalesce(dp_count,
   * len(word))`), so q_unigram_oov oracle-checks this path end to end.
   * Emits (lang, n_words, n_pieces, n_fallback, fertility) —
   * n_fallback counts the words served by the fallback, the number
   * that says how much of the corpus the bounded window actually
   * covers. Same scale shape as [[fertilityUnder]]: the DP runs on the
   * bounded word vocabulary once, the corpus pass is one explode +
   * one broadcast left join.
   */
  def fertilityOov(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, costs: DataFrame, maxPieceLen: Int,
      maxWordLen: Int, vocab: Option[DataFrame] = None): DataFrame = {
    // `vocab` may be any SUPERSET word frame (e.g. the trainer's
    // persisted window-8 vocabulary when serving at window 6): the DP
    // depends only on the word SET within the window — dpStates
    // re-filters to maxWordLen, per-word counts are model-determined,
    // and the corpus-side left join picks only the words it meets
    val voc = vocab.getOrElse(
      boundedVocab(docs, textCol, maxWordLen).persist(Lvl))
    val perWord = viterbiCounts(voc, costs, maxPieceLen, maxWordLen)
      .select(col("word"), col("n_pieces"))
    Scale.releaseAfterUse(
      Scale.spreadForCompute(docs.filter(col(textCol).isNotNull),
          col(idCol))
        .select(col(langCol).as("lang"),
          explode(split(col(textCol), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
        .join(broadcast(perWord), Seq("word"), "left")
        .withColumn("__np",
          coalesce(col("n_pieces"), length(col("word")).cast("long")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(col("__np")).as("n_pieces"),
          sum(when(col("n_pieces").isNull, 1L).otherwise(0L))
            .as("n_fallback"))
        .withColumn("fertility",
          round(col("n_pieces").cast("double") / col("n_words"), 6))
        .orderBy("lang"),
      if (vocab.isEmpty) Seq(voc) else Seq.empty)
  }

  /**
   * Per-DOCUMENT total token count under an explicit piece-cost model
   * with the [[fertilityOov]] char fallback — the tokenize stage of a
   * training-data PREPARE pipeline (q_prepare_e2e): every document gets
   * a count (totality), words outside the window or unsegmentable under
   * the model count their characters. Returns (idCol, n_tokens). Same
   * scale shape as [[fertilityOov]]: the DP runs once on the bounded
   * word vocabulary, the corpus pass is one explode + one broadcast
   * left join + one doc-key aggregate.
   */
  def tokenCountsOov(docs: DataFrame, idCol: String, textCol: String,
      costs: DataFrame, maxPieceLen: Int, maxWordLen: Int,
      vocab: Option[DataFrame] = None): DataFrame = {
    // same superset-vocab contract as [[fertilityOov]]
    val voc = vocab.getOrElse(
      boundedVocab(docs, textCol, maxWordLen).persist(Lvl))
    val perWord = viterbiCounts(voc, costs, maxPieceLen, maxWordLen)
      .select(col("word"), col("n_pieces"))
    Scale.releaseAfterUse(
      Scale.spreadForCompute(docs.filter(col(textCol).isNotNull),
          col(idCol))
        .select(col(idCol),
          explode(split(col(textCol), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
        .join(broadcast(perWord), Seq("word"), "left")
        .groupBy(idCol)
        .agg(sum(coalesce(col("n_pieces"),
          length(col("word")).cast("long"))).as("n_tokens")),
      if (vocab.isEmpty) Seq(voc) else Seq.empty)
  }

  def fertilityUnder(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, costs: DataFrame, maxPieceLen: Int,
      maxWordLen: Int, vocab: Option[DataFrame] = None): DataFrame = {
    val voc = vocab.getOrElse(
      boundedVocab(docs, textCol, maxWordLen).persist(Lvl))
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
      if (vocab.isEmpty) Seq(voc) else Seq.empty)
  }
}
