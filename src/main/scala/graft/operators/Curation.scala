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
    // repartition: the corpus-side shingle explode is CPU-bound, and a
    // compact corpus read as one scan partition would run it in a single
    // task (see Dedup.containmentPairs)
    val trainGrams = Scale.spreadForCompute(
      train.filter(col(textCol).isNotNull), col(idCol))
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

  /**
   * Bloom-filter bitmap over the distinct values of column `c`, packed 64
   * bits per long. The k probe positions per value come from
   * Kirsch-Mitzenmacher double hashing (h1 + i·h2 mod m) over xxhash64 and
   * murmur3 — two independent hashes buy k probes without k hash passes.
   * The driver holds only the m-bit sketch (mBits/8 bytes), never the
   * element set: a 1-Gbit filter is 128 MB broadcast state regardless of
   * how many billions of elements went in.
   */
  def bloomBuild(df: DataFrame, c: String, mBits: Int, k: Int): Array[Long] = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a positive multiple of 64: $mBits")
    val words = new Array[Long](mBits / 64)
    // positions fold into packed 64-bit words DISTRIBUTED (bit_or partial
    // aggregate), so the driver receives at most mBits/64 rows — never the
    // k·|elements| raw positions, which for a 1-Gbit filter over billions
    // of elements would not fit any driver
    df.select(explode(bloomPositions(col(c), mBits, k)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        expr("shiftleft(1L, cast(pos % 64 AS int))").as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("bits"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** The k bit positions of one value. The murmur3 stride is forced odd so
    * a zero/even second hash still walks distinct slots for every i. */
  private[operators] def bloomPositions(v: Column, mBits: Int, k: Int): Column = {
    val h1 = xxhash64(v)
    val stride = hash(v).cast("long") * 2 + 1
    array((0 until k).map(i =>
      pmod(h1 + lit(i.toLong) * stride, lit(mBits.toLong))): _*)
  }

  /**
   * Scan-local Bloom probe: true iff all k bits are set. Pure codegen'd
   * arithmetic over a literal long array (no UDF), so it runs inside the
   * scan's whole-stage-codegen pass and prunes rows before any shuffle.
   * One-sided error: false positives only, never false negatives.
   *
   * The literal binding is for SMALL (default-sized) filters only: a
   * lit() array is plan state, serialized with every task and referenced
   * once per probe, so a 128 MB filter would ship ~k × 128 MB of plan
   * literals. Past [[LitBloomMaxBits]] use [[bloomMightContainCol]] with a
   * one-row broadcast (as [[contaminatedBloom]] does): Spark's torrent
   * broadcast ships the bitmap once per executor, not per task.
   */
  def bloomMightContain(v: Column, bitmap: Array[Long], k: Int): Column =
    bloomMightContainCol(v, lit(bitmap), bitmap.length * 64L, k)

  /** [[bloomMightContain]] probing a BOUND bitmap column (bind the array
    * once — e.g. a one-row broadcast cross join — instead of embedding a
    * plan literal per probe). Same arithmetic, still codegen'd. */
  def bloomMightContainCol(v: Column, bm: Column, mBits: Long, k: Int): Column = {
    val h1 = xxhash64(v)
    val stride = hash(v).cast("long") * 2 + 1
    (0 until k).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * stride, lit(mBits))
      getbit(element_at(bm, (pos / 64).cast("int") + 1), pos % 64) === 1
    }.reduce(_ && _)
  }

  /** Largest bitmap worth embedding as a plan literal (128 KB); beyond
    * this, [[contaminatedBloom]] binds the bitmap via broadcast instead. */
  val LitBloomMaxBits: Long = 1L << 20

  /**
   * [[contaminated]] with a Bloom pre-filter: the corpus's exploded grams
   * are probed against a bitmap of the benchmark grams BEFORE any join, so
   * only true hits plus the filter's false-positive residue ever leave the
   * scan; an exact semi-join over the survivors then removes the false
   * positives, so the result is bit-identical to [[contaminated]].
   *
   * Why this matters at 100 TB: a broadcast hash relation costs ~50+ bytes
   * per benchmark gram, a Bloom bitmap ~1.2 bytes at 1% FP — when the
   * benchmark suite grows past broadcast size, the bitmap still ships to
   * every executor, and the exact verify join then runs over the tiny
   * candidate set instead of the whole corpus (shuffle-join-able even when
   * the gram set itself cannot broadcast).
   */
  def contaminatedBloom(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, mBits: Int = 1 << 16, k: Int = 5): DataFrame = {
    // persisted: the gram set feeds two consumers (the bitmap build's
    // collect and the exact verify join) — without the persist the bench
    // corpus is re-shingled for each
    val benchGrams = bench
      .select(split(col(textCol), "\\s+").as("__words"))
      .select(explode(Dedup.shinglesFromWords(col("__words"), n)).as("gram"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bitmap = bloomBuild(benchGrams, "gram", mBits, k)
    // repartition for the same single-scan-partition reason as contaminated
    val grams = Scale.spreadForCompute(
      train.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), split(col(textCol), "\\s+").as("__words"))
      .select(col(idCol),
        explode(Dedup.shinglesFromWords(col("__words"), n)).as("gram"))
    // small filters embed as a plan literal; big ones bind ONCE through a
    // one-row broadcast cross join, so the bitmap ships per executor
    // (torrent broadcast) instead of per task × per probe as plan state
    val candidates =
      if (mBits <= LitBloomMaxBits)
        grams.filter(bloomMightContain(col("gram"), bitmap, k))
      else
        grams.crossJoin(broadcast(
            train.sparkSession.range(1).select(lit(bitmap).as("__bloom"))))
          .filter(bloomMightContainCol(col("gram"), col("__bloom"),
            mBits.toLong, k))
          .drop("__bloom")
    // the bitmap-build collect above already ran (operator-internal
    // action); the verify semi-join is the one remaining consumer, so the
    // gram set frees once the caller's action completes
    Scale.releaseAfterUse(
      candidates.join(broadcast(benchGrams), Seq("gram"), "left_semi")
        .select(idCol).distinct(),
      Seq(benchGrams))
  }

  /**
   * Corpus-composition overlap matrix: pairwise shingle Jaccard between
   * the values of a partition column (source, domain, crawl dump…) — the
   * "how much does source A duplicate source B" question that informs
   * training-mix weights before any doc-level dedup runs. Only pairs
   * sharing at least one shingle appear.
   *
   * Scale: works on DISTINCT (group, shingle) rows, so the self-join on
   * the shingle emits at most G·(G−1)/2 rows per shingle (G = number of
   * groups, e.g. 20 sources) — bounded per key regardless of corpus size;
   * no doc-level pair explosion anywhere. Per-group totals broadcast back
   * into the G²-row matrix. The Jaccard is ONE division of two exact
   * longs — bit-identical in any IEEE engine, no rounding needed.
   */
  def sourceOverlap(docs: DataFrame, groupCol: String, textCol: String,
      shingleN: Int): DataFrame = {
    val sh = Scale.spreadForCompute(
      docs.filter(col(textCol).isNotNull), col(groupCol))
      .select(col(groupCol).as("__g"),
        explode(Dedup.shinglesFromWords(split(col(textCol), "\\s+"), shingleN))
          .as("__sh"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = sh.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val pairs = sh.select(col("__g").as("src_a"), col("__sh"))
      .join(sh.select(col("__g").as("src_b"), col("__sh")), "__sh")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    Scale.releaseAfterUse(
      pairs
        .join(broadcast(tot.select(col("__g").as("src_a"), col("__n").as("n_a"))),
          "src_a")
        .join(broadcast(tot.select(col("__g").as("src_b"), col("__n").as("n_b"))),
          "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
          col("n_b"),
          (col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
            .as("jaccard")),
      Seq(sh))
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
    // repartition for the same single-scan-partition reason as contaminated
    Scale.spreadForCompute(docs.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), split(col(textCol), "\\s+").as("__words"))
      .select(col(idCol),
        explode(chunksFromWords(col("__words"), w)).as("chunk"))
      .groupBy("chunk")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") > 1)

  /**
   * Boilerplate REMOVAL — the cleaning transform on top of
   * [[boilerplateChunks]] (the CCNet-style dedup-then-clean move): drop
   * every width-`w` chunk that occurs in more than one distinct document
   * (headers, footers, license blocks) and reassemble each document from
   * its surviving chunks in original order. Returns (id, n_chunks, n_kept,
   * clean_text); a doc whose every chunk is boilerplate survives with
   * empty text — dropping it is the caller's policy decision.
   *
   * Scale: the chunk explode feeds THREE consumers (boilerplate census,
   * anti join, per-doc totals), so it persists once; the census is a
   * partial-aggregating count and the removal an anti join co-partitioned
   * with it on the chunk; reassembly is one per-doc hash aggregate whose
   * (pos, chunk) structs sort IN-ROW (array_sort over the collected list —
   * no window, no second corpus-wide sort).
   */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    // words projected separately: tokenize once per row, not once per
    // chunk slot inside the transform lambda (the Dedup.shingles hot-path
    // rule — this explode is the pipeline's expensive stage)
    val chunked = Scale.spreadForCompute(
      docs.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), split(col(textCol), "\\s+").as("__words"))
      .select(col(idCol), posexplode(chunksFromWords(col("__words"), w))
        .as(Seq("__pos", "__chunk")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // min(id) != max(id) ⟺ >1 distinct doc, in ONE map-side-combining
    // shuffle instead of countDistinct's two (see Dedup.spansFromAnchors)
    val boiler = chunked.groupBy(col("__chunk"))
      .agg(min(col(idCol)).as("__lo"), max(col(idCol)).as("__hi"))
      .filter(col("__lo") =!= col("__hi"))
      .select(col("__chunk"))
    val totals = chunked.groupBy(col(idCol)).agg(count(lit(1)).as("n_chunks"))
    val kept = chunked.join(boiler, Seq("__chunk"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__pos"), col("__chunk")))),
          x => x("__chunk"))).as("clean_text"))
    Scale.releaseAfterUse(
      totals.join(kept, Seq(idCol), "left")
        .na.fill(0L, Seq("n_kept"))
        .na.fill("", Seq("clean_text")),
      Seq(chunked))
  }

  /** Line-level rejection phrases (case-insensitive substring match) —
    * C4's "enable javascript" / cookie-notice rule. Shared with the
    * oracle SQL so the two engines apply the same policy. */
  val bannedLinePhrases: Seq[String] = Seq("javascript", "cookie policy")

  /** C4's per-line keep rule: ends in terminal punctuation, has at least
    * `minWords` whitespace-separated words, and carries none of
    * [[bannedLinePhrases]]. Pure codegen'd predicate over one line. */
  def keepLine(line: Column, minWords: Int): Column =
    line.rlike("[.!?]$") &&
      size(split(trim(line), "\\s+")) >= minWords &&
      bannedLinePhrases.map(p => !lower(line).contains(p)).reduce(_ && _)

  /**
   * C4-style line-level filtering (Raffel et al. 2020 §2.2) — the cleanup
   * pass between HTML extraction and document-level quality gates: split
   * the document into lines, keep only lines that end in terminal
   * punctuation, have ≥ `minWords` words, and mention no banned phrase
   * (javascript/cookie boilerplate), then reassemble the survivors in
   * order. A single scan-local higher-order `filter` over the split
   * array — zero shuffles, zero explodes; at 100 TB this runs at scan
   * speed inside whole-stage codegen.
   */
  def filterLines(text: Column, minWords: Int): Column =
    array_join(filter(split(text, "\n"), l => keepLine(l, minWords)), "\n")

  /** The Gopher stop-word presence set (Rae et al. 2021, Table A1): a
    * document must contain at least two of these as space-delimited
    * lowercase words. Shared with the oracle SQL so the two engines
    * apply the same policy. */
  val gopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher document-level quality rules (Rae et al. 2021, "Scaling
   * Language Models: Methods, Analysis & Insights from Training Gopher",
   * Table A1) — the document-shape complement to [[filterLines]] (C4's
   * line rules) and TextAnalysis.repetitionRatio (Gopher's repetition
   * section): word-count bounds, mean-word-length band, symbol-to-word
   * ratios (# and ...), bullet-start / ellipsis-end line fractions,
   * alphabetic-word fraction, stop-word presence, and the all-rules
   * verdict. Every rule is integer arithmetic over scan-local counts —
   * thresholds cross-multiplied, never divided — so the flags hash-match
   * across engines, and the whole report is ONE codegen'd projection:
   * zero shuffles, zero explodes, scan speed at 100 TB.
   */
  def gopherFlags(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = col("__t")
    def cntSub(sub: String): Column = // non-overlapping occurrence count
      ((length(t) - length(expr(s"replace(__t, '$sub', '')")))
        / sub.length).cast("long") // removed length is a multiple: exact
    val nw = size(split(t, "\\s+")).cast("long")
    val wchars = length(regexp_replace(t, "\\s+", "")).cast("long")
    val lines = split(t, "\n")
    val nl = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      substring(l, 1, 2) === "- " || substring(l, 1, 2) === "* " ||
        substring(l, 1, 1) === "•")).cast("long")
    val nEllEnd = size(filter(lines, l => l.like("%..."))).cast("long")
    val nAlpha = size(filter(split(t, "\\s+"),
      w => w.rlike("[A-Za-z]"))).cast("long")
    val padded = concat(lit(" "), lower(t), lit(" "))
    val stopHits = gopherStopWords
      .map(s => when(padded.contains(s" $s "), 1).otherwise(0))
      .reduce(_ + _)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol).as("__t"))
      .select(col(idCol), nw.as("n_words"),
        nw.between(minWords, maxWords).as("r_word_count"),
        (wchars >= nw * 3 && wchars <= nw * 10).as("r_mean_len"),
        (cntSub("#") * 10 <= nw && cntSub("...") * 10 <= nw).as("r_symbol"),
        (nBullet * 10 <= nl * 9).as("r_bullet"),
        (nEllEnd * 10 <= nl * 3).as("r_ellipsis"),
        (nAlpha * 5 >= nw * 4).as("r_alpha"),
        (stopHits >= 2).as("r_stop"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_len") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stop"))
  }

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

  /** Ordered word-pair structs (w1, w2) over consecutive positions,
    * duplicates kept — LM scoring needs occurrence multiplicity. Arrays
    * with fewer than two words yield no pairs. */
  def bigramsFromWords(words: Column): Column =
    when(size(words) >= 2,
      transform(sequence(lit(1), size(words) - 1), i =>
        struct(element_at(words, i).as("w1"),
          element_at(words, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Exploded bigram occurrences (keepCols..., w1, w2) — the fast path of
    * `explode(bigramsFromWords(...))`: a primitive-int position explode
    * plus codegen'd element_at lookups (the higher-order transform is
    * interpreted and allocates a struct array per doc — the trigram
    * lesson, see TextAnalysis.explodeTrigrams). Arrays with fewer than
    * two words emit nothing, exactly like bigramsFromWords. */
  def explodeBigrams(df: DataFrame, keepCols: Seq[String],
      wordsCol: String): DataFrame =
    df.filter(size(col(wordsCol)) >= 2)
      .select(keepCols.map(col) ++ Seq(col(wordsCol),
        explode(expr(s"sequence(1, size($wordsCol) - 1)")).as("__bp")): _*)
      .select(keepCols.map(col) ++ Seq(
        expr(s"element_at($wordsCol, __bp)").as("w1"),
        expr(s"element_at($wordsCol, __bp + 1)").as("w2")): _*)

  /**
   * Bigram language-model quality score — the CCNet-style perplexity
   * filter signal: the corpus itself is the LM (bigram and context counts
   * are corpus aggregates) and each document scores the add-one-smoothed
   * average log-probability of its own bigrams,
   * avg over occurrences of [ln(c_bigram + 1) − ln(c_context + V)].
   * Low scores flag garbled or out-of-distribution text.
   *
   * Engine-portable determinism: ln is taken of INTEGERS only, and each
   * term is cast to a fixed-scale decimal BEFORE the per-document sum, so
   * the aggregate adds exactly — shuffle-order-independent and
   * bit-reproducible against any engine with a faithful ln.
   *
   * Scale: two corpus count aggregates (partial aggregation map-side), a
   * scalar vocabulary size broadcast, and a scoring pass that joins each
   * doc's bigram occurrences to the aggregates by key (AQE handles the
   * stopword-bigram skew) — no corpus-wide window, no driver state.
   */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // repartition: the bigram explode feeds map-side partial aggregation,
    // which otherwise runs single-task on a one-partition scan.
    // Persisted: THREE consumers (bigram counts, context counts, and the
    // scoring join) would each re-run the tokenize+explode otherwise;
    // freed by releaseAfterUse once the caller's first action completes.
    val occ = explodeBigrams(
        Scale.spreadForCompute(docs, col(idCol))
          .select(col(idCol), split(col(textCol), "\\s+").as("__w")),
        Seq(idCol), "__w")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val big = occ.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val ctx = occ.groupBy("w1").agg(count(lit(1)).as("cc"))
    val vocab = docs
      .select(explode(split(col(textCol), "\\s+")).as("tok"))
      .agg(countDistinct(col("tok")).as("vsz"))
    Scale.releaseAfterUse(
      occ.join(big, Seq("w1", "w2")).join(ctx, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .select(col(idCol),
          (log(col("cb").cast("double") + 1).cast("decimal(28,10)") -
            log((col("cc") + col("vsz")).cast("double")).cast("decimal(28,10)"))
            .as("__term"))
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_bigrams"), sum(col("__term")).as("__s"))
        .select(col(idCol), col("n_bigrams"),
          round(col("__s").cast("double") / col("n_bigrams"), 6).as("avg_logp")),
      Seq(occ))
  }

  /**
   * Source-fair quality gate (the FineWeb-style per-source quantile
   * threshold): keep each group's top `keepFrac` of rows by score —
   * thresholding on the WITHIN-SOURCE quantile instead of one global
   * cut, so a uniformly-lower-scoring source is trimmed, not erased,
   * and a high-scoring source cannot crowd everyone else out of the
   * token budget. percent_rank over (score desc nulls last, tieCol) is
   * deterministic and engine-portable ((rank−1)/(n−1), exact small
   * rationals). One window partitioned by the group — never a global
   * sort; the 100 TB shape is per-source parallel.
   */
  def fairGate(df: DataFrame, groupCol: String, scoreCol: String,
      tieCol: String, keepFrac: Double): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"keepFrac must be in (0, 1]: $keepFrac")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc_nulls_last, col(tieCol))
    df.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= keepFrac)
  }

  /**
   * Interpolated Kneser-Ney bigram score (d = 0.75) — the stronger
   * perplexity-filter signal next to [[bigramLmScore]]'s add-one baseline:
   * P(w2|w1) = [max(c₁₂−d, 0) + d·N₁₊(w1,·)·P_cont(w2)] / c(w1), with the
   * continuation prior P_cont(w2) = N₁₊(·,w2)/N_types. Multiplying
   * through by 4 (d = 3/4) makes numerator and denominator INTEGERS —
   * num = max(4c₁₂−3,0)·N_types + 3·N₁₊(w1,·)·N₁₊(·,w2),
   * den = 4·c(w1)·N_types — so each bigram's term is ln(int) − ln(int)
   * at fixed decimal scale, the proven engine-portable recipe; the
   * discount, the continuation distribution, everything oracle-checks.
   *
   * Scale: same shape as [[bigramLmScore]] — the persisted bigram
   * occurrence explode feeds one (w1,w2) aggregate, from which the
   * context counts, both continuation-diversity counts, and the one-row
   * type total all derive (vocabulary-scale aggregates); scoring joins
   * occurrences back by key with AQE on the stopword skew. No window, no
   * driver state.
   */
  def knBigramScore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val occ = explodeBigrams(
        Scale.spreadForCompute(docs, col(idCol))
          .select(col(idCol), split(col(textCol), "\\s+").as("__w")),
        Seq(idCol), "__w")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // big feeds FOUR consumers (n1p, n1m, the type total, scoring join)
    val big = occ.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctx = occ.groupBy("w1").agg(count(lit(1)).as("cc"))
    val n1p = big.groupBy("w1").agg(count(lit(1)).as("n1p"))
    val n1m = big.groupBy("w2").agg(count(lit(1)).as("n1m"))
    val nt = big.agg(count(lit(1)).as("nt"))
    def dec38(c: Column) = c.cast("decimal(38,0)")
    def lnDec(c: Column) = log(c.cast("double")).cast("decimal(28,10)")
    // decimal(38,0) products: 4·c·N_types overflows a long at a 100 TB
    // corpus (1e13 tokens × 1e12 types); exact decimals do not — up to
    // Spark's precision-38 cap. Beyond ~1e38 (den = 4·c(w1)·N_types, so
    // c(w1)·N_types > 2.5e37; any larger ×4-style re-integerization hits
    // it sooner) the multiply NULLs under non-ANSI mode instead of
    // staying exact; the guard below turns that into a loud error.
    val num = dec38(greatest(col("cb") * 4 - 3, lit(0L))) * dec38(col("nt")) +
      dec38(col("n1p")) * dec38(col("n1m")) * 3
    val den = dec38(col("cc") * 4) * dec38(col("nt"))
    Scale.releaseAfterUse(
      occ.join(big, Seq("w1", "w2")).join(ctx, Seq("w1"))
        .join(n1p, Seq("w1")).join(n1m, Seq("w2"))
        .crossJoin(broadcast(nt))
        // counts are inner-join non-null, so a null product can ONLY be
        // the precision-38 overflow above — fail loudly instead of
        // letting sum() skip the null term
        .select(col(idCol),
          when(num.isNull || den.isNull, raise_error(lit(
            "knBigramScore: decimal(38,0) product overflow — corpus " +
              "exceeds the ~1e38 exact-integer ceiling (see scaladoc)")))
            .otherwise(lnDec(num) - lnDec(den)).as("__term"))
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_bigrams"), sum(col("__term")).as("__s"))
        .select(col(idCol), col("n_bigrams"),
          round(col("__s").cast("double") / col("n_bigrams"), 6)
            .as("avg_logp")),
      Seq(occ, big))
  }

  /**
   * Pointwise mutual information over adjacent word pairs — the phrase /
   * collocation miner (word2vec-style phrase detection): pmi(w1, w2) =
   * ln(c12) + 2·ln(N_uni) − ln(N_big) − ln(c1) − ln(c2), every ln taken
   * of an INTEGER count and combined as decimal(28,10) in a fixed order,
   * so the score is a pure function of the counts — engine-portable, the
   * bigramLmScore recipe. `minCount` floors c12 (PMI of rare pairs is
   * noise); returns the top `k` by (rounded pmi, w1, w2) via
   * orderBy+limit, which plans as TakeOrderedAndProject — a web-scale
   * vocabulary never funnels through a single-task sort.
   *
   * Scale: ONE tokenized projection persisted for its two explodes;
   * unigram and bigram counts are vocabulary-scale hash aggregates
   * (map-side combine), their totals derive FROM the aggregates (no
   * second corpus pass), and the count joins broadcast the unigram side.
   */
  def pmiTopK(docs: DataFrame, idCol: String, textCol: String,
      minCount: Int = 5, k: Int = 30): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    def lnDec(c: Column) = log(c.cast("double")).cast("decimal(28,10)")
    val base = Scale.spreadForCompute(
        docs.filter(col(textCol).isNotNull), col(idCol))
      .select(split(col(textCol), "\\s+").as("__w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val uni = base.select(explode(col("__w")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val big = explodeBigrams(base, Seq.empty, "__w")
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nu = uni.agg(sum(col("c")).as("nu"))
    val nb = big.agg(sum(col("c12")).as("nb"))
    val scored = big.filter(col("c12") >= minCount)
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c12"),
        round((lnDec(col("c12")) + lnDec(col("nu")) + lnDec(col("nu"))
          - lnDec(col("nb")) - lnDec(col("c1")) - lnDec(col("c2")))
          .cast("double"), 6).as("pmi"))
    Scale.releaseAfterUse(
      scored.orderBy(col("pmi").desc, col("w1"), col("w2")).limit(k),
      Seq(base, uni, big))
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

  /**
   * DSIR-style importance weighting (Xie et al., "Data Selection for
   * Language Models via Importance Resampling", NeurIPS 2023 — a public
   * method): score every document by how much more likely its hashed
   * n-gram bag is under a TARGET subcorpus's feature distribution than
   * under the full RAW corpus's — the data-selection signal that tilts a
   * pretraining mix toward a target domain without training a model.
   * Features are word unigrams + consecutive bigrams hashed into
   * `nBuckets` buckets (the paper's hashed n-gram features; collisions
   * are part of the estimator). Both distributions are Laplace-smoothed
   * bucket multinomials, giving per document d
   *
   *   log w(d) = Σ_b n_b(d) · [ ln(ct_b+1) − ln(cr_b+1)
   *                             + ln(Tr+B) − ln(Tt+B) ]
   *
   * (ct/Tt = target bucket count / total, cr/Tr = raw, B = nBuckets; the
   * smoothing penalty folds into each bucket term so the score is ONE
   * decimal sum). Keeping the top-k by weight is the deterministic
   * counterpart of the paper's Gumbel resampling — reproducible forever,
   * the repo's sampling convention.
   *
   * Exact and portable: each ln is rounded once to decimal(17,10) (the
   * langIdNaiveBayes recipe), the four-term combination stays decimal
   * (max precision (20,10)), and the bucket multiplicity multiplies as
   * decimal(9,0) — a per-doc-per-bucket bound, not a corpus bound — so
   * every product is decimal(30,10), loss-free under Spark's rules; the
   * sum is shuffle-order-independent and the bucket hash is the portable
   * md5 family, so the whole selection oracle-checks bit-for-bit.
   *
   * Scale shape: ONE explode pass collapses straight to (doc, bucket, n)
   * — ≤ min(doc features, nBuckets) rows per doc; the two model frames
   * (cr, ct) aggregate that frame to ≤ nBuckets rows each and join back
   * BROADCAST (bucket-model scale, never corpus scale); the totals ride
   * a broadcast one-row frame. A doc only pays for buckets it touches —
   * nothing is doc×bucket dense, nothing collects on the driver. An
   * unseen target bucket contributes ln(0+1) = 0 via the left join, so
   * the score join is never densified either.
   *
   * Returns (idCol, n_feats, log_w): n_feats = the doc's feature
   * occurrences, log_w rendered at 6 dp from the exact decimal.
   */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    def lnDec(c: Column) = log(c.cast("double")).cast("decimal(17,10)")
    val feats = Scale.spreadForCompute(
        docs.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), targetPred.as("__tgt"),
        split(col(textCol), "\\s+").as("__w"))
      // position explode over 1..2n−1 (n unigrams then n−1 bigrams),
      // features built by codegen'd element_at — the interpreted
      // transform+concat array form allocated 2n−1 strings per doc twice
      .select(col(idCol), col("__tgt"), col("__w"),
        explode(expr("sequence(1, 2 * size(__w) - 1)")).as("__fp"))
      .select(col(idCol), col("__tgt"), expr(
        """CASE WHEN __fp <= size(__w) THEN element_at(__w, __fp)
           ELSE concat(element_at(__w, __fp - size(__w)), ' ',
                       element_at(__w, __fp - size(__w) + 1)) END""")
        .as("__feat"))
      .withColumn("__b",
        pmod(Dedup.portableHash64(col("__feat")), lit(nBuckets.toLong)))
    // persisted: two consumers (the fused bucket-model aggregate and the
    // score join); freed by releaseAfterUse once the caller's first
    // action completes
    val docBuckets = feats.groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE bucket-model aggregate carries BOTH distributions: cr as the
    // plain sum, ct as the null-skipping conditional sum — sum(when(tgt))
    // is NULL exactly when the bucket has no target rows, reproducing the
    // old separate-ct left join's null (the coalesce below is unchanged).
    // This replaces two scans of docBuckets + two broadcast joins with
    // one of each; the totals fold into the same frame's aggregate.
    // Values are bit-identical: the same exact long sums, merely fused.
    val bm = docBuckets.groupBy("__b")
      .agg(sum("__n").as("__cr"),
        sum(when(col("__tgt"), col("__n"))).as("__ct"))
    val totals = bm.agg(sum(col("__cr")).as("__tr"),
        sum(col("__ct")).as("__tt"))
      .select((lnDec(col("__tr") + nBuckets) -
        lnDec(col("__tt") + nBuckets)).as("__pen"))
    val perDoc = docBuckets
      .join(broadcast(bm), Seq("__b"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("n_feats"),
        sum(col("__n").cast("decimal(9,0)") *
          (lnDec(coalesce(col("__ct"), lit(0L)) + 1) -
            lnDec(col("__cr") + 1) + col("__pen"))).as("__s"))
    Scale.releaseAfterUse(
      perDoc.select(col(idCol), col("n_feats"),
        round(col("__s").cast("double"), 6).as("log_w")),
      Seq(docBuckets))
  }

  /**
   * SEMANTIC benchmark decontamination — the embedding-space complement
   * of the n-gram [[contaminated]] scan (modern eval hygiene runs both:
   * n-gram overlap catches verbatim leaks, embedding similarity catches
   * paraphrased/translated ones): every train row's maximum cosine to
   * ANY benchmark embedding, as (idCol, max_cos); the caller thresholds
   * and reports. Exact path: the benchmark side broadcasts (eval suites
   * are bounded by construction — thousands of rows, not corpus-scale)
   * and each train vector scores against it in one scan-local pass
   * (`crossJoin(broadcast)` plans a BroadcastNestedLoopJoin, never a
   * CartesianProduct); max over doubles is order-free and the cosine is
   * the bit-portable sequential dot, so the whole scan oracle-checks.
   * At 100 TB with a LARGE benchmark side, the IVF-cell-bounded
   * variant ([[Dedup.semanticDedup]]'s candidate shape) is the
   * documented swap — same verdict, bounded pair work.
   */
  def semanticContamination(train: DataFrame, bench: DataFrame,
      idCol: String, embCol: String): DataFrame =
    train.select(col(idCol), col(embCol))
      .crossJoin(broadcast(bench.select(col(embCol).as("__bemb"))))
      .withColumn("__cos",
        graft.functions.VectorOps.cosine(col(embCol), col("__bemb")))
      .groupBy(idCol)
      .agg(max(col("__cos")).as("max_cos"))

  /**
   * SEMANTIC consumption ordering — the "in-context pretraining" layout
   * (Shi et al. 2023, arXiv:2310.10638): place semantically similar
   * documents ADJACENT in the training stream so packed long-context
   * windows carry related material instead of random shards. The exact
   * greedy nearest-neighbour chain is inherently sequential; the
   * scalable relational surrogate orders by (IVF cell, pc1 within the
   * cell) — coarse locality from the cell, fine locality from the
   * first-principal-component sweep inside it, the same
   * locality-by-sort-key idea as Z-ordering with the embedding replacing
   * scalar columns.
   *
   * Returns (idCol, cell, pc1, pos) with `pos` a global 0-based
   * consumption position. Plan shape: the fixed-quantizer train and the
   * PCA moments reduce to driver metadata (k·dim + dim² — the bounded
   * collects [[Ivf.train]]/[[Pca]] document); cell AND pc1 then compute
   * in ONE scan-local select (no join between them); the within-cell
   * rank is one window PARTITIONED by cell (never global); global
   * positions come from the k-row cell census collected and broadcast
   * back as a literal offset map — no single-partition exchange
   * anywhere. Every step is bit-portable (fixed first-k quantizer,
   * exact-integer PCA), so the full ordering oracle-checks.
   *
   * Scale note: the rank's parallelism is k (one window partition per
   * cell), so k must GROW with the corpus — at 1000 executors run
   * k ≈ thousands of cells (IVF guidance is ~√n anyway, so the knob
   * moves in the right direction for free). If per-cell sorts ever
   * dominate, the census trick recurses: range-partition each cell by
   * pc1, rank within ranges, and add range-count prefix offsets —
   * positions identical, parallelism k·ranges.
   */
  def semanticOrder(df: DataFrame, idCol: String, embCol: String,
      dim: Int, k: Int = 16): DataFrame = {
    val base = df.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
    val centroids = Ivf.train(base, idCol, embCol, k, iters = 0)
    val (q, n2) = Pca.topDirectionWithNorm(base, embCol, dim)
    val scored = base.select(col(idCol),
      Ivf.nearestCentroid(col(embCol), centroids).cast("long").as("cell"),
      Pca.pc1ColFor(embCol, q, n2).as("pc1"))
    val w = Window.partitionBy("cell").orderBy(col("pc1"), col(idCol))
    val ranked = scored
      .withColumn("__wi", row_number().over(w).cast("long") - 1)
    // k-row census → exclusive prefix sums, driver-side (metadata scale)
    val census = scored.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offs = census.map(_._2).scanLeft(0L)(_ + _).dropRight(1)
    val offMap = map(census.map(_._1).zip(offs).flatMap { case (c, o) =>
      Seq(lit(c), lit(o)) }.toSeq: _*)
    ranked
      .withColumn("pos", col("__wi") + element_at(offMap, col("cell")))
      .select(col(idCol), col("cell"), col("pc1"), col("pos"))
      .orderBy("pos")
  }
}
