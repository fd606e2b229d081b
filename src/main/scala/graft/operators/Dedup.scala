package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for a training-data pipeline (SURVEY §2.5 A6-A7).
 *
 * Scale design: every variant is shuffle-based — exact dedup shuffles on the
 * key, MinHash candidates meet via a groupBy on (band, signature) buckets —
 * and nothing materializes rows on the driver. An all-pairs similarity join
 * is deliberately absent: at 100 TB it is O(n²) and disqualifying; LSH
 * banding bounds the work by bucket size.
 */
object Dedup {

  /**
   * Exact dedup by key, deterministic survivor: the row ranked first by
   * `order` within each key group. Equivalent to dropDuplicates(keys) but
   * with a defined (oracle-checkable) choice of survivor.
   */
  def exactByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    // Spread on the WINDOW keys when the input is a provably-narrow
    // SCAN: the window's per-group sort+rank is the whole operator, and
    // a compact single-file scan leaves it in the 1-2 partitions AQE
    // coalesces a small exchange to (measured: 600k rows ranked in 2
    // tasks, 0.93 s at sf0.1 — the same AQE-cannot-see-the-work class as
    // the compute spreads; spread: 0.46 s). HashPartitioning(keys,
    // width) satisfies the window's ClusteredDistribution over the same
    // keys, so this REPLACES the window's own exchange rather than
    // adding one. Scan-only probe (no physical fallback): exactByKey
    // receives arbitrary caller pipelines (upsert/applyCdc unions), and
    // probing a post-shuffle frame would execute its upstream stages
    // under AQE (measured q_cdc_apply 0.38 → 0.63 s) — those shapes
    // no-op here and keep their own exchange.
    val spread = if (keys.nonEmpty)
      Scale.spreadIfScanNarrow(df, keys.map(col)) else df
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    spread.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Canonical-text fingerprint: md5 of lowercased, whitespace-collapsed text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /**
   * Word n-gram shingles of a text column (whitespace tokenized).
   *
   * Hot-path note: the tokenize sits inside the transform lambda, so an
   * engine that does not eliminate the common subexpression re-splits the
   * text once per shingle slot. When shingling feeds a join or aggregate,
   * pre-project the word array into its own column and use
   * [[shinglesFromWords]]: a multi-referenced non-cheap projection is not
   * collapsed into its consumers by Catalyst, so the text tokenizes once
   * per row (~n_words× fewer splits).
   */
  def shingles(text: Column, n: Int): Column =
    shinglesFromWords(split(text, "\\s+"), n)

  /** [[shingles]] over an already-tokenized word array column. */
  def shinglesFromWords(words: Column, n: Int): Column =
    array_distinct(rawShinglesFromWords(words, n))

  /** Shingles WITH duplicate occurrences kept — repetition analysis needs
    * the multiplicity that the set-semantics variant discards. */
  def rawShinglesFromWords(words: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => concat_ws(" ", slice(words, i + lit(1), lit(n))))

  /**
   * MinHash signature: the shingle set is hashed ONCE with xxhash64, then
   * each of `numHashes` families is a deterministic affine transform
   * (a_i * h + b_i over Long) of that base hash — the classic universal-
   * hash-family construction. This keeps string hashing O(|shingles|)
   * rather than O(|shingles| * numHashes) and stays scan-only, no shuffle.
   * (Hand-rolled rather than MLlib's MinHashLSH: that implementation runs
   * through UDFs over ml.linalg Vectors, which leaves codegen and forces a
   * sparse-vector detour; this stays in native column expressions.)
   */
  /** One xxhash64 per shingle — materialize this BEFORE minhashFromHashes
    * so the string hashing isn't re-evaluated per family. */
  def shingleHashes(shinglesCol: Column): Column =
    transform(shinglesCol, x => xxhash64(x))

  def minhashFromHashes(hashesCol: Column, numHashes: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val salts = Seq.fill(numHashes)(rnd.nextLong())
    // family i = xxhash64(base_hash, salt_i): fixed-width long re-hash, so
    // no string re-hashing per family and no overflow under ANSI mode
    // (an affine a*h+b family would need wrapping multiplication).
    array(salts.map { s =>
      array_min(transform(hashesCol, h => xxhash64(h, lit(s))))
    }: _*)
  }

  /** Convenience single-expression form (prefer the two-step columns when
    * the signature feeds multiple consumers). */
  def minhash(shinglesCol: Column, numHashes: Int, seed: Long = 42L): Column =
    minhashFromHashes(shingleHashes(shinglesCol), numHashes, seed)

  /**
   * Cross-engine-portable 60-bit hash: the first 15 hex digits of md5,
   * parsed as a long. Any engine with md5 reproduces it bit-for-bit, which
   * makes hash-dependent operators (MinHash, SimHash) fully
   * oracle-checkable against a second engine. Costs ~3x xxhash64, so the
   * scale default for the operators stays xxhash64; prefer this family
   * when cross-engine verification matters more than hash throughput.
   * Computed by the codegen'd [[graft.functions.PortableHash]] expression
   * (bit-identical to `conv(substring(md5(x),1,15),16,10)`, ~1.4× cheaper —
   * no hex-string intermediates; PortableHashSpec pins the equivalence).
   */
  def portableHash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.PortableHash(
      org.apache.spark.sql.GraftBridge.expression(c.cast("string")), 15))

  /** Second independent portable hash, for double-hashing families: md5
    * of the base hash's decimal rendering, truncated to 56 bits (14 hex
    * digits) so `k * h2` stays overflow-free for k <= 16. */
  def portableHash56b(h: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.PortableHash(
      org.apache.spark.sql.GraftBridge.expression(h.cast("string")), 14))

  /**
   * Portable MinHash signature via double hashing (Kirsch–Mitzenmacher):
   * family k over a shingle is `h1 + k * h2`, with h1 the 60-bit base
   * portable hash and h2 one extra 56-bit md5 — so the whole 16-family
   * signature costs two md5 calls per shingle plus pure arithmetic,
   * instead of one md5 per family. The widths bound
   * `h1 + 16*h2 < 2^60 + 2^60 = 2^61`, so the expression never
   * overflows under ANSI semantics. Takes the (h1, h2) arrays as
   * columns; materialize both in their own projection so the md5s run
   * once per shingle (same CollapseProject argument as [[shingles]]).
   */
  def minhashPortableFromHashes(h1: Column, h2: Column,
      numHashes: Int): Column =
    array((1 to numHashes).map { k =>
      array_min(zip_with(h1, h2, (a, b) => a + lit(k.toLong) * b))
    }: _*)

  /**
   * LSH banding: split the signature into `bands` bands of `rowsPerBand`
   * hashes; docs sharing any full band signature become candidates.
   * Returns (id, band, band_sig) — one row per band per doc.
   */
  def bandSignatures(df: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until rowsPerBand).map(r =>
          element_at(col(sigCol), b * rowsPerBand + r + 1)): _*).as("band_sig"))
    }
    df.select(col(idCol), explode(array(banded: _*)).as("bs"))
      .select(col(idCol), col("bs.band"), col("bs.band_sig"))
  }

  /**
   * Candidate near-duplicate pairs via MinHash banding, verified with exact
   * Jaccard over the hashed shingle sets; pairs ordered (a < b),
   * deduplicated across bands. `threshold` filters the verified Jaccard.
   */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.6): DataFrame =
    nearDupImpl(df, idCol, textCol, shingleN, numHashes, bands, threshold,
      shingleHashes,
      d => d.withColumn("sig", minhashFromHashes(col("hv"), numHashes)))

  /** [[nearDuplicates]] over the portable md5 hash family — identical plan
    * shape, every hash reproducible in any md5-capable engine, so the full
    * banded-MinHash pipeline is oracle-checkable. */
  def nearDuplicatesPortable(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.6): DataFrame =
    nearDupImpl(df, idCol, textCol, shingleN, numHashes, bands, threshold,
      sh => transform(sh, portableHash64(_)),
      d => d
        .withColumn("__h2", transform(col("hv"), portableHash56b(_)))
        .withColumn("sig",
          minhashPortableFromHashes(col("hv"), col("__h2"), numHashes))
        .drop("__h2"))

  private def nearDupImpl(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int, threshold: Double,
      hashShingles: Column => Column,
      addSignature: DataFrame => DataFrame): DataFrame = {
    // The signature stage feeds both sides of the bucket self-join and both
    // Jaccard re-joins; without a persist Spark recomputes the shingling 4x
    // (observed 4-5x wall-clock). At cluster scale this stage would be
    // checkpointed for the same reason. Freed by releaseAfterUse once the
    // caller's first action over the pair frame completes (all four
    // consumers sit inside that one execution).
    // The verify stage intersects the hashed shingle sets rather than the
    // shingle strings: same Jaccard (64-bit collisions over a doc's
    // shingles are negligible), long-array set ops instead of string-array
    // ones, and the persisted stage carries no text at all.
    // The word array is projected separately so the text tokenizes once
    // per row (see shingles() hot-path note).
    // Null-text rows are excluded up front: the shingle transform would
    // otherwise emit one "" shingle for them (concat_ws swallows NULLs),
    // silently making all null-text docs near-duplicates of each other.
    // repartition first: the signature stage (shingling + 16-64 hashes per
    // shingle) is the CPU-heavy part, and a compact corpus arriving as one
    // scan partition would run it in a single task (see containmentPairs).
    val withSig = addSignature(Scale.spreadForCompute(
      df.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), split(col(textCol), "\\s+").as("__words"))
      .select(col(idCol),
        hashShingles(shinglesFromWords(col("__words"), shingleN)).as("hv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandSigs = bandSignatures(withSig, idCol, "sig", bands, numHashes / bands)
    val a = bandSigs.select(col(idCol).as("a"), col("band"), col("band_sig"))
    val b = bandSigs.select(col(idCol).as("b"), col("band"), col("band_sig"))
    val candidates = a.join(b, Seq("band", "band_sig"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val hv = withSig.select(col(idCol), col("hv"))
    Scale.releaseAfterUse(
      candidates
        .join(hv.select(col(idCol).as("a"), col("hv").as("hv_a")), "a")
        .join(hv.select(col(idCol).as("b"), col("hv").as("hv_b")), "b")
        // size filter (PPJoin): J ≥ t forces min/max set-size ratio ≥ t —
        // a cheap length check ahead of the O(|A|+|B|) intersect; output
        // provably unchanged, so no oracle mirror is needed
        .filter(least(size(col("hv_a")), size(col("hv_b"))).cast("double") >=
          lit(threshold) * greatest(size(col("hv_a")), size(col("hv_b"))))
        .withColumn("jaccard",
          size(array_intersect(col("hv_a"), col("hv_b"))).cast("double") /
            size(array_union(col("hv_a"), col("hv_b"))).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("a"), col("b"), col("jaccard")),
      Seq(withSig))
  }

  /** Portable-family MinHash signature stage shared by the delta path:
    * (id, hv, sig) with hv the hashed shingle set and sig the banded-ready
    * signature. */
  private def portableSigStage(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame =
    // repartition for the same single-scan-partition reason as nearDupImpl
    Scale.spreadForCompute(df.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), split(col(textCol), "\\s+").as("__words"))
      .select(col(idCol),
        transform(shinglesFromWords(col("__words"), shingleN),
          portableHash64(_)).as("hv"))
      .withColumn("__h2", transform(col("hv"), portableHash56b(_)))
      .withColumn("sig",
        minhashPortableFromHashes(col("hv"), col("__h2"), numHashes))
      .drop("__h2")

  /**
   * Incremental (delta-vs-corpus) near-dup detection — THE shape that makes
   * dedup sustainable at 100 TB: a new batch's band signatures join only
   * against the corpus's band signatures, so the corpus is never
   * self-paired and yesterday's work is never redone. Cost is
   * O(|delta| + band collisions), independent of |corpus|²; in production
   * the corpus side of the signature stage is a maintained table (append
   * each accepted delta), here it is computed in-flight. Portable md5
   * hash family throughout, so the whole path is oracle-checkable.
   * Returns (delta_id, corpus_id, jaccard) verified pairs.
   */
  def nearDuplicatesDeltaPortable(corpus: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.6): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // each side's signature stage feeds its band explode AND the verify
    // join — persist for the same 4x-recompute reason as nearDupImpl
    val cs = portableSigStage(corpus, idCol, textCol, shingleN, numHashes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ds = portableSigStage(delta, idCol, textCol, shingleN, numHashes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rows = numHashes / bands
    val cb = bandSignatures(cs, idCol, "sig", bands, rows)
      .select(col(idCol).as("corpus_id"), col("band"), col("band_sig"))
    val db = bandSignatures(ds, idCol, "sig", bands, rows)
      .select(col(idCol).as("delta_id"), col("band"), col("band_sig"))
    val candidates = db.join(cb, Seq("band", "band_sig"))
      .select("delta_id", "corpus_id").distinct()
    Scale.releaseAfterUse(
      candidates
        .join(ds.select(col(idCol).as("delta_id"), col("hv").as("hv_d")),
          "delta_id")
        .join(cs.select(col(idCol).as("corpus_id"), col("hv").as("hv_c")),
          "corpus_id")
        // same PPJoin size filter as nearDupImpl — output unchanged
        .filter(least(size(col("hv_d")), size(col("hv_c"))).cast("double") >=
          lit(threshold) * greatest(size(col("hv_d")), size(col("hv_c"))))
        .withColumn("jaccard",
          size(array_intersect(col("hv_d"), col("hv_c"))).cast("double") /
            size(array_union(col("hv_d"), col("hv_c"))).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("delta_id"), col("corpus_id"), col("jaccard")),
      Seq(cs, ds))
  }

  /**
   * Banded-LSH recall evaluation — the dedup-modality twin of the ANN
   * recall query (q_pq_recall): for a bounded QUERY subset, compute the
   * exact-Jaccard ground-truth neighbor set (pairs with J ≥ `threshold`)
   * and report, per query doc, how many of those pairs the banded MinHash
   * candidate generation actually surfaces. This is the measurement that
   * justifies a (numHashes, bands) choice before a 100 TB dedup run.
   *
   * Scale shape: ground truth is NEVER all-pairs — it runs through the
   * shingle-hash inverted index, so per-shingle work is
   * |queries containing s| × df(s): linear in corpus size for a bounded
   * query set, with the query side small enough to broadcast its sizes.
   * The candidate side is the same band self-join the production path
   * uses. Portable md5 family throughout → fully oracle-checkable.
   * Returns (q_id, n_true, n_caught, recall), one row per query doc with
   * at least one true neighbor.
   */
  def bandedRecallPortable(corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val cs = portableSigStage(corpus, idCol, textCol, shingleN, numHashes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val qs = portableSigStage(queries, idCol, textCol, shingleN, numHashes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ground truth via the inverted index: hv entries are DISTINCT by
    // construction (shinglesFromWords dedups), so the per-pair match count
    // IS the intersection size, and |A∪B| = |A| + |B| − |A∩B|.
    val qh = qs.select(col(idCol).as("q_id"), explode(col("hv")).as("__hx"))
    val ch = cs.select(col(idCol).as("c_id"), explode(col("hv")).as("__hx"))
    val inter = qh.join(ch, "__hx").filter(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id").agg(count(lit(1)).as("__n_int"))
    val qsz = qs.select(col(idCol).as("q_id"), size(col("hv")).as("__sq"))
    val csz = cs.select(col(idCol).as("c_id"), size(col("hv")).as("__sc"))
    val truth = inter.join(broadcast(qsz), "q_id").join(csz, "c_id")
      .filter(col("__n_int").cast("double") /
        (col("__sq") + col("__sc") - col("__n_int")) >= threshold)
      .select("q_id", "c_id")
    val rows = numHashes / bands
    val qb = bandSignatures(qs, idCol, "sig", bands, rows)
      .select(col(idCol).as("q_id"), col("band"), col("band_sig"))
    val cb = bandSignatures(cs, idCol, "sig", bands, rows)
      .select(col(idCol).as("c_id"), col("band"), col("band_sig"))
    val cand = qb.join(cb, Seq("band", "band_sig"))
      .filter(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id").distinct()
    Scale.releaseAfterUse(
      truth
        .join(cand.withColumn("__hit", lit(1L)), Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_caught"))
        .withColumn("recall",
          round(col("n_caught").cast("double") / col("n_true"), 6)),
      Seq(cs, qs))
  }

  /**
   * Banding TUNING CURVE — [[bandedRecallPortable]] swept over band
   * counts (the q_ivf_recall_curve pattern for the dedup modality): the
   * signature stage and the exact-Jaccard ground truth compute ONCE and
   * persist; each band configuration re-slices the SAME signatures
   * (rows = numHashes / bands) and pays only its candidate self-join.
   * More bands (shorter band signatures) catches more true pairs AND
   * more false candidates — this curve is the recall side of that
   * trade, the number that picks `bands` before a 100 TB run. Returns
   * (bands, q_id, n_true, n_caught, recall, n_cand) — n_cand is the
   * COST side of the trade: candidates this banding makes the verify
   * stage pay for.
   */
  def bandedRecallCurvePortable(corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3,
      numHashes: Int = 16, bandsList: Seq[Int] = Seq(2, 4, 8),
      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(bandsList.nonEmpty && bandsList.forall(b =>
      b >= 1 && numHashes % b == 0),
      s"every bands value must divide numHashes=$numHashes: $bandsList")
    val cs = portableSigStage(corpus, idCol, textCol, shingleN, numHashes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val qs = portableSigStage(queries, idCol, textCol, shingleN, numHashes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val qh = qs.select(col(idCol).as("q_id"), explode(col("hv")).as("__hx"))
    val ch = cs.select(col(idCol).as("c_id"), explode(col("hv")).as("__hx"))
    val inter = qh.join(ch, "__hx").filter(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id").agg(count(lit(1)).as("__n_int"))
    val qsz = qs.select(col(idCol).as("q_id"), size(col("hv")).as("__sq"))
    val csz = cs.select(col(idCol).as("c_id"), size(col("hv")).as("__sc"))
    val truth = inter.join(broadcast(qsz), "q_id").join(csz, "c_id")
      .filter(col("__n_int").cast("double") /
        (col("__sq") + col("__sc") - col("__n_int")) >= threshold)
      .select("q_id", "c_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val released = scala.collection.mutable.ArrayBuffer[DataFrame](
      cs, qs, truth)
    val out = bandsList.map { b =>
      val rows = numHashes / b
      val qb = bandSignatures(qs, idCol, "sig", b, rows)
        .select(col(idCol).as("q_id"), col("band"), col("band_sig"))
      val cb = bandSignatures(cs, idCol, "sig", b, rows)
        .select(col(idCol).as("c_id"), col("band"), col("band_sig"))
      val cand = qb.join(cb, Seq("band", "band_sig"))
        .filter(col("q_id") =!= col("c_id"))
        .select("q_id", "c_id").distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      released += cand
      // the COST side of the trade: candidates the verify stage must pay
      // for — grows with bands while recall saturates
      val nCand = cand.groupBy("q_id").agg(count(lit(1)).as("n_cand"))
      truth
        .join(cand.withColumn("__hit", lit(1L)), Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_caught"))
        .join(broadcast(nCand), Seq("q_id"), "left")
        .select(lit(b.toLong).as("bands"), col("q_id"), col("n_true"),
          col("n_caught"),
          round(col("n_caught").cast("double") / col("n_true"), 6)
            .as("recall"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"))
    }.reduce(_ unionByName _)
    Scale.releaseAfterUse(out, released.toSeq)
  }

  /**
   * Containment near-dup pairs: containment(A,B) = |A∩B| / min(|A|,|B|)
   * over shingle sets — the asymmetric cousin of Jaccard that catches
   * quote/subset relations (a short doc embedded in a long one scores
   * containment ≈ 1 while its Jaccard stays tiny, invisible to MinHash).
   *
   * Candidate generation blocks on each doc's `kBlock` lexicographically
   * smallest shingles (exploded, so a pair meets when ANY of their smallest
   * shingles coincide) — deterministic, engine-portable, and declared as
   * part of the operator's semantics, like the min-shingle blocking of
   * q_dedup_cluster. Scale: kBlock rows per doc into the block join; block
   * sizes follow shingle-frequency, the verify join touches only
   * candidates, and the shingle arrays travel as xxhash64 longs (equal
   * iff the strings are equal, barring a 2⁻⁶⁴ collision).
   */
  /**
   * Skew guard for blocking-based candidate generation: DROP blocks whose
   * membership exceeds `maxBlock`. A corpus-common minimum shingle (a
   * boilerplate phrase shared by millions of documents) would otherwise
   * form one giant block whose pair expansion is quadratic — 10⁶ members
   * is 5·10¹¹ candidate pairs in a single key. Declared operator
   * semantics, mirrored in the oracle SQL (QUALIFY on the block count).
   *
   * Dropping is safe for real near-dups when each doc contributes k > 1
   * blocks: documents that genuinely overlap share many shingles, so they
   * still meet in their other (k−1) blocks, while a shingle common to
   * >maxBlock docs carries no discriminating signal.
   *
   * Shape: the oversized block KEYS are found by a partial-aggregating
   * count over the key column alone, then removed with a broadcast anti
   * join — the blocked rows (which carry the shingle-hash arrays) are
   * never sorted or re-shuffled. A window count over the rows would sort
   * the array payloads (measured +0.5-1 s per dedup query at sf0.1); the
   * keys list is bounded by |rows|/maxBlock and in a real corpus is the
   * tiny boilerplate tail, so it broadcasts.
   */
  def capBlocks(blocked: DataFrame, blkCol: String, maxBlock: Int): DataFrame = {
    val oversized = blocked.groupBy(col(blkCol))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBlock)
      .select(col(blkCol))
    blocked.join(broadcast(oversized), Seq(blkCol), "left_anti")
  }

  /** Default block-size cap: far above any honest shingle frequency at
    * test scale, small enough that a boilerplate block's pair expansion
    * (≤ maxBlock²/2 ≈ 8M pairs) stays one task's worth of work. */
  val DefaultMaxBlock = 4096

  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, kBlock: Int = 3, minCont: Double = 0.5,
      maxBlock: Int = DefaultMaxBlock): DataFrame = {
    // spread the per-doc shingle/sort/hash compute across the session's
    // full width first: a compact corpus arrives as few scan partitions
    // (one, for a single small file), which would serialize the whole
    // CPU-bound projection into one task (measured 3.3 s of the 4.3 s
    // total at sf0.1). One row-sized shuffle; at 100 TB the input is
    // already thousands of partitions and this hashes ids evenly anyway.
    val sh = Scale.spreadForCompute(df.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol).as("__id"),
        shinglesFromWords(split(col(textCol), "\\s+"), shingleN).as("__sh"))
      .select(col("__id"), shingleHashes(col("__sh")).as("__hv"),
        slice(array_sort(col("__sh")), 1, kBlock).as("__blks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // repartition on the block key: the single-file scan would otherwise
    // leave the whole candidate-pair intersect running in 1-2 tasks (the
    // broadcast join inherits the streamed side's partitioning). One
    // shuffle of k·|docs| small rows buys full-width parallelism for the
    // set intersections — and at 100 TB it is also the locality layout.
    // capped once, persisted once: both self-join sides read this — an
    // unpersisted cap would re-run the block census per side (A/B
    // measured: dropping this persist costs ~2 s at sf0.1, unlike the
    // nearDupEdges3 cap whose input has no exchange to rematerialize)
    // Explicit width (the spreadForCompute rationale): a bare keyed
    // repartition is AQE-coalescible by its input bytes, and the work
    // behind this exchange — the per-pair array_intersect self-join —
    // is far larger than the exchanged rows, so AQE folding it to 1-2
    // partitions serializes the intersections.
    val blocked = capBlocks(
      sh.select(col("__id"), col("__hv"), explode(col("__blks")).as("__blk"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism,
          col("__blk")),
      "__blk", maxBlock)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = blocked.select(col("__id").as("a"), col("__hv").as("hv_a"),
      col("__blk"))
    val b = blocked.select(col("__id").as("b"), col("__hv").as("hv_b"),
      col("__blk"))
    val inter = size(array_intersect(col("hv_a"), col("hv_b"))).cast("double")
    // containment is computed BEFORE the pair dedup: duplicate candidates
    // (a pair meeting in 2-3 blocks) recompute an identical cheap scalar,
    // and the dedup then groups rows of plain scalars — a HashAggregate.
    // Deduping first would group rows still carrying the two shingle
    // arrays, which Spark can only sort-aggregate: two full sorts of the
    // candidate set WITH array payloads (measured 4.3 s → 0.9 s at sf0.1).
    Scale.releaseAfterUse(
      a.join(b, "__blk").filter(col("a") < col("b"))
        .withColumn("containment",
          inter / least(size(col("hv_a")), size(col("hv_b"))))
        .filter(col("containment") >= minCont)
        .select(col("a"), col("b"), round(col("containment"), 6).as("containment"))
        .dropDuplicates("a", "b"),
      Seq(sh, blocked))
  }

  /**
   * Cross-document EXACT-SUBSTRING duplicate spans — the RefinedWeb /
   * "Deduplicating Training Data Makes Language Models Better" (Lee et
   * al. 2022) modality, re-expressed Spark-shaped. The reference suffix-
   * array construction is a single-machine algorithm; the distributed
   * equivalent used here: every width-`w` word shingle is an ANCHOR, an
   * anchor is duplicated when its shingle occurs in >1 distinct document,
   * and per document a maximal run of consecutive duplicated anchors
   * extends into one span [span_start, span_end] (1-based word indices;
   * the end covers the last anchor's full w words). Any cross-doc
   * duplicated substring of ≥ w words is found EXACTLY (all its anchors
   * are duplicated); shorter duplicates are below the declared
   * granularity, the same w-knob every shingle method trades on.
   *
   * Scale: no pair expansion exists anywhere — docs are never joined to
   * docs. One scan-local anchor explode, one hash-aggregate census on the
   * shingle, a semi join back (AQE splits a boilerplate-hot shingle key;
   * there is no quadratic term for [[capBlocks]] to cap), then a per-doc
   * window over that doc's anchors only. Returns
   * (idCol, span_start, span_end, n_anchors).
   */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val anchors = anchorStage(docs, idCol, textCol, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Scale.releaseAfterUse(spansFromAnchors(anchors, idCol, w), Seq(anchors))
  }

  /** (id, pos, __sh) anchor rows: the width-`w` shingle starting at each
    * 1-based word position. Docs shorter than `w` words emit nothing. */
  private def anchorStage(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    Scale.spreadForCompute(docs.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), split(col(textCol), "\\s+").as("__words"))
      .filter(size(col("__words")) >= w)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__words")) - (w - 1)),
        i => struct(i.as("pos"),
          concat_ws(" ", slice(col("__words"), i, lit(w))).as("sh")))).as("__a"))
      .select(col(idCol), col("__a.pos").as("pos"), col("__a.sh").as("__sh"))

  /** Duplicated-anchor runs → spans (shared by [[duplicatedSpans]] and
    * [[removeDuplicatedSpans]]; callers own `anchors`' lifecycle). */
  private def spansFromAnchors(anchors: DataFrame, idCol: String,
      w: Int): DataFrame = {
    // "seen in >1 distinct doc" as min(id) != max(id): a single-phase
    // min/max aggregate combines map-side in ONE shuffle, where
    // countDistinct expands to two (dedupe on (shingle, id), then count
    // on shingle) — same predicate, half the census shuffles (isolated
    // min-of-2 A/B at sf0.1: q_dedup_substring 1.52→1.21s).
    val dup = anchors.groupBy(col("__sh"))
      .agg(min(col(idCol)).as("__lo"), max(col(idCol)).as("__hi"))
      .filter(col("__lo") =!= col("__hi"))
      .select(col("__sh"))
    // the run-grouping trick: consecutive positions share (pos − rank)
    val runs = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    anchors.join(dup, Seq("__sh"), "left_semi")
      .withColumn("__grp", col("pos") - row_number().over(runs))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (w - 1)).as("span_end"),
        count(lit(1)).as("n_anchors"))
      .drop("__grp")
  }

  /**
   * Exact-substring duplicate REMOVAL on top of [[duplicatedSpans]] (the
   * transform RefinedWeb applies): drop every word covered by a
   * cross-doc duplicated span and reassemble the document from the
   * surviving words in order. Returns (id, n_tokens, n_removed,
   * clean_text); a fully-duplicated doc survives with empty text —
   * dropping it is the caller's policy, as in `Curation.
   * removeBoilerplate` (whose chunk granularity this refines to exact
   * word spans). Reassembly is one per-doc hash aggregate with in-row
   * array_sort — no corpus-wide sort.
   */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val anchors = anchorStage(docs, idCol, textCol, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val covered = spansFromAnchors(anchors, idCol, w)
      .select(col(idCol),
        explode(sequence(col("span_start"), col("span_end"))).as("pos"))
      .distinct()
    val toks = Scale.spreadForCompute(
        docs.filter(col(textCol).isNotNull), col(idCol))
      .select(col(idCol), posexplode(split(col(textCol), "\\s+"))
        .as(Seq("__p0", "__word")))
      .select(col(idCol), (col("__p0") + 1).as("pos"), col("__word"))
    val kept = toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("__word")))),
        x => x("__word"))).as("clean_text"))
    val totals = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"))
    val removed = covered.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_removed"))
    val out = totals
      .join(removed, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .na.fill(0L, Seq("n_removed"))
      .na.fill("", Seq("clean_text"))
    Scale.releaseAfterUse(out, Seq(anchors))
  }

  /**
   * Embedding-cosine near-duplicate pairs, exact: every (a < b) pair with
   * cosine ≥ threshold. O(n²) — correct and oracle-checkable, for modest n
   * or as the verifier over a candidate set. The scale path is
   * [[embeddingNearDupsLsh]].
   */
  def embeddingNearDupsExact(df: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorOps
    // per-row norms once per side, not per pair. The LEFT side is the
    // STREAMED side of the broadcast nested-loop pair join, so the whole
    // O(n²·dim) cosine verify inherits ITS partitioning — a compact
    // corpus arrives as one scan partition and the entire pair compute
    // serialized into 1-2 tasks (measured: 4 tasks, 0.93 s at sf0.1 for a
    // 4M-pair verify; the spread fans it across the session width). The
    // usual spreadForCompute contract: no-op on a wide (100 TB) scan.
    val a = Scale.spreadForCompute(df, col(idCol))
      .select(col(idCol).as("a"), col(embCol).as("emb_a"),
      VectorOps.l2Norm(col(embCol)).as("norm_a"))
    val b = df.select(col(idCol).as("b"), col(embCol).as("emb_b"),
      VectorOps.l2Norm(col(embCol)).as("norm_b"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", VectorOps.dot(col("emb_a"), col("emb_b"))
        / (col("norm_a") * col("norm_b")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /**
   * Embedding-cosine near-dup pairs at scale: candidates meet only inside a
   * sign-LSH bucket (equi-join on bucket id — no O(n²) pair explosion),
   * then exact cosine verifies. Recall is governed by the plane count:
   * fewer planes → bigger buckets → higher recall, more work.
   */
  def embeddingNearDupsLsh(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, planes: Seq[Seq[Double]]): DataFrame = {
    val bucketed = Similarity.withLshBucket(df, embCol, planes)
      .select(col(idCol), col(embCol), col("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bucketed.select(col(idCol).as("a"), col(embCol).as("emb_a"), col("bucket"))
    val b = bucketed.select(col(idCol).as("b"), col(embCol).as("emb_b"), col("bucket"))
    Scale.releaseAfterUse(
      a.join(b, Seq("bucket")).filter(col("a") < col("b"))
        .withColumn("cos", graft.functions.VectorOps.cosine(col("emb_a"), col("emb_b")))
        .filter(col("cos") >= threshold)
        .select(col("a"), col("b"), col("cos")).distinct(),
      Seq(bucketed))
  }

  /** Default cell-size cap for [[semanticDedup]]: bounds any single
    * subcell's pair expansion at ~maxCell²/2 ≈ 8M pairs — one task's worth
    * of work, same sizing rationale as [[DefaultMaxBlock]]. */
  val DefaultMaxCell = 4096

  /**
   * Cell + subcell assignment stage of [[semanticDedup]], exposed
   * package-private so the planted-hot-cell spec can pin the pair-work
   * bound structurally. A cell of n rows is subsplit into
   * ns = ⌈n/maxCell⌉ subcells by the portable 60-bit id hash mod ns, so
   * expected subcell size is ≤ maxCell whatever the quantizer does —
   * a hot cell (degenerate embedding cluster, too-small k) degrades to
   * ns× missed-pair recall instead of a quadratic reducer. Returns
   * (idCol, embCol, __cell, __norm, __sub); __sub stays NULL for a NULL
   * cell (empty centroid set) so such rows never pair, matching the
   * uncapped operator's null-join semantics.
   */
  private[graft] def semanticCells(df: DataFrame, idCol: String,
      embCol: String, centroids: Seq[Seq[Double]], maxCell: Int): DataFrame =
    attachSubcells(assignCells(df, idCol, embCol)
        .withColumn("__cell", Ivf.nearestCentroid(col(embCol), centroids)),
      idCol, maxCell)

  /** Spread + per-row (norm) stage of [[semanticDedup]] — the projection
    * the assignment expression attaches to. Kept separate so the
    * operator can persist the ASSIGNMENT (computed once) while the cheap
    * census/subsplit join stays lazy on top of the cache. */
  private def assignCells(df: DataFrame, idCol: String,
      embCol: String): DataFrame = {
    import graft.functions.VectorOps
    // spread: the assignment (k dot products per row) is the CPU-heavy
    // stage and a compact corpus arrives as one scan partition (see
    // containmentPairs)
    Scale.spreadForCompute(df.select(col(idCol), col(embCol)), col(idCol))
      .withColumn("__norm", VectorOps.l2Norm(col(embCol)))
  }

  /** Attach `__sub` (hot-cell subsplit key) to a frame already carrying
    * `__cell`. Cell census is ≤ k rows (quantizer-matrix scale, never
    * data scale) — broadcast back onto the assignment; exact integer
    * ceil-div keeps the split count engine-portable. */
  private def attachSubcells(cells: DataFrame, idCol: String,
      maxCell: Int): DataFrame = {
    require(maxCell >= 1, s"maxCell must be >= 1, got $maxCell")
    val splits = cells.groupBy(col("__cell"))
      .agg(count(lit(1)).as("__cn"))
      .select(col("__cell"),
        expr(s"(__cn + ${maxCell - 1}) div $maxCell").as("__ns"))
    cells.join(broadcast(splits), Seq("__cell"))
      .withColumn("__sub",
        when(col("__cell").isNull, lit(null).cast("string"))
          .otherwise(concat_ws("#", col("__cell"),
            pmod(portableHash64(col(idCol)), col("__ns")))))
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023,
   * arXiv:2303.09540): every embedding is assigned to its nearest
   * coarse-quantizer centroid (broadcast k×dim plan literal — the
   * [[Ivf]] assignment), and near-duplicate candidates meet ONLY inside
   * their cell; a row is dropped when a lower-id same-cell row sits at
   * cosine ≥ threshold, so each semantic-duplicate set keeps its lowest
   * id (the repo's canonical-survivor convention). Pair volume is
   * Σ|cell|² instead of n² — k is the knob trading pair work against
   * recall (duplicates straddling a cell boundary are missed: the
   * declared SemDeDup trade, same shape as MinHash banding).
   *
   * `maxCell` is the skew guard the quantizer knob cannot give: a hot
   * cell (near-duplicate mass, a degenerate cluster, or simply too-small
   * k) would otherwise make the within-cell self-join quadratic in that
   * cell — the exact blowup [[capBlocks]] stops on the MinHash paths.
   * Cells above `maxCell` are SUBSPLIT by the portable id hash (see
   * [[semanticCells]]) rather than dropped: a dup pair straddling
   * subcells is missed with probability (ns−1)/ns, a declared recall
   * trade strictly milder than capBlocks' drop-everything, and the
   * primary mechanism for small cells remains a properly sized trained
   * k. Subsplitting only ever MISSES pairs — survivors(maxCell) ⊇
   * survivors(∞) — never invents a drop.
   *
   * Returns surviving (idCol, cell) rows.
   */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Seq[Double]], threshold: Double,
      maxCell: Int = DefaultMaxCell): DataFrame = {
    import graft.functions.VectorOps
    // persist the ASSIGNMENT (the k-dot-products-per-row stage): it feeds
    // the census, both self-join sides, and the survivor anti-join — four
    // consumers that would each recompute it otherwise. The census/
    // subsplit join on top stays lazy: it re-reads the cache and its
    // broadcast census is exchange-reused across the a/b sides. Freed
    // once the caller's first action over the result completes.
    val cells = assignCells(df, idCol, embCol)
      .withColumn("__cell", Ivf.nearestCentroid(col(embCol), centroids))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sub = attachSubcells(cells, idCol, maxCell)
    val a = sub.select(col(idCol).as("__a"), col(embCol).as("__ea"),
      col("__norm").as("__na"), col("__sub"))
    val b = sub.select(col(idCol).as("__b"), col(embCol).as("__eb"),
      col("__norm").as("__nb"), col("__sub"))
    val dropped = a.join(b, "__sub").filter(col("__a") < col("__b"))
      .filter(VectorOps.dot(col("__ea"), col("__eb"))
        / (col("__na") * col("__nb")) >= threshold)
      .select(col("__b").as(idCol)).distinct()
    val survivors = cells.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("__cell").as("cell"))
    Scale.releaseAfterUse(survivors, Seq(cells))
  }

  /**
   * Connected components over an undirected edge list by min-label
   * propagation: every node starts labeled with its own id; each round a
   * node adopts the minimum label among itself and its neighbors, until no
   * label changes. Converges in O(component diameter) rounds — near-dup
   * clusters are shallow, so a handful of rounds closes them.
   *
   * This is the step after pair finding that a real dedup pipeline needs:
   * pairwise matches are not usable until transitively closed into groups
   * with one canonical survivor (the min id = the component label).
   *
   * Scale: each round is one shuffle join (edges ⋈ labels) plus one
   * aggregate, then a pointer-halving hop (labels jump to their label's
   * label — the star-contraction idea of Kiveris et al., "Connected
   * Components in MapReduce and Beyond"), which turns O(diameter) rounds
   * into O(log diameter): a 2^k-diameter path closes in ~k rounds. The
   * driver holds only one scalar per round (Pregel-style control flow, no
   * row materialization). Labels persist per round and the previous round
   * unpersists once the next is materialized, so peak storage is two label
   * tables of |V| rows.
   */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame =
    connectedComponentsWithRounds(edges, aCol, bCol, maxIter)._1

  /** [[connectedComponents]] plus the number of loop rounds it ran —
    * package-private so specs can pin convergence-speed claims without
    * parsing debug output.
    *
    * NOTE on a tempting-but-unsound shortcut: seeding each node's label
    * with the minimum id of its candidate BLOCK (the pre-verify blocking
    * key) would cut rounds but is wrong — block co-membership is not
    * linkage. Two records can share a block yet fail the verify predicate
    * (edit distance, Jaccard), and a block-min seed would still fuse
    * their clusters. LinkageSpec pins the counterexample. The sound
    * round-cutter used here instead: the init aggregate folds min-direct-
    * neighbor AND one pointer-halving hop (min over the 2-hop chain
    * comp(comp(id))), which only ever assigns labels that are ids inside
    * the node's own component — pairs, min-centered stars, and descending
    * chains converge at init, leaving the loop a single confirmation
    * round, and deep chains start two label-hops ahead. */
  private[graft] def connectedComponentsWithRounds(edges: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 20): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    // Symmetrize in ONE pass over the edge plan via explode — a
    // union-of-two-selects would duplicate the (possibly expensive)
    // edge-finding lineage and execute it once per branch, forcing an
    // extra persist + count just to pre-materialize it.
    // NO distinct: min-label propagation is idempotent under duplicate
    // edges (min over a multiset ignores multiplicity), so deduping the
    // symmetrized list would spend a full (src, dst) shuffle per CC call
    // purely on join-width hygiene — and every in-repo edge producer
    // (banded MinHash, blocked fuzzy pairs) already emits unique pairs.
    // Callers feeding heavily duplicated edge lists should dedupe first;
    // duplicates cost join fan-out only, never correctness. (Isolated
    // min-of-2 A/B at sf0.1, on top of the probe's gains: q_entity_res
    // 2.54→1.91s, q_dedup_cluster 1.90→1.41s, q_dedup_survivor
    // 1.87→1.74s, q_split_leakfree 1.92→1.67s.)
    // The result persists partitioned on dst — the per-round join key —
    // so iteration rounds probe the cached layout instead of re-shuffling
    // the edge list every round. repartition by column (no explicit
    // width) stays AQE-coalescible: tiny graphs collapse to a few
    // partitions, 100 TB graphs keep the session width.
    val sym = edges
      .select(explode(array(
        struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
        struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Round 0 folds into the init aggregate: every node starts at
    // least(own id, min direct neighbor), so star-shaped clusters converge
    // with zero loop rounds beyond the confirmation pass.
    // Labels are localCheckpoint'ed (eager) each round, not merely
    // persisted: persist caches blocks but keeps the logical plan, and the
    // pointer-halving self-join below references its input TWICE — without
    // lineage truncation the analyzed plan doubles per round and Catalyst
    // optimization time grows exponentially with iteration count. A
    // checkpointed round is a flat LogicalRDD, so every round's plan is
    // constant-size. (On a cluster, reliable `checkpoint()` to a
    // configured dir is the fault-tolerant variant of the same move.)
    // Checkpoints are LAZY (eager=false): the labelSum action right after
    // each round materializes the checkpoint as a side effect, so a round
    // costs ONE job, not a checkpoint job plus an aggregate job.
    // Init folds min-direct-neighbor, then one pointer-halving hop over
    // that provisional labeling (comp(comp(id)) — see the scaladoc note on
    // why BLOCK-seeded init would be unsound). The self-join doubles the
    // init1 lineage, so init1 persists for the one job that materializes
    // the checkpoint, then frees.
    val init1 = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("nbr"))
      .select(col("id"), least(col("id"), col("nbr")).as("c1"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var comp = init1
      .join(init1.toDF("c1", "c2"), Seq("c1"), "left")
      .select(col("id"), coalesce(col("c2"), col("c1")).as("comp"))
      .localCheckpoint(false)
    // Init-convergence probe: a labeling is a fixed point iff NO edge
    // straddles two labels (then every component is uniformly labeled, the
    // label is a member id, and label(min) <= min forces it to BE the
    // component min — so uniform == converged == correct). Near-dup and
    // entity clusters are shallow, so the init aggregate + halving hop
    // usually converges outright; probing edge violations here (two
    // shuffle joins under an isEmpty limit-1) replaces the full
    // confirmation round — propagate + halve + checkpoint — that the loop
    // would otherwise run just to observe an unchanged label sum. The
    // probe action also materializes the lazy init checkpoint. Deep
    // graphs pay one probe (~half a round) before the loop; the bench's
    // CC queries (fuzzy/entity clusters) all exit here with 0 loop rounds
    // (isolated min-of-2 A/B at sf0.1: q_entity_res 4.84→2.54s,
    // q_dedup_cluster 3.07→1.90s, q_dedup_survivor 3.34→1.87s,
    // q_split_leakfree 2.96→1.92s).
    val initViolations = sym
      .join(comp.toDF("src", "__sl"), "src")
      .join(comp.toDF("dst", "__dl"), "dst")
      .filter(col("__sl") =!= col("__dl"))
    val initConverged = initViolations.isEmpty
    init1.unpersist()
    if (initConverged) {
      sym.unpersist()
      return (comp, 0)
    }
    // Labels only ever decrease, so the decimal label sum (no long
    // overflow at any id magnitude) is a monotone convergence metric:
    // one scalar action per round, no prev-vs-next join.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // empty graph → sum is NULL → treat as zero (converged immediately)
      val s = df.agg(sum(col("comp").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = labelSum(comp) // cheap: scans the materialized checkpoint
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prop = sym
        .join(comp.toDF("dst", "dlbl"), "dst")
        .select(col("src").as("id"), col("dlbl").as("lbl"))
        .unionByName(comp.toDF("id", "lbl"))
        .groupBy("id").agg(min(col("lbl")).as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // Pointer halving: follow the label one more hop (comp(comp(id))).
      // Labels always satisfy comp(id) <= id and point at a real node, so
      // the hop only ever decreases a label — the monotone convergence
      // metric below still holds — while label chains collapse
      // exponentially instead of one link per round.
      val next = prop.toDF("id", "c1")
        .join(prop.toDF("c1", "c2"), Seq("c1"), "left")
        .select(col("id"), coalesce(col("c2"), col("c1")).as("comp"))
        .localCheckpoint(false)
      val nextSum = labelSum(next) // materializes the lazy checkpoint
      prop.unpersist()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] iter $it sum=$nextSum")
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      val prev = comp
      comp = next
      // Dataset.unpersist is a NO-OP for checkpointed frames (their blocks
      // live at the RDD level, outside the cacheManager) — free the round
      // through the bridge or peak storage grows O(rounds × |V|) instead
      // of the documented two label tables.
      org.apache.spark.sql.GraftBridge.freeCheckpoint(prev)
      it += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — the " +
          "graph has a component with diameter > maxIter; raise maxIter. " +
          "Returning unconverged labels would silently split clusters.")
    (comp, it)
  }

  /**
   * 16-bit SimHash over whitespace tokens: bit i is the sign of the sum of
   * (+1/-1) votes from bit i of each token's xxhash64. Scan-only; near-dup
   * docs land at small Hamming distance.
   */
  def simHash16(text: Column): Column =
    simHash16With(text, xxhash64(_))

  /** [[simHash16]] over the portable md5 hash family (oracle-checkable). */
  def simHash16Portable(text: Column): Column =
    simHash16With(text, portableHash64)

  private def simHash16With(text: Column, tokenHash: Column => Column): Column = {
    val hashes = transform(split(text, "\\s+"), x => tokenHash(x))
    (0 until 16).map { i =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
