package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable sampling (training-pipeline surface).
 *
 * `df.sample()` draws from a partition-seeded RNG: the selection changes
 * with partition layout, task retries, and engine — unacceptable for a
 * training corpus where a sample must be re-derivable forever and audit-
 * able by other tools. Hashing a key column makes the keep/drop decision a
 * pure row-level function: md5 is identical in every engine, a row's fate
 * never depends on other rows (so incremental re-runs at 100 TB keep prior
 * decisions), and disjoint salts give independent samples.
 *
 * Mechanics: the first 4 hex chars of md5(salt|key) are uniform over
 * [0x0000, 0xffff]; comparing them lexicographically against a fixed-width
 * hex threshold keeps fraction int(threshold,16)/65536. Fixed-width hex
 * compares like the number itself, so the gate works in any engine with
 * md5 + substring — no hex-to-int conversion needed.
 *
 * Scale: the gate is a scan-local codegen'd predicate — no shuffle, no RNG
 * state, pushes through joins/aggregations like any deterministic filter.
 */
object Sampling {

  /** Uniform hash in [0x0000, 0xffff] as 4 lowercase hex chars. NULL keys
    * hash to NULL, so every gate below evaluates false for them — null-key
    * rows never enter a sample (callers wanting them must coalesce first).
    * `concat` (not concat_ws) mirrors the oracle's `concat(salt,'|',key)`
    * byte-for-byte on non-null keys. */
  def hashHex4(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit("|"), key.cast("string"))), 1, 4)

  /** Keep iff hash < thresholdHex (4 lowercase hex chars); keeps fraction
    * int(thresholdHex,16)/65536 in expectation. */
  def keepHex(key: Column, salt: String, thresholdHex: String): Column = {
    require(thresholdHex.matches("[0-9a-f]{4}"), s"bad threshold $thresholdHex")
    hashHex4(key, salt) < lit(thresholdHex)
  }

  /**
   * Weighted deterministic sampling: keep probability = w/65536 where w is
   * `weight` clamped into [0, 65535] (NULL ⇒ 0 ⇒ never kept; the maximum
   * keep rate is 65535/65536, not certainty — strict `<` against the hex
   * ceiling). The per-row threshold renders as fixed-width hex so the
   * comparison stays the same portable string gate as keepHex. Training
   * mixes use this to sample long/high-quality documents at a higher
   * rate, reproducibly.
   */
  def keepWeighted(key: Column, salt: String, weight: Column): Column = {
    val w = least(greatest(coalesce(weight.cast("long"), lit(0L)), lit(0L)),
      lit(65535L))
    hashHex4(key, salt) < lpad(lower(hex(w)), 4, "0")
  }

  /** Full 32-hex md5 of (salt|key): a portable total "random" order for
    * rank-based sampling (ties impossible in practice; callers still add
    * the key as tiebreak so determinism never rests on that). */
  def hashHexFull(key: Column, salt: String): Column =
    md5(concat(lit(salt), lit("|"), key.cast("string")))

  /**
   * Deterministic k-per-group sample: rank each group's rows by the
   * portable hash of their key (key tiebreak) and keep the first k —
   * a reproducible uniform-ish k-sample per group (quota sampling for
   * eval sets, per-source spot checks). One shuffle on the group columns;
   * the rank never crosses groups, so skewed group sizes parallelize by
   * group count, and at 100 TB the window carries two small columns, not
   * the payload (join the sample keys back for that).
   */
  def groupSample(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      keyCol: String, salt: String, k: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(hashHexFull(col(keyCol), salt), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /**
   * Disjoint train/val/test assignment by hash range: [0, trainHex) →
   * train, [trainHex, valHex) → val, rest → test. Every row lands in
   * exactly one split, and the assignment is stable under any re-run.
   */
  def splitLabel(key: Column, salt: String,
      trainHex: String = "cccc", valHex: String = "e666"): Column = {
    val h = hashHex4(key, salt)
    when(h < lit(trainHex), "train")
      .when(h < lit(valHex), "val")
      .otherwise("test")
  }

  /**
   * Deterministic repeat-upsampling — the "epochs per source" mix lever
   * (e.g. 2.5 epochs of a high-quality source, 0.8 of a noisy one):
   * every row emits floor(w) copies plus one more iff its hash gate
   * passes at probability frac(w), so the per-key copy count is exactly
   * ⌊w⌋ or ⌈w⌉, the expectation is exactly w, and the choice is a pure
   * function of (salt, key) — reproducible forever, unlike RNG-based
   * upsampling. w ≤ 0 drops the row (downsampling below 1 works too:
   * w = 0.8 keeps 80%). Scan-local explode — no shuffle, no RNG state,
   * pushes through the plan like any projection. Returns the input plus
   * a 1-based `copy` index.
   */
  def repeatUpsample(df: org.apache.spark.sql.DataFrame, keyCol: String,
      salt: String, weight: Column): org.apache.spark.sql.DataFrame = {
    val frac = weight - floor(weight)
    val thr = lpad(lower(hex(floor(frac * 65536).cast("long"))), 4, "0")
    val extra = when(hashHex4(col(keyCol), salt) < thr, 1L).otherwise(0L)
    val n = floor(weight).cast("long") + extra
    // sequence(1, n) with n < 1 would generate DESCENDING [1..n] —
    // guard to an empty array so non-positive counts drop the row
    df.withColumn("copy", explode(
      when(n >= 1L, sequence(lit(1L), n))
        .otherwise(array().cast("array<long>"))))
  }

  /**
   * Deterministic global shuffle into training shards — the layout op
   * that randomizes a curated corpus into fixed shard files WITHOUT a
   * corpus-wide total sort. A row's shard is the 60-bit hash of
   * md5(salt|key) mod `nShards` (uniform, so shards balance); its
   * position within the shard ranks the full 32-hex hash with the key as
   * tiebreak. Reading shards in index order and rows in position order is
   * then a reproducible pseudo-random permutation of the corpus — the
   * property training loaders need (no learning-order bias from source/
   * time grouping in the ingest layout), re-derivable forever in any
   * md5-capable engine; disjoint salts give independent epoch orders.
   *
   * Scale: ONE hash shuffle on the shard id plus a per-shard sort of
   * |corpus|/nShards hash-uniform rows — never a global orderBy, and
   * nShards is the parallelism knob. A writer then
   * `Sources.writePartitioned(out, path, Seq("shard"))`s without
   * re-shuffling. Returns the input plus (shard, pos).
   */
  def shuffleShards(df: org.apache.spark.sql.DataFrame, keyCol: String,
      salt: String, nShards: Int): org.apache.spark.sql.DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", hashHexFull(col(keyCol), salt))
      .withColumn("shard", shardOfHash(col("__h"), nShards))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Shard id from a full 32-hex salted hash: the 60-bit prefix (same
    * hex→long construction as Dedup.portableHash64) mod `nShards`.
    * Shared by [[shuffleShards]] and the streaming
    * [[graft.streaming.Streams.shardAppend]] so batch and stream can
    * never disagree on a row's shard. */
  def shardOfHash(hashHex: Column, nShards: Int): Column =
    pmod(conv(substring(hashHex, 1, 15), 16, 10).cast("long"),
      lit(nShards.toLong))

  /**
   * Gumbel-top-k weighted sampling WITHOUT replacement (Gumbel-max
   * trick; Vieira 2014, and the sampler DSIR's importance resampling
   * specifies): rank rows by score + Gumbel noise and keep the top k —
   * exactly equivalent to drawing k rows without replacement with
   * probability ∝ exp(score). The Gumbel is SEEDED from the portable
   * hash of (salt | key), the repo's sampling convention: the draw
   * re-derives bit-for-bit forever and in any md5-capable engine, and
   * disjoint salts give independent draws.
   *
   * Portability: u = (h + ½)/2²⁰ is a dyadic rational (exact in IEEE),
   * u ∈ (0,1) strictly, g = −ln(−ln(u)) takes ONE inner libm ln rounded
   * to decimal(17,10) (the langIdNaiveBayes recipe) before the outer ln,
   * which is rounded the same way — cross-engine ulp drift dies at each
   * rounding. The perturbed key ranks as a double; ties (measure zero)
   * break on `keyCol`. Plans as TakeOrderedAndProject — no global sort.
   * Returns the input plus the perturbed `gumbel_key`.
   */
  def gumbelTopK(df: org.apache.spark.sql.DataFrame, keyCol: String,
      score: Column, salt: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = pmod(graft.operators.Dedup.portableHash64(
      concat(lit(salt), lit("|"), col(keyCol).cast("string"))),
      lit(1048576L))
    val u = (h.cast("double") + 0.5) / 1048576.0
    def lnDec(c: Column) = log(c).cast("decimal(17,10)").cast("double")
    val gumbel = -lnDec(-lnDec(u))
    df.withColumn("gumbel_key", round(score + gumbel, 6))
      .orderBy(col("gumbel_key").desc, col(keyCol))
      .limit(k)
  }

  /**
   * Length-bucketed sequence packing — the no-split packing pass a
   * training pipeline runs when documents must NOT cross sequence
   * boundaries (SFT examples, contrastive pairs; the cross-boundary
   * concat-and-split variant is [[graft.queries.Pipeline]]'s
   * q_token_windows). Each document's token count rounds UP to its
   * power-of-two length bucket (capped at `capacity`); within a
   * (shard, bucket) every document occupies the same slot width, so
   * exactly ⌊capacity / bucket⌋ documents pack per sequence and the
   * assignment is ONE row_number window divided by that constant — a
   * fully relational packing with EXACT padding accounting, no
   * sequential first-fit fold (whose bin state cannot be expressed as a
   * window). Documents longer than `capacity` are excluded (the
   * caller's truncation policy runs first, documented like
   * [[graft.operators.Unigram]]'s bounded-DP contract).
   *
   * Determinism: the shard is the portable salted hash ([[shardOfHash]]
   * — batch/stream agree), in-bucket order is (token count desc, key) —
   * a pure function of the corpus, reproducible in any md5-capable
   * engine. Scale: ONE hash shuffle on (shard, bucket) + per-group
   * windows over |corpus|/(nShards·buckets) rows; nShards is the
   * parallelism knob exactly as in [[shuffleShards]].
   *
   * Returns the input plus (shard, bucket, seq_id, slot) — the physical
   * training-sequence assignment; aggregate over (shard, bucket,
   * seq_id) for the padding-efficiency report.
   */
  /** Power-of-two length bucket as a generated when-cascade: log2+ceil
    * would ride each engine's libm; ≤ log2(capacity)+1 exact
    * comparisons. Shared by [[packSequences]] and the streaming
    * [[graft.streaming.Streams.packAppend]] so batch and stream can
    * never disagree on a document's bucket. */
  def pow2Bucket(tokenCol: Column, capacity: Int): Column = {
    require(capacity >= 1 && (capacity & (capacity - 1)) == 0,
      s"capacity must be a positive power of two, got $capacity")
    val buckets = Iterator.iterate(1)(_ * 2)
      .takeWhile(_ <= capacity).toSeq
    buckets.tail.foldLeft(
        when(tokenCol <= 1, lit(1))) { (acc, b) =>
      acc.when(tokenCol <= b, lit(b))
    }
  }

  def packSequences(df: org.apache.spark.sql.DataFrame, keyCol: String,
      tokenCol: String, salt: String, nShards: Int,
      capacity: Int): org.apache.spark.sql.DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val bucket = pow2Bucket(col(tokenCol), capacity)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("bucket"))
      .orderBy(col(tokenCol).desc, col(keyCol))
    df.filter(col(tokenCol) >= 1 && col(tokenCol) <= capacity)
      .withColumn("shard",
        shardOfHash(hashHexFull(col(keyCol), salt), nShards))
      .withColumn("bucket", bucket)
      // long: __rn * bucket would wrap (or throw under ANSI) as 32-bit
      // once a (shard, bucket) group passes 2^31/bucket rows — reachable
      // at the corpus scale this operator targets
      .withColumn("__rn", row_number().over(w).cast("long") - 1)
      // per-sequence slots = capacity div bucket (both powers of two,
      // so the division is exact); `div`/`%` keep it integer arithmetic
      .withColumn("seq_id",
        expr(s"(__rn * bucket) div $capacity").cast("long"))
      .withColumn("slot",
        expr(s"__rn % ($capacity div bucket)").cast("long"))
      .drop("__rn")
  }

  /**
   * [[packSequences]] driven by an EXPLICIT consumption order instead of
   * the hash shuffle — the packing half of in-context pretraining (Shi
   * et al. 2023): with `orderCol` = [[graft.operators.Curation
   * .semanticOrder]]'s `pos`, documents that are semantically ADJACENT
   * in the stream land in the SAME shard (shards are contiguous order
   * ranges, not hash scatters — a hash shard would dilute adjacency
   * nShards×) and fill a sequence's slots in order, so each packed
   * training sequence carries related material.
   *
   * `orderSpan` is the exclusive upper bound of `orderCol` (e.g.
   * max(pos)+1 — one scalar aggregate for the caller): the shard is the
   * exact integer `(order · nShards) div orderSpan`, clamped to the last
   * shard for order values at/past the span (the caller's convention for
   * rows WITHOUT an order, e.g. docs with no embedding, is to assign
   * them `orderSpan` so they pack together at the tail, tie-broken by
   * key). Shards balance when the order is dense — semanticOrder's
   * positions are dense by construction; gate dropout upstream thins
   * ranges uniformly in expectation.
   *
   * Same scale shape as [[packSequences]]: ONE hash shuffle on (shard,
   * bucket) + bounded per-group windows; same exact seq_id/slot integer
   * math, same [1, capacity] admission filter, so funnel accounting is
   * IDENTICAL between the two packers (PrepareSpec pins that). Every
   * step is a pure function of (orderCol, keyCol, tokenCol) —
   * reproducible in any engine, no RNG, no engine hashing.
   */
  def packSequencesByOrder(df: org.apache.spark.sql.DataFrame,
      keyCol: String, tokenCol: String, orderCol: String, orderSpan: Long,
      nShards: Int, capacity: Int): org.apache.spark.sql.DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(orderSpan >= 1, s"orderSpan must be >= 1, got $orderSpan")
    val bucket = pow2Bucket(col(tokenCol), capacity)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("bucket"))
      .orderBy(col(orderCol), col(keyCol))
    df.filter(col(tokenCol) >= 1 && col(tokenCol) <= capacity)
      // long, matching [[packSequences]]'s shardOfHash output type
      .withColumn("shard",
        least(lit(nShards - 1L),
          expr(s"($orderCol * $nShards) div $orderSpan")).cast("long"))
      .withColumn("bucket", bucket)
      // long BEFORE the `__rn * bucket` multiply below, same as
      // [[packSequences]]: a 32-bit __rn wraps (or throws under ANSI)
      // once a (shard, bucket) group passes 2^31/bucket rows — ~1M rows
      // at bucket 2048, and contiguous-order shards concentrate rows
      // more than hash shards do.
      .withColumn("__rn", row_number().over(w).cast("long") - 1)
      .withColumn("seq_id",
        expr(s"(__rn * bucket) div $capacity").cast("long"))
      .withColumn("slot",
        expr(s"__rn % ($capacity div bucket)").cast("long"))
      .drop("__rn")
  }
}
