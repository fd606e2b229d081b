package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing:
 * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
 * algorithm): hash every k-char gram of the normalized text, slide a
 * w-hash window, and keep each window's minimum hash. The selected set is
 * a LOCAL fingerprint: any substring shared between two documents of
 * length ≥ w + k − 1 chars is guaranteed to contribute at least one
 * shared fingerprint, at an expected density of 2/(w+1) fingerprints per
 * gram — position-robust (unlike [[Dedup.duplicatedSpans]]' fixed
 * anchors) and threshold-guaranteed (unlike MinHash, which is
 * probabilistic in the OVERLAP, not just the sample). REF has no
 * fingerprinting surface (its 966 LoC are masking); this extends
 * SURVEY §2.9-L1 dedup the way containment/substring dedup do.
 *
 * Scale shape: fingerprint SELECTION is entirely scan-local — ONE
 * codegen'd O(m) pass per document ([[graft.functions.WinnowFps]]:
 * byte-range gram md5s with zero per-gram allocation + a monotonic deque
 * for the sliding minima), so a 100 TB corpus pays zero shuffle until
 * the (doc, fingerprint) rows census-aggregate. Detection then
 * bucket-joins on the fingerprint value with the [[Dedup.capBlocks]]
 * boilerplate guard, never all-pairs.
 *
 * Portability: gram hashes are [[Dedup.portableHash64]] (md5-derived), the
 * window minimum breaks hash ties toward the RIGHTMOST position (the
 * paper's rule, expressed as array_min over (h, −pos) structs), and
 * selection is a pure function of the text — so the full pipeline,
 * selection included, is re-runnable in any md5-capable engine and
 * oracle-checks bit-for-bit.
 */
object Winnow {

  /** Default gram length / window width: t = w + k − 1 = 39 chars is the
    * guaranteed-detection threshold — half a sentence of verbatim overlap,
    * long enough that small-vocabulary prose doesn't alias (k=12 grams
    * over a 60-word vocabulary collide across most doc pairs; measured on
    * the fixture: 22.8k spurious pairs at k=12 vs 27 true ones at k=24). */
  val DefaultK = 24
  val DefaultW = 16

  /** Whitespace-collapsed lowercase text — [[Dedup.fingerprint]]'s
    * canonicalization, shared so exact and local fingerprints agree on
    * what "the text" is. */
  private def canon(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /**
   * Per-document winnowed fingerprints: (idCol, fp, pos) — the selected
   * gram hashes with their 1-based positions in the canonical text,
   * distinct per document. Documents shorter than k chars (nothing to
   * gram) emit no rows. Entirely scan-local: the only shuffle is
   * [[Scale.spreadForCompute]]'s width fix for compact fixture scans.
   */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultK, w: Int = DefaultW): DataFrame = {
    val spread = Scale.spreadForCompute(
      docs.filter(col(textCol).isNotNull &&
        length(canon(col(textCol))) >= k), col(idCol))
    // selection runs as ONE codegen'd O(m) pass (byte-range gram hashes +
    // monotonic-deque sliding minima — graft.functions.WinnowFps); the
    // composed higher-order formulation it is bit-equal to is kept below
    // for WinnowSpec's equivalence property
    val sel = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WinnowFps(
        org.apache.spark.sql.GraftBridge.expression(canon(col(textCol))),
        k, w))
    spread
      .select(col(idCol), explode(sel).as("__fp"))
      .select(col(idCol), col("__fp.fp").as("fp"), col("__fp.pos").as("pos"))
  }

  /** The original composed higher-order-function selection — per-window
    * `array_min(slice(...))` over (h, −pos) structs, `array_distinct`,
    * one md5 per gram via `substr`. Kept as the independent reference
    * implementation WinnowSpec pins [[graft.functions.WinnowFps]]'s
    * bit-equivalence against (same role the conv/substring/md5 composition
    * plays for PortableHash). Returns array<struct<fp, pos>>; like
    * WinnowFps it is total — texts shorter than k grams yield an empty
    * array (guarded explicitly, because `sequence(1, m)` with m < 1 counts
    * DOWN and would fabricate negative-position grams). */
  private[graft] def fingerprintArrayComposed(text: Column, k: Int,
      w: Int): Column = {
    val t = canon(text)
    val hs = transform(
      sequence(lit(1), length(t) - lit(k - 1)),
      i => struct(Dedup.portableHash64(t.substr(i, lit(k))).as("h"),
        (-i).as("ni")))
    // bind the gram-hash array ONCE as a lambda variable (single-element
    // outer transform): higher-order functions always eval interpreted, and
    // the Column DSL inlines `hs` at each reference site — the m window
    // slices would each recompute the whole O(m)-md5 array (O(m²) total)
    val sel = flatten(transform(array(hs), a => {
      val nw = greatest(size(a) - lit(w - 1), lit(1))
      transform(
        array_distinct(transform(sequence(lit(1), nw),
          j => array_min(slice(a, j, lit(w))))),
        s => struct(s.getField("h").as("fp"),
          (-s.getField("ni")).cast("long").as("pos")))
    }))
    when(length(t) >= lit(k), sel)
      .otherwise(array().cast("array<struct<fp:bigint,pos:bigint>>"))
  }

  /**
   * MOSS-style overlap detection: document pairs sharing ≥ `minShared`
   * winnowed fingerprints, with the shared count — (id_a, id_b,
   * n_shared), id_a < id_b. Fingerprints shared by more than `maxBlock`
   * documents are boilerplate (license headers, navigation chrome) and
   * are census-dropped before pairing ([[Dedup.capBlocks]]), bounding any
   * bucket's pair expansion; everything else is an equi-join on the
   * fingerprint value — never all-pairs, so detection cost is
   * O(Σ bucket²) over honest buckets only.
   */
  /**
   * Incremental overlap check — a DELTA batch of new documents against an
   * existing corpus, the [[Dedup.nearDuplicatesDeltaPortable]] shape for
   * the local-fingerprint modality (plagiarism-screening submissions,
   * admitting a crawl increment): (delta_id, corpus_id, n_shared) for
   * delta docs sharing ≥ `minShared` fingerprints with a corpus doc.
   * Cost is O(delta + collisions): the corpus side is fingerprinted once
   * (in production, materialized once and reused across batches — the
   * frame this returns joins against is exactly that index), boilerplate
   * fingerprints census-capped on the CORPUS side, and the only join is
   * delta-fps ⋈ corpus-fps on the fingerprint value.
   */
  def deltaOverlap(corpus: DataFrame, delta: DataFrame, idCol: String,
      textCol: String, k: Int = DefaultK, w: Int = DefaultW,
      minShared: Int = 3, maxBlock: Int = 64): DataFrame = {
    val cfp = fingerprints(corpus, idCol, textCol, k, w)
      .select(col(idCol).as("corpus_id"), col("fp")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val kept = Dedup.capBlocks(cfp, "fp", maxBlock)
    val dfp = fingerprints(delta, idCol, textCol, k, w)
      .select(col(idCol).as("delta_id"), col("fp")).distinct()
    val out = dfp.join(kept, "fp")
      .groupBy("delta_id", "corpus_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    Scale.releaseAfterUse(out, Seq(cfp))
  }

  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultK, w: Int = DefaultW, minShared: Int = 3,
      maxBlock: Int = 64): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol), col("fp")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val kept = Dedup.capBlocks(fp, "fp", maxBlock)
    val pairs = kept.select(col(idCol).as("id_a"), col("fp"))
      .join(kept.select(col(idCol).as("id_b"), col("fp")), "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    Scale.releaseAfterUse(pairs, Seq(fp))
  }

  /**
   * Fingerprint-density measurement — the oracle-checked number behind
   * the 2/(w+1) expected-density claim (Schleimer et al. 2003, §3;
   * ≈ 117,647 ppm at the default w=16). ONE row: doc count, total
   * selected fingerprints, total grams, and the corpus/min/max per-doc
   * densities in parts-per-million — all integer arithmetic
   * (scaled floor-div), so the report hash-matches across engines. The
   * companion to q_minhash_recall/q_semdedup_recall: it sizes w before a
   * run (density drives index size and join fan-in) the way those size
   * bands and maxCell.
   */
  def densityReport(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultK, w: Int = DefaultW): DataFrame = {
    val perDoc = fingerprints(docs, idCol, textCol, k, w)
      .groupBy(col(idCol)).agg(count(lit(1)).as("__nfp"))
    val grams = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        (length(canon(col(textCol))) - lit(k - 1)).cast("long").as("__m"))
      .filter(col("__m") >= 1)
    perDoc.join(grams, Seq(idCol))
      .select(col("__nfp"), col("__m"),
        expr("__nfp * 1000000L div __m").as("__ppm"))
      .agg(count(lit(1)).as("n_docs"), sum("__nfp").as("total_fps"),
        sum("__m").as("total_grams"),
        min("__ppm").as("min_ppm"), max("__ppm").as("max_ppm"))
      .select(col("n_docs"), col("total_fps"), col("total_grams"),
        expr("total_fps * 1000000L div total_grams").as("density_ppm"),
        col("min_ppm"), col("max_ppm"))
  }
}
