package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

/**
 * Plan-quality regression guards: the physical plans that make these
 * operators viable at 100 TB, asserted so a refactor can't silently
 * reintroduce a full scan, a lost broadcast, or an extra shuffle.
 */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters and projections reach the parquet scan") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"))
    assert(!p.contains("l_tax"), "pruned columns must not be read")
  }

  test("star join broadcasts the dimension sides") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("fact-fact join honors the sort-merge hint") {
    assert(plan("q_join_smj").contains("SortMergeJoin"))
  }

  test("bucketed co-located join: NO exchange on either side (scans " +
      "report the bucket hash partitioning)") {
    val base = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_bkt_spec_${spark.sparkContext.applicationId}").toString
    val o = graft.Tables.bucketed(spark,
      Tables.load(spark, dir, "orders"), "b_orders_spec",
      s"$base/orders", Seq("o_custkey"), Seq("o_custkey"), 8)
    val c = graft.Tables.bucketed(spark,
      Tables.load(spark, dir, "customer"), "b_customer_spec",
      s"$base/customer", Seq("c_custkey"), Seq("c_custkey"), 8)
    val joined = o.hint("merge")
      .join(c, col("o_custkey") === col("c_custkey"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.take(400))
    assert(!p.contains("Exchange"),
      "bucketed join must not shuffle either side")
    assert(p.contains("Bucketed: true") &&
      p.contains("SelectedBucketsCount: 8 out of 8"), p.take(400))
    // (the residual per-bucket Sort is partition-local — Spark 3+ only
    // trusts written sort order behind the legacy
    // bucketedTableScan.outputOrdering flag; the shuffle is the scale
    // cost and it is gone)
    // and the result is the plain join, layout-invisible
    assert(joined.count() ==
      Tables.load(spark, dir, "orders").join(
        Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey")).count())
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("anonymization is a single scan+project pass, no exchange before sort") {
    val p = plan("q_anonymize_full")
    // one FileScan, and the only exchange is the final presentation orderBy
    assert("FileScan".r.findAllIn(p).length == 1)
    assert("Exchange".r.findAllIn(p).length == 1)
  }

  test("group aggregate is partial+final (map-side combine)") {
    val p = plan("q_agg_group")
    assert(p.contains("partial_sum") || p.contains("partial"), p.take(400))
  }

  test("privacy audits are one partial+final aggregate; generalization " +
      "broadcasts both dims") {
    val k = plan("q_k_anonymity")
    // one scan, map-side partial before the QI shuffle, plus only the
    // presentation sort's exchange
    assert("FileScan".r.findAllIn(k).length == 1)
    assert(k.contains("partial"), k.take(400))
    assert("Exchange".r.findAllIn(k).length == 2, k.take(400))
    val g = plan("q_generalize")
    assert("BroadcastHashJoin".r.findAllIn(g).length == 2, g.take(400))
    // scan-local transforms: the date shift plans no exchange at all
    // beyond its presentation sort
    val d = plan("q_date_shift")
    assert("Exchange".r.findAllIn(d).length == 1, d.take(400))
  }

  test("CountMin builds its cells with a map-side partial aggregate and " +
      "broadcasts them into the estimate join") {
    val p = plan("q_cms_freq")
    assert(p.contains("partial"), p.take(400))
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("anonymization and filter queries run inside whole-stage codegen") {
    // AQE prints codegen stage markers only once the adaptive plan is final
    for (name <- Seq("q_anonymize_full", "q_filter_pred")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // count() would build a different plan; execute THIS one
      assert(df.queryExecution.executedPlan.toString.contains("*("),
        s"$name not codegen'd")
    }
  }

  test("bounded top-k aggregator runs a partial aggregate before its shuffle") {
    val p = plan("q_topk_group")
    // partial ObjectHashAggregate must appear BELOW the exchange: the
    // map-side cap at k rows per group is the operator's scale win
    val firstExchange = p.indexOf("Exchange")
    val aggs = "ObjectHashAggregate".r.findAllMatchIn(p).map(_.start).toSeq
    assert(aggs.size >= 2, p.take(400))
    assert(aggs.exists(_ > firstExchange),
      "no partial object aggregate below the first exchange")
  }

  test("frequent-items sketch aggregates partially map-side (k-bounded " +
      "buffers cross the shuffle, not the key table)") {
    val p = plan("q_freq_items")
    val aggs = "ObjectHashAggregate".r.findAllMatchIn(p).toSeq
    assert(aggs.size >= 2, p.take(400))
    assert(p.contains("freqitemsagg"), p.take(400))
  }

  test("bloom decontamination filters grams in the scan stage, pre-join") {
    // formatted mode — plain toString elides the long literal-array probe
    val p = SparkEntry.queries("q_decontaminate_bloom")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // the probe is a Filter over getbit arithmetic, not a join...
    val probeIds = """\((\d+)\) Filter""".r.findAllMatchIn(p).flatMap { m =>
      val start = m.start
      val end = p.indexOf("\n(", start + 1) match {
        case -1 => p.length; case e => e
      }
      if (p.slice(start, end).contains("getbit")) Some(m.group(1).toInt)
      else None
    }.toSeq
    assert(probeIds.nonEmpty, "no Filter with a getbit bloom probe found")
    // ...sitting BELOW the exact verify semi-join (formatted-plan operator
    // ids number bottom-up, so a descendant has the smaller id)
    val joinIds = """\((\d+)\) BroadcastHashJoin"""
      .r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    assert(joinIds.nonEmpty, "no verify join found")
    assert(probeIds.min < joinIds.max,
      "bloom probe must prune before the exact verify join")
  }

  test("count/min/max push down to the parquet footer (metadata-only scan)") {
    // aggregate pushdown needs the v2 parquet source; isolate the confs in
    // a child session so every other test keeps the default v1 plans
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val df = s2.read.parquet(s"$dir/lineitem.parquet")
      .agg(count(lit(1)).as("n"), min("l_orderkey").as("mn"),
        max("l_orderkey").as("mx"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregation: [COUNT(*)"), p.take(800))
    // and the pushed (footer-stats) result is the true one
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(count(lit(1)), min("l_orderkey"), max("l_orderkey")).collect().head
    assert(df.collect().head == plain)
  }

  test("approx_count_distinct lands within HLL error of the exact count") {
    // measured directly (the registered query now exposes only the
    // oracle-checkable verdict), at the query's pinned 1% rsd
    val r = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("a"),
        countDistinct(col("l_partkey")).as("e")).collect().head
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx $approx vs exact $exact")
    val verdict = SparkEntry.queries("q_agg_approx")(spark, dir).collect().head
    assert(verdict.getAs[Boolean]("within_5pct"))
  }

  test("partition-pruned reads: only the filtered partition directories scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = queries.Q.t(spark, "/root/testdata/sf0.001", "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("event_type") === "click")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      p.take(600))
    assert(read.count() ==
      ev.filter(col("event_type") === "click").count())
  }

  test("dynamic partition pruning: a filtered dim prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    queries.Q.t(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a real scan with a surviving filter — a local
    // relation would constant-fold the predicate away and DPP would see
    // nothing to derive the pruning subquery from
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("click", 1), ("view", 2), ("purchase", 3))
      .toDF("event_type", "type_id")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // the partition filter is only knowable AFTER the dim filter runs —
    // DPP injects it at runtime, so a 100 TB fact scans one partition
    // instead of all of them
    val joined = fact.join(dim.filter(col("type_id") === 1), "event_type")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"), p.take(800))
    assert(joined.count() ==
      fact.filter(col("event_type") === "click").count())
  }

  test("no query funnels data through a single partition unnecessarily") {
    // Global top-k/limit and grand-total aggregates legitimately gather to
    // one partition at the END (on already-reduced data); anything else
    // collapsing to SinglePartition would serialize at 100 TB.
    val gatherByDesign = Set("q_topk", "q_sample_limit", "q_agg_approx",
      "q_explode", "q_sql_join",
      // Grand-total aggregates: partials are distributed and only the
      // per-partition summaries gather to the final one-row stage
      // (q_profile per-column stats, q_funnel stage counts, q_tfidf's
      // corpus size N, q_lm_score's vocabulary size V, q_temperature_mix's
      // min per-language count — all scalars over already-aggregated rows).
      // (q_ppl_bucket composes q_lm_score, so it inherits the same
      // one-row vocabulary-size aggregate; its window runs distributed
      // over the per-language partitions.)
      "q_profile", "q_funnel", "q_tfidf", "q_lm_score", "q_ppl_bucket",
      "q_temperature_mix",
      // q_agg_approx_pct is a grand-total percentile verdict (one output
      // row from distributed partial sketches); q_privacy_report gathers
      // two one-row audit summaries over the already-aggregated 125-class
      // tables — both single-partition stages see scalars, not data.
      "q_agg_approx_pct", "q_privacy_report",
      // q_checksum's digest is one row summed from distributed partials —
      // the single-partition stage receives per-partition scalars only
      "q_checksum",
      // q_t_closeness's (tot, nb) global scalars and the ≤B-row bin table
      // gather once; every data-sized stage stays distributed
      "q_t_closeness",
      // q_suppress's suppressed-mass residue is a one-row scalar over the
      // already-aggregated class-size table
      "q_suppress",
      // connectedComponents sizes its iteration shuffle width to the edge
      // count (1 partition per ~5M edges): at test scale that is a single
      // partition by design; at 100 TB it is the session width.
      "q_dedup_cluster",
      // q_gapfill's scaffold explodes out of a one-row bounds aggregate —
      // the single partition holds exactly one row before the explode.
      "q_gapfill",
      // q_vocab_coverage's rank/cumsum window runs over the 20-row
      // TakeOrderedAndProject result (top-k via per-partition heaps), so
      // its single-partition stage holds exactly 20 already-reduced rows.
      "q_vocab_coverage",
      // q_skew_report's presentation sort runs over its own top-20 heap
      // result — the same already-reduced shape as q_topk.
      "q_skew_report",
      // q_constraints is a grand-total validation report: the one-row
      // final aggregate and the RI orphan count receive per-partition
      // scalars only (same shape as q_checksum/q_profile).
      "q_constraints",
      // q_drift_tvd's group/bin/grand totals are second-level aggregates
      // over the already-reduced (group × bin) cell table — every
      // data-sized stage (the cell build) stays distributed.
      "q_drift_tvd",
      // q_bm25's corpus statistics (N, Σdl, per-term df) reduce to ONE
      // row via a partial+final aggregate — the single partition receives
      // per-partition scalars only (q_checksum's shape) and broadcasts
      // back; the scoring scan and top-k heaps stay distributed.
      "q_bm25",
      // q_bm25_batch's (N, Σdl) is the same one-row corpus-statistics
      // aggregate, taken over the per-doc collapse of the distributed
      // (term, doc) tf frame; candidate scoring, the decimal per-
      // (query, doc) sums, and the TopKAgg partials all stay distributed.
      "q_bm25_batch",
      // q_retrieve_rerank's stage 1 IS q_bm25_batch, so it inherits the
      // same one-row (N, Σdl) corpus-statistics aggregate; the rerank
      // stage windows per query over candidate-scale rows, distributed.
      "q_retrieve_rerank",
      // q_rerank_recall composes q_retrieve_rerank (whose stage-1 corpus
      // statistics are the allowlisted one-row aggregate above) with the
      // exact-cosine truth side; the recall aggregate itself groups by
      // q_id and stays distributed. q_retrieval_ndcg rides the same
      // stage-1 statistics; its DCG aggregates group by q_id.
      "q_rerank_recall", "q_retrieval_ndcg",
      // q_rrf's sparse ranking IS q_bm25_batch (same one-row (N, Σdl)
      // corpus-statistics aggregate); the dense ranking, the fuse join,
      // and the fused window all stay distributed. q_rrf_recall
      // composes q_rrf, inheriting the same bounded aggregate.
      "q_rrf", "q_rrf_recall",
      // q_lm_kn's N_types is the q_lm_score vocabulary-size shape: ONE
      // count over the already-reduced bigram-type aggregate, partials
      // distributed, broadcast back into the scoring join.
      "q_lm_kn",
      // NB training's class totals (Npos, Nneg, V) are the same one-row
      // corpus-statistics aggregate as q_bm25's: the distinct count
      // dedups distributed (shuffle on token) and the final single
      // partition receives per-partition scalars, broadcast back into
      // the vocabulary-scale weights join; token counts and scoring
      // stay distributed.
      "q_quality_train", "q_quality_train_score",
      // same NB class-totals aggregate inside the trained curation funnel
      "q_curate_trained",
      // q_format_roundtrip emits one digest row per format — three
      // tableChecksum grand totals (q_checksum's partial+final shape);
      // every data-sized stage (the re-read scans, the row hashing)
      // stays distributed.
      "q_format_roundtrip",
      // q_freq_items reduces to ONE k-bounded MG map: the single
      // partition receives k-entry partial buffers, never key-table
      // rows (that bound is the sketch's whole point, pinned by the
      // partial-aggregate plan test).
      "q_freq_items",
      // q_pmi's N_uni/N_big are one-row corpus-statistics aggregates
      // over the ALREADY-REDUCED vocabulary tables (q_bm25's shape);
      // the count aggregates and the top-k heaps stay distributed.
      "q_pmi",
      // q_interleave's source DIM (≤ |sources| rows) ranks in one
      // partition by construction, and n_src is a one-row aggregate of
      // it; the corpus rank window partitions by source and the dim
      // broadcasts back — no corpus rows reach a single partition.
      "q_interleave",
      // the NB lang-id's vocabulary size is a one-row aggregate whose
      // distinct dedups distributed first (q_quality_train's class-totals
      // argument); gram counts, scoring joins, and the per-doc argmax
      // window all stay distributed.
      "q_langid_nb", "q_langid_confusion",
      // q_mix_plan's weight total is a one-row aggregate over the
      // ALREADY-REDUCED per-language table (≤ |langs| rows), broadcast
      // back — the corpus-sized token aggregate stays distributed.
      "q_mix_plan",
      // q_dsir's Tr/Tt totals are one-row aggregates over the
      // ALREADY-REDUCED bucket-model tables (≤ nBuckets rows each,
      // q_pmi's corpus-statistics shape), broadcast back with the
      // penalty; the (doc,bucket) collapse and the score join stay
      // distributed. The resampler adds only a scan-local Gumbel +
      // TakeOrdered on top of the same weights.
      "q_dsir", "q_dsir_resample",
      // PCA's eigen-solve runs on the driver over the collected
      // dim^2-cell matrix (Ivf's bounded-collect pattern); the two
      // corpus passes — the MomentsAgg reduction and the literal-
      // direction projection — stay distributed. Kept on the allowlist
      // for the moments finish (nSalt-row buffer-cell aggregate, bounded
      // whatever the corpus size).
      "q_embed_pca", "q_pca_variance", "q_pca_top2",
      // the learned-rotation recall runs the SAME driver-side PCA
      // direction solve in front of the distributed ADC pipeline — the
      // moments finish is the identical bounded nSalt-row aggregate
      "q_opq_pca_recall",
      // q_winnow_density's report is one row summed from the distributed
      // per-doc fingerprint counts (q_checksum's partial+final shape);
      // selection and the per-doc aggregate stay distributed.
      "q_winnow_density",
      // q_pack_curve's three per-capacity rows are one-row summaries of
      // the ALREADY-REDUCED per-sequence tables (the q_winnow_density
      // partial+final shape, ×3 capacities + 3 bounded oversize counts);
      // the token scan, bucketing and packing windows stay distributed.
      "q_pack_curve",
      // q_zipf_slope ranks only the TakeOrderedAndProject 200-row head
      // (bounded whatever the corpus size) and finishes with a one-row
      // OLS aggregate; the vocabulary count stays distributed.
      "q_zipf_slope",
      // q_unigram_lm's micro-nat normalizer is a one-row total over the
      // ALREADY-REDUCED piece-count table (q_pmi's corpus-statistics
      // shape), broadcast back; candidate counting, both Viterbi passes,
      // and the EM recount all stay distributed. q_unigram_prune adds
      // the candidate-stage normalizer (same shape) plus a 10-row
      // TakeOrdered head — piece-model scale, never corpus scale. The
      // other unigram consumers carry the SAME bounded normalizer: the
      // r11 round-based DP hid it behind per-round localCheckpoints
      // (plan truncation), the r12 fused DP keeps one visible lineage —
      // the exchange is piece-model-scale either way.
      "q_unigram_lm", "q_unigram_prune", "q_unigram_retrain",
      "q_unigram_fertility", "q_unigram_oov", "q_prepare_e2e",
      "q_unigram_encode", "q_unigram_kudo2")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      if (gatherByDesign(name)) None
      else {
        val p = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        if (p.contains("Exchange SinglePartition")) Some(name) else None
      }
    }
    assert(offenders.isEmpty, s"single-partition exchanges in: $offenders")
  }

  test("no query plans an unhinted CartesianProduct — every cross join in " +
      "the registry is a broadcast of a bounded side") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("decontamination broadcasts the benchmark gram set (semi join, " +
      "no corpus shuffle before the probe)") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      p.take(600))
  }

  test("embedding quantization is scan-only (no exchange before the " +
      "presentation sort)") {
    val p = plan("q_embed_quantize")
    assert("FileScan".r.findAllIn(p).length == 1)
    assert("Exchange".r.findAllIn(p).length == 1, p.take(400))
  }

  test("SQ8 serving broadcasts the query side: the flat search joins " +
      "queries via broadcast NLJ, the IVF-composed variant probes cells " +
      "via BroadcastHashJoin — the corpus side is never shuffled for a " +
      "join") {
    // flat: corpus × (5 broadcast queries) — the exactTopK convention
    val flat = plan("q_sq8_search")
    assert(flat.contains("BroadcastNestedLoopJoin"), flat.take(400))
    assert(!flat.contains("SortMergeJoin"), "flat SQ8 must not SMJ")
    // IVF-composed: codes ⋈ probes equi-joins on __cell with the probe
    // side broadcast; the corpus-scale codes never exchange for the join
    val ivf = plan("q_sq8_ivf_recall")
    assert(ivf.contains("BroadcastHashJoin"), ivf.take(400))
  }

  test("pipeline queries stay single-scan: one tokenize/score pass each") {
    // q_train_mix must not re-score per stage: exactly one parquet scan.
    assert("FileScan".r.findAllIn(plan("q_train_mix")).length == 1)
    // q_tfidf: the tokenize+tf stage is computed ONCE (cached) and feeds
    // both join branches — df comes from a partial+final hash aggregate
    // over the cache, NOT from a window over token (which would sort
    // corpus-sized skewed stopword partitions with no map-side combine).
    // The only other parquet read is the corpus count, which must read
    // ZERO columns (parquet footer counts only) — cheap at any scale.
    val p = plan("q_tfidf")
    assert(p.contains("InMemoryTableScan"), "tf stage must be cached and shared")
    assert(p.contains("ReadSchema: struct<>"), "the N scan must be columnless")
    // \b excludes WindowGroupLimit (the rank<=3 pushdown helper nodes)
    assert("Window\\b".r.findAllIn(p).length == 1,
      "only the per-doc top-3 ranking window may remain")
  }

  test("vocab coverage takes the top-20 BEFORE the rank/cumsum window " +
      "(no vocabulary-wide single-task sort)") {
    val p = plan("q_vocab_coverage")
    // top-k via per-partition heaps + one 20-row merge — not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    // exactly one window, and it sits ABOVE the limit (parents print
    // first), i.e. it consumes the 20-row result, not the vocabulary
    assert("Window\\b".r.findAllIn(p).length == 1, p.take(600))
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"), p.take(600))
  }

  test("BPE pair counts reduce map-side and top-20 via per-partition " +
      "heaps, not a global sort") {
    val p = plan("q_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(p.contains("partial"), p.take(600))
  }

  test("anomaly cells join their slot baselines by broadcast; both " +
      "aggregates combine map-side") {
    val p = plan("q_anomaly")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), p.take(600))
    assert(p.contains("partial"), p.take(600))
  }

  test("equi-depth bins window over the aggregated value table, not rows " +
      "(one running window; group totals broadcast, not a second " +
      "whole-partition window)") {
    val p = plan("q_quantile_bins")
    // rows collapse to (segment, value) counts BEFORE the decile window,
    // and the group totals arrive via a map-side-combined aggregate +
    // broadcast join (the q_weighted_median pattern) — exactly ONE
    // Window operator, no whole-partition buffering of the value table
    assert(p.contains("partial"), p.take(800))
    assert("Window\\b".r.findAllIn(p).length == 1, p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.indexOf("Window") < p.lastIndexOf("HashAggregate"), p.take(800))
  }

  test("interval join: bucket decomposition joins EQUI (hash/sort-merge " +
      "partitionable), never the nested-loop theta plan") {
    val p = plan("q_join_interval")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("fuzzy join: block census broadcasts back (anti join), pairs meet " +
      "only inside block buckets — no cartesian, no sort-merge") {
    val p = plan("q_fuzzy_join")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("table checksum reduces one scan through a partial+final aggregate") {
    val p = plan("q_checksum")
    assert("FileScan".r.findAllIn(p).length == 1, p.take(600))
    // map-side partials: only per-partition digest scalars cross the wire
    assert(p.contains("partial"), p.take(600))
  }

  test("suppression: class sizes aggregate once and broadcast back; the " +
      "table side never shuffles") {
    val p = plan("q_suppress")
    // the size lookup is a broadcast join (null-safe equality keys) and
    // the residue a broadcast one-row cross join — never a sort-merge
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), p.take(600))
    // class sizes come from a partial+final aggregate
    assert(p.contains("partial"), p.take(600))
  }

  test("PQ encoding: broadcast codebook join + partial argmin aggregate, " +
      "no cartesian") {
    val p = plan("q_pq_encode")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(p.contains("partial"), p.take(600))
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("source overlap and boilerplate removal: shared exploded stage is " +
      "cached; no cartesian pair explosion") {
    val o = plan("q_source_overlap")
    assert(!o.contains("CartesianProduct"), o.take(600))
    assert(o.contains("InMemoryTableScan"),
      "the distinct (group, shingle) stage must be computed once")
    val b = plan("q_clean_boilerplate")
    assert(!b.contains("CartesianProduct"), b.take(600))
    assert(b.contains("InMemoryTableScan"),
      "the chunk explode must feed census/anti-join/totals from one cache")
  }

  test("semantic dedup: cell-bounded pairs from one cached assignment, " +
      "no cartesian explosion") {
    val p = plan("q_semdedup")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("InMemoryTableScan"),
      "the cell assignment must feed both self-join sides and the " +
        "survivor anti-join from one cache")
  }

  test("exact-substring dedup: anchors cached once, no doc-pair join " +
      "anywhere in span or removal plans") {
    val p = plan("q_dedup_substring")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("InMemoryTableScan"),
      "the anchor stage must feed census and semi-join from one cache")
    // the dup census gate is a semi join on the shingle, never an inner
    // doc×doc expansion
    assert(p.contains("LeftSemi"), p.take(600))
    val c = plan("q_dedup_substring_clean")
    assert(!c.contains("CartesianProduct"), c.take(600))
    assert(c.contains("LeftSemi") && c.contains("LeftAnti"), c.take(600))
  }

  test("trained semantic dedup: cell-bounded pairs from one cached " +
      "assignment; census broadcasts back") {
    val p = plan("q_semdedup_trained")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("InMemoryTableScan"),
      "the assignment must feed census/self-join/anti-join from one cache")
    assert(p.contains("BroadcastHashJoin"),
      "the subsplit census must broadcast, not shuffle the corpus")
  }

  test("trained classifier serving broadcasts the weights table onto the " +
      "token scan") {
    val p = plan("q_quality_train_score")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("BroadcastHashJoin"),
      "vocabulary-scale weights must broadcast-join the corpus tokens")
    val c = plan("q_curate_trained")
    assert(!c.contains("CartesianProduct"), c.take(600))
    assert(c.contains("BroadcastHashJoin"), c.take(600))
  }

  test("quality classifier is one scan into a partial+final aggregate") {
    val p = plan("q_quality_classifier")
    assert("FileScan".r.findAllIn(p).length == 1, p.take(400))
    assert(p.contains("partial"), p.take(400))
    // generate (token explode) + hash aggregate + presentation sort only:
    // the margin must combine map-side, so exactly two exchanges (the
    // doc_id aggregate shuffle and the orderBy)
    assert("Exchange".r.findAllIn(p).length <= 3, p.take(600))
  }

  test("PII redaction is a codegen'd scan-local projection — one scan, " +
      "one presentation exchange") {
    val p = plan("q_pii_redact")
    assert("FileScan".r.findAllIn(p).length == 1, p.take(400))
    assert("Exchange".r.findAllIn(p).length == 1,
      "seed + count + redact must all ride the scan projection; only the " +
        "orderBy may exchange")
  }

  test("URL host stats: one scan through explode into a partial+final " +
      "distinct aggregate") {
    val p = plan("q_url_stats")
    assert("FileScan".r.findAllIn(p).length == 1, p.take(400))
    assert(p.contains("Generate"), "URL extraction must explode scan-side")
    assert(p.contains("partial"),
      "the host aggregate must combine map-side before the shuffle")
  }

  test("HTML extraction and line filtering are codegen'd scan-local " +
      "projections — one scan, one presentation exchange each") {
    for (name <- Seq("q_strip_html", "q_line_filter")) {
      val p = plan(name)
      assert("FileScan".r.findAllIn(p).length == 1, s"$name: ${p.take(400)}")
      assert("Exchange".r.findAllIn(p).length == 1,
        s"$name: the regex/lambda passes must fuse into the scan " +
          s"projection; only the orderBy may exchange — ${p.take(400)}")
    }
  }

  test("inverted index: one tokenize scan, map-side-combined (term,doc) " +
      "aggregate, vocabulary stats broadcast back") {
    val p = plan("q_inverted_index")
    // both consumers (postings window, term stats) must read the CACHED tf
    // stage — two InMemoryTableScans, never a re-tokenized second pipeline
    assert("InMemoryTableScan".r.findAllIn(p).length == 2,
      "the persisted tf stage must feed both branches: " + p.take(600))
    assert(p.contains("partial"), p.take(400))
    assert(p.contains("BroadcastHashJoin"),
      "term stats are vocabulary-sized and must broadcast: " + p.take(400))
  }

  test("split audit and interleave stay off the scale-killer list: no " +
      "cartesian product, shared edge stage cached, corpus windows " +
      "partitioned") {
    val a = plan("q_split_audit")
    assert(!a.contains("CartesianProduct"), a.take(600))
    assert(a.contains("InMemoryTableScan"),
      "the near-dup edge stage must be computed once and cached: " + a.take(400))
    val i = plan("q_interleave")
    assert(!i.contains("CartesianProduct"), i.take(600))
    // the per-source rank is a partitioned window; the only
    // single-partition exchanges feed the source-count dim (20 rows) and
    // the one-row n_src aggregate, never the corpus
    assert(i.contains("Window"), i.take(400))
    assert("BroadcastExchange".r.findAllIn(i).length >= 2,
      "dim and n_src must broadcast back: " + i.take(600))
  }

  test("semantic decontamination: the benchmark slice broadcasts across " +
      "one corpus scan; the argmax combines map-side") {
    val p = plan("q_decontaminate_semantic")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the eval-suite side is tiny and must broadcast: " + p.take(400))
    assert(p.contains("partial"),
      "the per-vector argmax must combine before the shuffle: " + p.take(400))
    assert("FileScan".r.findAllIn(p).length == 2,
      "corpus + benchmark scans only: " + p.take(400))
  }

  test("BPE fertility: the encoded vocabulary broadcasts into the corpus " +
      "word stream; the per-lang aggregate combines map-side") {
    val p = plan("q_bpe_fertility")
    assert(p.contains("BroadcastHashJoin"),
      "the vocab side is vocabulary-scale and must broadcast: " + p.take(400))
    assert(p.contains("partial"), p.take(400))
  }

  test("perplexity bucketing runs ONE window pass over the per-doc score " +
      "table (document-scale), never the bigram explode") {
    val p = plan("q_ppl_bucket")
    assert("Window".r.findAllIn(p).length == 1, p.take(600))
    assert(p.contains("ntile"), p.take(400))
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("hard-negative mining broadcasts the query set over one corpus " +
      "scan — the dup gate adds a Filter, never a second pass") {
    val p = plan("q_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the small query side must broadcast across the corpus scan")
    assert("FileScan".r.findAllIn(p).length == 2,
      "corpus + query-subset scans only — the cosine filter must not " +
        "re-read the table")
  }

  test("token-budget mix: one scan, one window pass partitioned by " +
      "language — the running total never funnels to one partition") {
    val p = plan("q_token_budget")
    assert("FileScan".r.findAllIn(p).length == 1, p.take(400))
    assert("Window".r.findAllIn(p).length == 1, p.take(600))
    assert(!p.contains("Exchange SinglePartition"), p.take(600))
  }

  test("deterministic sampling pushes nothing but stays codegen'd scan-local") {
    val p = plan("q_sample_hash")
    assert("FileScan".r.findAllIn(p).length == 1)
    // the md5 gate is a scan-local Filter, not a post-shuffle one: the only
    // Exchange is the final presentation orderBy
    assert("Exchange".r.findAllIn(p).length == 1, p.take(400))
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // Catalyst's runtime-filter rule ships a bloom filter built from the
    // selective (filtered) side to the fact scan — the 100 TB pre-join
    // row-skip. Thresholds drop to zero so the rule fires at test scale.
    val s = spark
    // creationSideThreshold is a MAX (small build side), the application
    // scan threshold a MIN (big probe side): widen both so the rule fires
    // on fixture-sized tables.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // the rule declines when either side is broadcastable (a broadcast
      // join needs no bloom filter) — turn auto-broadcast off so the
      // fixture-sized join models the 100 TB shuffle-join case.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val li = queries.Q.t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val o = queries.Q.t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey")
      val joined = li.hint("merge")
        .join(o, li("l_orderkey") === o("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter") ||
        p.contains("might_contain"), p.take(800))
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    // The 100 TB hot-key story: one key holding most of the rows must not
    // serialize the join into one straggler task — AQE's skew handling
    // splits that partition at runtime. Thresholds drop to fixture scale.
    import spark.implicits._
    val s = spark
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "16")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val big = ((1 to 50000).map(i => (1L, s"pad-$i-" + "x" * 40)) ++
        (1 to 500).map(i => ((i % 50 + 2).toLong, s"v$i"))).toDF("k", "v")
      val small = (1 to 60).map(i => (i.toLong, s"n$i")).toDF("k", "name")
      val j = big.join(small, "k")
      j.collect() // finalize THIS QueryExecution's adaptive plan
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(600))
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("bucketed tables join without a shuffle") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val s = spark
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val li = queries.Q.t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
    val o = queries.Q.t(s, dir, "orders").select("o_orderkey", "o_totalprice")
    Scale.writeBucketed(li, "li_b", "l_orderkey", 4)
    Scale.writeBucketed(o, "o_b", "o_orderkey", 4)
    val joined = Scale.readBucketed(s, "li_b")
      .join(Scale.readBucketed(s, "o_b"), col("l_orderkey") === col("o_orderkey"))
      .hint("merge")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle:\n" + p.take(1200))
    assert(joined.count() > 0)
    s.sql("DROP TABLE IF EXISTS li_b"); s.sql("DROP TABLE IF EXISTS o_b")
  }
}
