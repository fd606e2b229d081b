package graft

import org.apache.spark.sql.functions._

/** End-to-end checks of the Curate CLI (the curation twin of Anonymize):
  * config round trip, funnel monotonicity, split determinism, and the
  * strict-flag policy shared with the Anonymize dispatcher. */
class CurateSpec extends SparkSpec {

  private val data = "/root/testdata/sf0.001"

  test("configGen → run: YAML round-trips the default config, the funnel " +
      "is monotone, report + train/val parquet land") {
    val out = java.nio.file.Files.createTempDirectory("curate").toString
    Curate.cli(spark, Array("--configGen", "--data", data, "--out", out))
    assert(Curate.readConfig(s"$out/${Curate.ConfigFile}") ==
      Curate.DefaultConfig)
    Curate.cli(spark, Array("--run", "--data", data, "--out", out))
    val report = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/${Curate.ReportFile}"))
    assert(report.contains("\"funnel\"") && report.contains("\"perLang\""))
    val tr = spark.read.parquet(s"$out/train")
    val va = spark.read.parquet(s"$out/val")
    val docs = Tables.load(spark, data, "documents")
    assert(tr.count() > 0, "default config must keep a non-trivial corpus")
    assert(tr.count() + va.count() <= docs.count())
    // curated outputs carry the source schema (no helper columns leak)
    assert(tr.columns.sorted.toSeq == docs.columns.sorted.toSeq)
  }

  test("shards > 0 writes the train set as a shuffled shard layout: same " +
      "docs as the flat run, hive shard dirs, contiguous positions") {
    val flat = java.nio.file.Files.createTempDirectory("curate_flat").toString
    val shrd = java.nio.file.Files.createTempDirectory("curate_shrd").toString
    val c = Curate.DefaultConfig.copy(dedup = "exact")
    Curate.writeConfig(s"$flat/${Curate.ConfigFile}", c)
    Curate.cli(spark, Array("--run", "--data", data, "--out", flat))
    Curate.writeConfig(s"$shrd/${Curate.ConfigFile}", c.copy(shards = 4))
    Curate.cli(spark, Array("--run", "--data", data, "--out", shrd))
    // identical curated membership — sharding is pure layout
    val flatIds = spark.read.parquet(s"$flat/train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sharded = spark.read.parquet(s"$shrd/train")
    val rows = sharded.select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == flatIds)
    // hive-partitioned shard dirs match the shard ids, positions
    // contiguous per shard
    val dirs = new java.io.File(s"$shrd/train").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    val shardVals = rows.map(_._2).toSet
    assert(dirs == shardVals.map(s => s"shard=$s"))
    assert(shardVals.subsetOf((0 until 4).toSet) && shardVals.size >= 2)
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong),
        s"shard $s positions not contiguous")
    }
    // a pre-shards config (no `shards` key) still reads, keeping the
    // flat layout
    val legacy = java.nio.file.Files.createTempFile("curate_legacy", ".yaml")
    java.nio.file.Files.writeString(legacy,
      """version: 1
        |minQuality: 1.0
        |dedup: exact
        |jaccard: 0.5
        |tokensPerLang: 0
        |valThresholdHex: "1999"
        |""".stripMargin)
    assert(Curate.readConfig(legacy.toString).shards == 0)
  }

  test("fairGate stage: keeps floor(f·(n−1))+1 per source after the " +
      "quality gate; off by default; config round-trips the fraction") {
    val docs = Tables.load(spark, data, "documents")
      .filter(col("text").isNotNull).limit(40)
    val base = Curate.DefaultConfig.copy(dedup = "none", minQuality = 0.0)
    val off = Curate.run(docs, base)
    val on = Curate.run(docs, base.copy(fairGateFrac = 0.5))
    val offF = off.funnel.toMap
    val onF = on.funnel.toMap
    assert(offF("afterFairGate") == offF("afterQuality"),
      "frac 0.0 must be a no-op")
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getLong(1).toInt)
    val want = perSource.map(n => math.floor(0.5 * (n - 1)).toInt + 1).sum
    assert(onF("afterFairGate") == want.toLong,
      s"per-source keep counts: got ${onF("afterFairGate")}, want $want")
    assert(onF("afterFairGate") <= onF("afterQuality"))
    // config io round-trip
    val p = java.nio.file.Files.createTempFile("curate_fair", ".yaml")
    Curate.writeConfig(p.toString, base.copy(fairGateFrac = 0.25))
    assert(Curate.readConfig(p.toString).fairGateFrac == 0.25)
  }

  test("stage-0 cleaning: HTML is stripped and junk lines dropped before " +
      "the gate; docs cleaned to nothing leave the funnel at afterClean") {
    val docs = Tables.load(spark, data, "documents")
      .filter(col("text").isNotNull).limit(20)
      // wrap every doc in an HTML shell with a banned + short junk line;
      // the real text becomes one long terminal-punctuated line
      .withColumn("text", concat(
        lit("<html><body><script>var x = 1;</script>"),
        lit("<p>Please enable javascript to continue.</p>\n"),
        lit("<p>Too short.</p>\n<p>"), col("text"),
        lit(" and that is the end.</p></body></html>")))
    val c = Curate.DefaultConfig.copy(
      dedup = "none", stripHtml = true, lineMinWords = 5)
    val r = Curate.run(docs, c)
    val funnel = r.funnel.toMap
    assert(funnel("afterClean") == funnel("input"),
      "every doc keeps its long closing sentence, so none dies at clean")
    val texts = r.train.unionByName(r.`val`)
      .select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach { t =>
      assert(!t.contains("<") && !t.contains("javascript") &&
        !t.contains("Too short"), t.take(120))
      assert(t.endsWith(" and that is the end."))
    }
    // a doc that cleans to NOTHING (only junk lines) exits at afterClean
    val junkOnly = docs.limit(5).withColumn("text",
      lit("<p>Please enable javascript now.</p>\n<p>Short.</p>"))
    val r2 = Curate.run(junkOnly, c)
    val f2 = r2.funnel.toMap
    assert(f2("input") == 5L && f2("afterClean") == 0L)
    // cleaning off (default config): afterClean mirrors input — the
    // pre-cleaning funnel shape is unchanged for existing configs
    assert(Curate.run(docs.limit(5), Curate.DefaultConfig.copy(dedup = "none"))
      .funnel.toMap.apply("afterClean") == 5L)
    // legacy YAML without the cleaning keys reads them as off
    val legacy = java.nio.file.Files.createTempFile("curate_clean", ".yaml")
    java.nio.file.Files.writeString(legacy,
      """version: 1
        |minQuality: 1.0
        |dedup: exact
        |jaccard: 0.5
        |tokensPerLang: 0
        |valThresholdHex: "1999"
        |""".stripMargin)
    val lc = Curate.readConfig(legacy.toString)
    assert(!lc.stripHtml && lc.lineMinWords == 0)
  }

  test("assignLang stage: NULL langs filled from the labeled rows' model " +
      "before per-lang stages, funnel + report carry the fill count, " +
      "legacy configs keep the stage off") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "alpha alpha alpha beta beta alpha alpha beta alpha.", "aa"),
        Row(2L, "alpha beta alpha beta alpha beta beta alpha beta.", "aa"),
        Row(3L, "zulu zulu yankee yankee zulu zulu yankee zulu.", "zz"),
        Row(4L, "yankee zulu yankee zulu zulu zulu yankee yankee.", "zz"),
        Row(5L, "beta alpha beta alpha alpha beta alpha alpha.", null),
        Row(6L, "zulu yankee zulu zulu yankee zulu zulu yankee.", null)),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    val c = Curate.DefaultConfig.copy(minQuality = 0.0, dedup = "none",
      valThresholdHex = "0000", assignLang = true)
    val r = Curate.run(df, c)
    assert(r.funnel.toMap.apply("langAssigned") == 2L)
    val langs = r.train.select("doc_id", "lang").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(langs(5L) == "aa" && langs(6L) == "zz", s"got $langs")
    // the per-lang report groups the filled rows under their model lang —
    // the stage ran BEFORE the per-language accounting
    assert(r.perLang.map(p => (p._1, p._2)).toMap ==
      Map("aa" -> 3L, "zz" -> 3L))
    // config io round-trips the knob; the report names it
    val out = java.nio.file.Files.createTempDirectory("curate_al").toString
    Curate.writeConfig(s"$out/${Curate.ConfigFile}", c)
    assert(Curate.readConfig(s"$out/${Curate.ConfigFile}") == c)
    Curate.writeReport(s"$out/r.json", c, r)
    val rep = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/r.json"))
    assert(rep.contains("\"assignLang\":true") &&
      rep.contains("\"langAssigned\":2"))
    // a pre-assignment config (no key) keeps the stage off
    val legacy = java.nio.file.Files.createTempFile("curate_noal", ".yaml")
    java.nio.file.Files.writeString(legacy,
      """version: 1
        |minQuality: 1.0
        |dedup: exact
        |jaccard: 0.5
        |tokensPerLang: 0
        |valThresholdHex: "1999"
        |""".stripMargin)
    assert(!Curate.readConfig(legacy.toString).assignLang)
  }

  test("dsir stage: target-vocabulary docs survive the weight threshold, " +
      "off-distribution docs drop, funnel + config round-trip carry it") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        // en target: fruit vocabulary
        Row(1L, "apple banana cherry apple banana apple cherry apple.", "en"),
        Row(2L, "banana apple apple cherry apple banana banana apple.", "en"),
        // target-like raw doc: should clear a 0.0 threshold easily
        Row(3L, "apple banana apple cherry banana apple apple banana.", "fr"),
        // disjoint vocabulary: strongly negative weight, dropped
        Row(4L, "zulu yankee xray whiskey victor uniform tango sierra.", "fr")),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    // derive the threshold from the weights themselves (at toy counts the
    // Laplace smoothing shifts all weights negative — the RANKING is the
    // stable signal, exactly why the operator reports weights and the
    // config takes a threshold read off that report)
    val wts = graft.operators.Curation.dsirWeights(df, "doc_id", "text",
        col("lang") === "en", 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(wts(3L) > wts(4L),
      s"target-vocab doc must outweigh the disjoint one: $wts")
    val c = Curate.DefaultConfig.copy(minQuality = 0.0, dedup = "none",
      valThresholdHex = "0000", dsirTargetLang = "en",
      dsirMinLogW = (wts(3L) + wts(4L)) / 2)
    val r = Curate.run(df, c)
    val kept = r.train.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L), s"kept $kept")
    assert(r.funnel.toMap.apply("afterDsir") == 3L)
    // config io round-trips the knobs; legacy configs keep the stage off
    val p = java.nio.file.Files.createTempFile("curate_dsir", ".yaml").toString
    Curate.writeConfig(p, c)
    assert(Curate.readConfig(p) == c)
    assert(Curate.readConfig(p).dsirTargetLang == "en")
  }

  test("--audit on a curated output: the leak-free run reports zero leaky " +
      "val docs; a deliberately contaminated val reports them") {
    val out = java.nio.file.Files.createTempDirectory("curate_audit").toString
    Curate.writeConfig(s"$out/${Curate.ConfigFile}",
      Curate.DefaultConfig.copy(dedup = "fuzzy"))
    Curate.cli(spark, Array("--run", "--data", data, "--out", out))
    Curate.cli(spark, Array("--audit", "--data", out, "--out", out))
    val report = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/curate.audit.json"))
    assert(report.contains("\"leakyValDocs\":0"), report)
    // contaminate: clone a train doc into val under a fresh id → the
    // audit must surface exactly that leak
    val train = spark.read.parquet(s"$out/train")
    val one = train.orderBy("doc_id").limit(1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    spark.read.parquet(s"$out/val").unionByName(one)
      .write.mode("overwrite").parquet(s"$out/val2")
    val dirty = java.nio.file.Files.createTempDirectory("curate_dirty").toString
    // lay out train/ + val/ the way --audit expects
    train.write.parquet(s"$dirty/train")
    spark.read.parquet(s"$out/val2").write.parquet(s"$dirty/val")
    Curate.cli(spark, Array("--audit", "--data", dirty, "--out", dirty))
    val dirtyReport = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dirty/curate.audit.json"))
    assert(dirtyReport.contains("\"leakyValDocs\":1"), dirtyReport)
    // flag policy: --jaccard outside --audit fails loudly
    intercept[RuntimeException] {
      Curate.cli(spark, Array("--run", "--data", data, "--out", out,
        "--jaccard", "0.5"))
    }
  }

  test("dedup modes nest: fuzzy ⊆ exact ⊆ none (exact dups are jaccard-1 " +
      "near-dups, so each mode can only remove more)") {
    val docs = Tables.load(spark, data, "documents")
    def kept(mode: String): Long =
      Curate.run(docs, Curate.DefaultConfig.copy(dedup = mode))
        .funnel.toMap.apply("afterDedup")
    val (n, e, f) = (kept("none"), kept("exact"), kept("fuzzy"))
    assert(n >= e && e >= f, s"none=$n exact=$e fuzzy=$f")
    assert(f < n, "fixture contains near-dups; fuzzy must remove some")
  }

  test("token budget caps each language's admitted tokens; split is " +
      "deterministic across runs") {
    val docs = Tables.load(spark, data, "documents")
    val c = Curate.DefaultConfig.copy(dedup = "none", tokensPerLang = 800L)
    val r1 = Curate.run(docs, c)
    val langTok = r1.train.unionByName(r1.`val`)
      .groupBy("lang")
      .agg(sum(graft.operators.TextAnalysis.tokenCountWs(col("text"))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langTok.values.forall(_ <= 800L), langTok.toString)
    val r2 = Curate.run(docs, c)
    assert(r1.`val`.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      r2.`val`.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq,
      "the md5 split gate is deterministic — reruns agree doc-for-doc")
  }

  test("delta mode: corpus near-dups are removed, genuinely new docs " +
      "survive, and none-mode keeps the clones") {
    val docs = Tables.load(spark, data, "documents")
      .filter(col("text").isNotNull)
    // quality-passing corpus docs so the clone side cannot die at the gate
    val q = graft.operators.TextAnalysis.qualityScore(col("text"))
    val good = docs.filter(q >= 1.0).limit(30).cache()
    // clones of corpus texts under fresh ids + clearly-new synthetic docs
    val clones = good.select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars"))
    val fresh = spark.range(20).select(
      (col("id") + 2000000L).as("doc_id"),
      // short tokens: the quality gate needs 20..10000 tokens AND mean
      // token length in 3.0..8.0, so "nv<i><id>" stays inside the band
      concat_ws(" ", (0 until 40).map(i =>
        concat(lit(s"nv$i"), col("id"))): _*).as("text"),
      lit("xx").as("lang"), lit("synthetic").as("source"),
      lit(0L).as("n_chars"))
    val delta = clones.unionByName(fresh)
    val c = Curate.DefaultConfig
    val r = Curate.runDelta(docs, delta, c)
    val keptIds = r.train.unionByName(r.`val`)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.forall(_ >= 2000000L),
      s"every corpus clone must be removed, kept: ${keptIds.filter(_ < 2000000L)}")
    assert(keptIds.size == 20, "every genuinely-new doc must survive")
    // dedup=none declares the risk away: clones pass straight through
    val rNone = Curate.runDelta(docs, delta, c.copy(dedup = "none"))
    assert(rNone.funnel.toMap.apply("afterCorpusDedup") >
      r.funnel.toMap.apply("afterCorpusDedup"))
    good.unpersist()
  }

  test("robustness: empty corpus and empty delta produce empty-but-valid " +
      "funnels in every dedup mode (no crash, no phantom rows)") {
    val docs = Tables.load(spark, data, "documents")
    val empty = docs.filter(lit(false))
    for (mode <- Seq("none", "exact", "fuzzy")) {
      val c = Curate.DefaultConfig.copy(dedup = mode)
      val r = Curate.run(empty, c)
      assert(r.funnel.forall(_._2 == 0L), s"$mode: ${r.funnel}")
      assert(r.train.count() == 0 && r.`val`.count() == 0)
      val rd = Curate.runDelta(docs, empty, c)
      assert(rd.funnel.forall(_._2 == 0L), s"$mode delta: ${rd.funnel}")
      // empty corpus: the delta passes corpus-dedup untouched
      val rc = Curate.runDelta(empty, docs.limit(5), c)
      assert(rc.funnel.toMap.apply("deltaInput") == 5L)
    }
  }

  test("strict flags: unknown flags, missing mode, and double modes fail " +
      "loudly instead of running a half-armed pipeline") {
    val out = java.nio.file.Files.createTempDirectory("curate").toString
    intercept[RuntimeException] {
      Curate.cli(spark, Array("--run", "--data", data, "--out", out,
        "--jaccard", "0.5"))
    }
    intercept[RuntimeException] {
      Curate.cli(spark, Array("--data", data, "--out", out))
    }
    intercept[RuntimeException] {
      Curate.cli(spark, Array("--configGen", "--run", "--data", data,
        "--out", out))
    }
    intercept[RuntimeException] {
      Curate.cli(spark, Array("--configGen", "--data", data, "--out", out,
        "--delta", data))
    }
    // the accepted-but-ignored policy covers --audit too: --delta is
    // --run-only and --config is never read in audit mode
    intercept[RuntimeException] {
      Curate.cli(spark, Array("--audit", "--data", data, "--out", out,
        "--delta", data))
    }
    intercept[RuntimeException] {
      Curate.cli(spark, Array("--audit", "--data", data, "--out", out,
        "--config", s"$out/c.yaml"))
    }
  }

  test("stage registry: run/runDelta funnels enumerate exactly the " +
      "declared stage keys in order, full-run-only stages have no delta " +
      "path, declared streaming twins resolve to real Streams members, " +
      "and the report carries per-stage enablement") {
    // all-knobs-on config so every declared stage actually executes
    // (the decontaminate stage needs a bench suite on disk — the src19
    // held-out convention q_curate_e2e uses)
    val benchDir = java.nio.file.Files
      .createTempDirectory("curate_bench").toString
    Tables.load(spark, data, "documents")
      .filter(col("source") === "src19")
      .write.mode("overwrite").parquet(s"$benchDir/bench")
    val c = Curate.CurateConfig(1, 0.1, "fuzzy", 0.5, 1000000L, "1999",
      stripHtml = true, lineMinWords = 1, assignLang = true,
      dsirTargetLang = "en", dsirMinLogW = -1e9, fairGateFrac = 0.9,
      decontBenchPath = s"$benchDir/bench")
    val docs = Tables.load(spark, data, "documents")
    val full = Curate.run(docs, c)
    assert(full.funnel.map(_._1) ==
      Curate.StageRegistry.flatMap(_.funnelKeys),
      "full-run funnel must enumerate the registry's declared keys")
    val delta = Curate.runDelta(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), c)
    assert(delta.funnel.map(_._1) ==
      Curate.StageRegistry.flatMap(_.deltaFunnelKeys),
      "delta funnel must enumerate the registry's declared delta keys")
    // full-run-only ⇔ absent from the delta path
    Curate.StageRegistry.foreach(s =>
      assert(s.fullRunOnly == s.deltaFunnelKeys.isEmpty,
        s"stage ${s.name}: fullRunOnly=${s.fullRunOnly} but " +
          s"deltaKeys=${s.deltaFunnelKeys}"))
    // every declared streaming twin is a real Streams member
    val streamsMembers = graft.streaming.Streams.getClass
      .getMethods.map(_.getName).toSet
    Curate.StageRegistry.flatMap(_.streamingTwin).foreach(t =>
      assert(streamsMembers(t), s"streaming twin $t not in Streams"))
    // every registry stage has a deterministic enablement answer, and
    // the all-on config enables everything
    Curate.StageRegistry.foreach(s =>
      assert(Curate.stageEnabled(s, c), s"stage ${s.name} not enabled"))
    assert(!Curate.stageEnabled(
      Curate.StageRegistry.find(_.name == "dsir").get,
      Curate.DefaultConfig))
    // the written report surfaces the registry
    val out = java.nio.file.Files.createTempDirectory("curate_reg").toString
    Curate.writeReport(s"$out/r.json", c, full)
    val report = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/r.json"))
    assert(report.contains("\"stages\""))
    Curate.StageRegistry.foreach(s =>
      assert(report.contains(s""""stage": "${s.name}"""") ||
        report.contains(s""""stage":"${s.name}""""), s"missing ${s.name}"))
  }

  test("decontaminate stage: the planted n-gram leak drops, the planted " +
      "paraphrase drops only under the semantic screen, delta path " +
      "screens identically, config round-trips, legacy configs stay off") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def docsDf(rows: Seq[Row]) = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    val bench = docsDf(Seq(
      Row(100L, "alpha beta gamma delta epsilon question answer.", "en")))
    // doc 2 shares the 4-gram "alpha beta gamma delta"; doc 3 is a
    // paraphrase (no shared 4-gram, near-identical embedding)
    val docs = docsDf(Seq(
      Row(1L, "one clean document about something else entirely here.", "en"),
      Row(2L, "prefix words alpha beta gamma delta suffix words here.", "en"),
      Row(3L, "paraphrased wording of that benchmark question answer.", "en")))
    val dir = java.nio.file.Files.createTempDirectory("curate_dec").toString
    bench.write.mode("overwrite").parquet(s"$dir/bench")
    // embeddings: doc 3 ≈ bench 100 (cos 1.0), docs 1-2 orthogonal
    val emb = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq(1.0, 0.0, 0.0, 0.0)), Row(2L, Seq(0.0, 1.0, 0.0, 0.0)),
        Row(3L, Seq(0.0, 0.0, 1.0, 0.0)), Row(100L, Seq(0.0, 0.0, 1.0, 0.0))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType)))))
    emb.write.mode("overwrite").parquet(s"$dir/emb")
    val base = Curate.DefaultConfig.copy(minQuality = 0.0, dedup = "none",
      valThresholdHex = "0000")
    // off: all three docs survive to the split
    val off = Curate.run(docs, base)
    assert(off.funnel.toMap.apply("afterDecontaminate") == 3L)
    // n-gram screen only: doc 2 drops, the paraphrase survives
    val cN = base.copy(decontBenchPath = s"$dir/bench")
    val rN = Curate.run(docs, cN)
    assert(rN.funnel.toMap.apply("afterDecontaminate") == 2L)
    assert(rN.train.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
    // + semantic screen: the paraphrase drops too
    val cS = cN.copy(decontEmbPath = s"$dir/emb", decontSemanticBar = 0.9)
    val rS = Curate.run(docs, cS)
    assert(rS.funnel.toMap.apply("afterDecontaminate") == 1L)
    assert(rS.train.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L))
    // delta path: same screen, same survivors; the corpus-dedup count is
    // its own action when the screen is on
    val empty = docs.limit(0)
    val dS = Curate.runDelta(empty, docs, cS)
    assert(dS.funnel.toMap.apply("afterCorpusDedup") == 3L)
    assert(dS.funnel.toMap.apply("afterDecontaminate") == 1L)
    assert(dS.train.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L))
    // config io: knobs round-trip; legacy configs (no keys) stay off;
    // a half-configured semantic screen fails loudly
    val p = java.nio.file.Files.createTempFile("curate_decont", ".yaml")
    Curate.writeConfig(p.toString, cS)
    assert(Curate.readConfig(p.toString) == cS)
    val legacy = java.nio.file.Files.createTempFile("curate_nodec", ".yaml")
    java.nio.file.Files.writeString(legacy,
      """version: 1
        |minQuality: 1.0
        |dedup: exact
        |jaccard: 0.5
        |tokensPerLang: 0
        |valThresholdHex: "1999"
        |""".stripMargin)
    val lc = Curate.readConfig(legacy.toString)
    assert(lc.decontBenchPath.isEmpty && lc.decontNgram == 4)
    intercept[IllegalArgumentException] {
      base.copy(decontBenchPath = s"$dir/bench", decontSemanticBar = 0.9)
    }
    intercept[IllegalArgumentException] {
      base.copy(decontEmbPath = s"$dir/emb")
    }
  }

  test("soft dedup: every doc kept, weight = 1/|cluster| with mass " +
      "conserved, clusters never straddle the split, weights flow to the " +
      "outputs, delta path rejects the mode") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // three near-identical docs (one cluster) + two unique docs
    val dup = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, dup + " one", "en"),
        Row(2L, dup + " two", "en"),
        Row(3L, dup + " three", "en"),
        Row(4L, "a completely different document about maritime navigation systems.", "en"),
        Row(5L, "another unrelated text concerning alpine geology and rock strata.", "en")),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    val c = Curate.DefaultConfig.copy(minQuality = 0.0, dedup = "soft",
      valThresholdHex = "8000") // ~50% val: exercises both sides
    val r = Curate.run(docs, c)
    val f = r.funnel.toMap
    assert(f("afterDedup") == 5L, "soft dedup keeps every doc")
    assert(f("train") + f("val") == 5L)
    val out = r.train.withColumn("split", lit("t"))
      .unionByName(r.`val`.withColumn("split", lit("v")))
      .select("doc_id", "weight", "split").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getString(2)))
    val w = out.map(x => x._1 -> x._2).toMap
    assert(w(1L) == 0.333333 && w(2L) == 0.333333 && w(3L) == 0.333333,
      s"cluster of 3 weighs 1/3 each: $w")
    assert(w(4L) == 1.0 && w(5L) == 1.0, s"singletons weigh 1: $w")
    // mass conservation: Σ weights = #clusters (within rounding)
    assert(math.abs(out.map(_._2).sum - 3.0) < 1e-4)
    // the cluster gates as ONE unit: all three dupes on the same side
    assert(out.filter(x => Set(1L, 2L, 3L)(x._1)).map(_._3).toSet.size == 1,
      s"cluster straddles the split: ${out.mkString(",")}")
    // weights are consumable downstream: repeatUpsample over the train
    // output emits ⌊w⌋/⌈w⌉ copies per doc (the packing composition)
    val up = graft.operators.Sampling.repeatUpsample(
      r.train.unionByName(r.`val`), "doc_id", "s15", col("weight"))
    assert(up.count() >= 2L && up.count() <= 5L)
    // delta path refuses the mode (corpus-statistics weights)
    intercept[IllegalArgumentException] {
      Curate.runDelta(docs.limit(0), docs, c)
    }
    // an INPUT corpus that happens to carry a __cluster column must not
    // hijack the split key of the non-soft modes: a constant stray
    // column would put EVERY doc on one side if it were used as the key,
    // so the poisoned run's split must equal the clean run's exactly
    def trainIds(r: Curate.Curated) =
      r.train.select("doc_id").collect().map(_.getLong(0)).toSet
    val cNone = c.copy(dedup = "none", valThresholdHex = "8000")
    val clean = Curate.run(docs, cNone)
    val pois = Curate.run(docs.withColumn("__cluster", lit(999L)), cNone)
    assert(trainIds(pois) == trainIds(clean),
      "a stray __cluster input column must not move the split")
  }

  test("bandsAuto: the probe picks the argmin-cost banding meeting the " +
      "target (fewest bands, by the candidate-subset monotonicity), the " +
      "report and band_probe.json carry the choice, and the delta path " +
      "rejects the mode") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // planted fixture: two EXACT-dup clusters (identical signatures are
    // caught by EVERY banding — recall 1.0 across the curve by the
    // band-refinement subset argument) among unique filler docs
    val dupA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val dupB = "one two three four five six seven eight nine ten eleven twelve"
    val filler = (10L to 29L).map(i => Row(i,
      s"unique document number $i about subject $i with body text ${i * 7} " +
        s"and trailing content ${i * 13} end", "en"))
    val rows = Seq(Row(1L, dupA, "en"), Row(2L, dupA, "en"),
      Row(3L, dupB, "en"), Row(4L, dupB, "en")) ++ filler
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    val probe = Curate.probeBands(docs, jaccard = 0.5, target = 0.9)
    // curve laws: candidates(2) ⊆ candidates(4) ⊆ candidates(8) (band
    // boundaries refine), so recall and cost are monotone in bands
    val curve = probe.curve.sortBy(_._1)
    assert(curve.map(_._1) == Seq(2, 4, 8))
    assert(curve.map(_._2) == curve.map(_._2).sorted,
      s"recall must be monotone in bands: $curve")
    assert(curve.map(_._3) == curve.map(_._3).sorted,
      s"candidate cost must be monotone in bands: $curve")
    assert(curve.forall(_._2 == 1.0),
      s"exact dups are caught by every banding: $curve")
    // all meet the target -> argmin cost, ties -> fewest bands = 2
    assert(probe.chosen == 2, s"probe must pick 2, got $probe")
    // choice law holds on the probe's own curve: smallest banding
    // meeting the target (cost is monotone, so fewest-meeting = argmin)
    val meeting = curve.filter(_._2 >= probe.target)
    assert(probe.chosen == meeting.minBy(c => (c._3, c._1))._1)
    // e2e: the run report + evidence file carry the choice
    val out = java.nio.file.Files.createTempDirectory("curate_bands").toString
    val c = Curate.DefaultConfig.copy(minQuality = 0.0, dedup = "fuzzy",
      bandsAuto = true, bandTarget = 0.9)
    Curate.writeConfig(s"$out/${Curate.ConfigFile}", c)
    // config round-trips the two probe knobs
    assert(Curate.readConfig(s"$out/${Curate.ConfigFile}") == c)
    docs.write.mode("overwrite").parquet(s"$out/in/documents.parquet")
    Curate.cli(spark, Array("--run", "--data", s"$out/in", "--out", out))
    val report = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/${Curate.ReportFile}"))
    assert(report.contains("\"bandProbe\":{\"chosen\":2"), report)
    val evidence = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/band_probe.json"))
    assert(evidence.contains("\"chosen\":2") &&
      evidence.contains("\"curve\":["), evidence)
    // the probed run still dedups: both exact-dup clusters collapse
    val r = Curate.run(docs, c)
    assert(r.funnel.toMap.apply("afterDedup") == 22L,
      r.funnel.toString)
    assert(r.bandProbe.exists(_.chosen == 2))
    // full-run-only: the delta path refuses the probe
    intercept[IllegalArgumentException] {
      Curate.runDelta(docs.limit(0), docs, c)
    }
    // a probe without a banded dedup mode is a config typo
    intercept[IllegalArgumentException] {
      Curate.DefaultConfig.copy(dedup = "exact", bandsAuto = true)
    }
    // a sample with NO true pairs measures nothing: the probe keeps the
    // fixed default banding instead of crashing on an empty curve
    val clean = Curate.probeBands(
      docs.filter(col("doc_id") >= 10L), jaccard = 0.5, target = 0.9)
    assert(clean.chosen == 4 && clean.curve.isEmpty, clean.toString)
  }

  test("pinned banding: the bands config key round-trips, validates, and " +
      "changes what the fuzzy dedup stage catches (a moderate-overlap " +
      "pair meets under single-hash bands, not under the full-signature " +
      "band)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // round-trip + validation
    val out = java.nio.file.Files.createTempDirectory("curate_pin").toString
    val pinned = Curate.DefaultConfig.copy(dedup = "fuzzy", bands = 8)
    Curate.writeConfig(s"$out/${Curate.ConfigFile}", pinned)
    assert(Curate.readConfig(s"$out/${Curate.ConfigFile}") == pinned)
    intercept[IllegalArgumentException] {
      Curate.DefaultConfig.copy(bands = 5) // does not divide 16 hashes
    }
    // a ~0.75-jaccard pair: 12 of 15 word-3-gram shingles shared.
    // bands=16 (single-hash bands) catches it near-surely; bands=1
    // (all 16 minhashes must agree) near-surely does not — with the
    // fixed hash family both outcomes are deterministic on this fixture
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17"
    val vari = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 x15 x16 x17"
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, base, "en"), Row(2L, vari, "en"),
        Row(3L, "entirely different content about glacier flows and moraine deposits", "en")),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    def kept(b: Int): Long = Curate.run(docs,
        Curate.DefaultConfig.copy(minQuality = 0.0, dedup = "fuzzy",
          jaccard = 0.5, bands = b))
      .funnel.toMap.apply("afterDedup")
    assert(kept(16) == 2L,
      "single-hash bands must catch the 0.75-jaccard pair")
    assert(kept(1) == 3L,
      "the full-signature band must miss it (all 16 minhashes equal " +
        "has probability ~J^16)")
  }
}
