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
  }
}
