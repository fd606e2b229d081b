package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config YAML round-trip, validation gates, configGen, report
  * (reference `src/config/config-io.ts`, `config-generator.ts`). */
class ConfigIOSpec extends AnyFunSuite {

  private val yamlFixture =
    """version: 1
      |generatedAt: "2026-08-12T00:00:00.000Z"
      |reviewed: true
      |scope:
      |  schema: public
      |  denylistTables: [public.region, nation]
      |  allowlistTables: [ignored]
      |samples: { limit: 3, masked: true }
      |column_strategy:
      |  KEEP: [c_custkey]
      |  EMAIL_FAKE: [c_name]
      |  REDACT: [c_name]
      |rules:
      |  - table: public.customer
      |    enabled: true
      |    columns:
      |      - { column: c_custkey }
      |      - { column: c_mktsegment, strategy: TRUNCATE, params: { n: 2 } }
      |""".stripMargin

  test("parse: full fixture shape, insertion order preserved") {
    val cfg = ConfigIO.parseConfig(yamlFixture)
    assert(cfg.version == 1 && cfg.reviewed)
    assert(cfg.scope.denylistTables == Seq("public.region", "nation"))
    assert(cfg.columnStrategy.map(_._1) == Seq("KEEP", "EMAIL_FAKE", "REDACT"))
    val cols = cfg.rules.head.columns
    assert(cols(1).strategy.contains("TRUNCATE") && cols(1).params.n.contains(2))
    // c_name under EMAIL_FAKE first → EmailFake wins at resolution
    assert(Planner.resolveStrategy("c_name", Nil, cfg.columnStrategy)
      .strategy == Strategy.EmailFake)
  }

  test("parse rejects the shapes the zod schema rejects") {
    assertThrows[IllegalArgumentException](
      ConfigIO.parseConfig(yamlFixture.replace("version: 1", "version: 2")))
    assertThrows[IllegalArgumentException](
      ConfigIO.parseConfig(yamlFixture.replace("reviewed: true", "reviewed: yes-ish")))
    assertThrows[IllegalArgumentException](ConfigIO.parseConfig("version: 1"))
    assertThrows[IllegalArgumentException](ConfigIO.parseConfig(""))
  }

  test("mapping-valued column_strategy entries are dropped from resolution") {
    val cfg = ConfigIO.parseConfig(yamlFixture.replace(
      "  EMAIL_FAKE: [c_name]", "  EMAIL_FAKE: { weird: shape }"))
    assert(cfg.columnStrategy.map(_._1) == Seq("KEEP", "REDACT"))
  }

  test("scalar-valued column_strategy entries fail, as the zod union would") {
    assertThrows[IllegalArgumentException](ConfigIO.parseConfig(
      yamlFixture.replace("  EMAIL_FAKE: [c_name]", "  EMAIL_FAKE: c_name")))
  }

  test("write → read round-trips the config") {
    val cfg = ConfigIO.parseConfig(yamlFixture)
    val path = java.nio.file.Files.createTempFile("graft", ".yaml").toString
    ConfigIO.writeConfig(path, cfg)
    assert(ConfigIO.readConfig(path) == cfg)
  }

  test("maskSampleStr mirrors patterns.ts laws") {
    assert(ConfigIO.maskSampleStr(null) == null)
    assert(ConfigIO.maskSampleStr("") == "")
    assert(ConfigIO.maskSampleStr("abcdef") == "***")
    assert(ConfigIO.maskSampleStr("abcdefg") == "ab***fg")
    assert(ConfigIO.maskSampleStr("abcdefgh").length == 7)
  }

  test("report JSON is valid and carries plan, counts and total") {
    val plan = Plan("now", Seq(PlannedTable("public.c", "public", "c",
      Seq(PlannedColumn("name", Strategy.Redact, StrategyParams(Some(2)))))))
    val path = java.nio.file.Files.createTempFile("graft", ".json").toString
    ConfigIO.writeReport(path, "dryrun", plan,
      Map("public.c" -> 5L), "totalRowsEstimated")
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(text.contains("\"mode\":\"dryrun\""))
    assert(text.contains("\"public.c\":5"))
    assert(text.contains("\"totalRowsEstimated\":5"))
    assert(text.contains("\"strategy\":\"REDACT\""))
  }
}

/** configGen against live DataFrames (needs a session). */
class ConfigGenSpec extends SparkSpec {
  test("configGen: default global map, no per-column strategies, masked samples") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "alice-wonder", null),
        Row(2L, "bob", "x@y.com")),
      StructType(Seq(StructField("id", LongType),
        StructField("username", StringType), StructField("email", StringType))))
    val gen = ConfigIO.generateConfig(Map("users" -> df), sampleLimit = 3)
    assert(gen.config.columnStrategy == ConfigIO.defaultGlobalColumnStrategy)
    assert(gen.config.rules.map(_.table) == Seq("public.users"))
    assert(gen.config.rules.head.columns.forall(_.strategy.isEmpty))
    assert(!gen.config.reviewed && gen.config.samples.masked)
    val samples = gen.samplePreview.head._2.toMap
    assert(samples("username") == Seq("al***er", "***")) // masked, in row order
    assert(samples("email") == Seq("x@***om")) // null sample skipped
    // resolution over the generated config: username → HASH via global map
    assert(Planner.resolveStrategy("username", gen.config.rules.head.columns,
      gen.config.columnStrategy).strategy == Strategy.HashSha256)
  }

  test("configGen renders array samples by content, not JVM identity") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, Seq(1.5f, -2.0f))),
      StructType(Seq(StructField("id", LongType),
        StructField("vec", ArrayType(FloatType)))))
    val gen = ConfigIO.generateConfig(Map("emb" -> df), unsafeSamples = true)
    val sample = gen.samplePreview.head._2.toMap.apply("vec").head
    assert(sample == "[1.5, -2.0]")
    // and again — identical across generations (no hashcode identity)
    val gen2 = ConfigIO.generateConfig(Map("emb" -> df), unsafeSamples = true)
    assert(gen2.samplePreview.head._2.toMap.apply("vec").head == sample)
  }
}
