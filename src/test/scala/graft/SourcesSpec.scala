package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Source/sink round-trips beyond parquet (generic engine capability; the
  * reference's only source is Postgres, mapped to Sources.jdbc). */
class SourcesSpec extends SparkSpec {

  private lazy val customer =
    queries.Q.t(spark, "/root/testdata/sf0.001", "customer")

  test("csv round-trip preserves rows and (declared) schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Sources.writeCsv(customer, dir)
    val back = Sources.csv(spark, dir, customer.schema)
    assert(back.count() == customer.count())
    assert(back.schema == customer.schema)
    val a = customer.orderBy("c_custkey").collect().toSeq
    val b = back.orderBy("c_custkey").collect().toSeq
    assert(a == b)
  }

  test("json-lines round-trip preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    Sources.writeJsonLines(customer, dir)
    val back = Sources.jsonLines(spark, dir, customer.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
  }

  test("orc round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    Sources.writeOrc(customer, dir)
    val back = Sources.orc(spark, dir)
    assert(back.schema == customer.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
  }

  test("parquet sink/source round-trip via Sources helpers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Sources.writeParquet(customer, dir)
    val back = Sources.parquet(spark, dir)
    assert(back.count() == customer.count())
  }

  test("partitioned layout: partition filter prunes at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = queries.Q.t(spark, "/root/testdata/sf0.001", "events")
    Sources.writePartitioned(events, dir, Seq("event_type"))
    val back = Sources.readPartitioned(spark, dir)
    // values survive the layout round-trip (partition col moves to the end)
    assert(back.count() == events.count())
    val oneType = back.filter(col("event_type") === "click")
    assert(oneType.count() ==
      events.filter(col("event_type") === "click").count())
    // the predicate must land in PartitionFilters (directory pruning),
    // not in the post-scan Filter: planning-time pruning is what keeps a
    // partition-key query O(selected partitions) at 100 TB.
    val scan = oneType.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"), s"partition filter not pushed:\n$scan")
  }

  test("binaryFile source ingests raw payloads with path/length metadata") {
    // the multimodal ingestion path: opaque files (image/audio/video) enter
    // as binary columns + typed metadata, no driver-side reads.
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    val payloads = Seq("img-a" -> Array[Byte](1, 2, 3, 4),
      "img-b" -> Array[Byte](9, 8, 7))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(s"$name.bin"), bytes)
    }
    val df = spark.read.format("binaryFile").load(dir.toString)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val got = df.select(col("path"), col("length"), col("content"))
      .collect().map(r => (r.getString(0).split('/').last,
        r.getLong(1), r.getAs[Array[Byte]](2).toSeq)).sortBy(_._1).toSeq
    assert(got == Seq(("img-a.bin", 4L, Seq[Byte](1, 2, 3, 4)),
      ("img-b.bin", 3L, Seq[Byte](9, 8, 7))))
  }

  test("embedded-Derby JDBC: write, partitioned read, anonymize, write back") {
    // The reference's actual substrate is a live relational DB over JDBC
    // (postgres.client.ts:4-23, executor.ts:126). No Postgres ships in this
    // container, but Spark bundles Derby — an in-memory DB makes the JDBC
    // source/sink a TESTED path end-to-end instead of a call shape.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = new java.util.Properties
    val src = customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    Sources.writeJdbc(src, url, "customer_src", props, mode = "overwrite")

    // partitioned read: 4 parallel range cursors over the key, the
    // multi-connection shape a 100 TB JDBC extract needs
    val back = Sources.jdbc(spark, url, "customer_src", props,
      partitioning = Some(("c_custkey", 0L, 1000L, 4)))
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == src.count())

    // anonymize through the engine and write back over JDBC — the
    // reference's UPDATE-in-place expressed as transform + reload
    val plan = Plan("t", Seq(PlannedTable("public.customer_src", "public",
      "customer_src", Seq(PlannedColumn("c_name", Strategy.HashSha256),
        PlannedColumn("c_mktsegment", Strategy.SetNull)))))
    val out = Engine.transform(plan, Map("customer_src" -> back))("public.customer_src")
    Sources.writeJdbc(out, url, "customer_out", props, mode = "overwrite")

    val got = Sources.jdbc(spark, url, "customer_out", props)
      .orderBy("c_custkey").collect()
    val want = src.orderBy("c_custkey").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(g.getString(1) ==
        org.apache.commons.codec.digest.DigestUtils.md5Hex(w.getString(1)))
      assert(g.isNullAt(2))
    }
  }

  test("full lifecycle against a live JDBC database: introspect → configGen → plan → anonymize → write back") {
    // The reference's whole program in one test, against an actual DB:
    // schema-reader introspection (schema-reader.ts:16-37) → generated
    // YAML config (config-generator.ts:21-96) → human edit (add a
    // strategy) → plan → dry-run counts → apply → verify in the DB.
    val url = "jdbc:derby:memory:graftcfg;create=true"
    val props = new java.util.Properties
    val src = customer.select(col("c_custkey"), col("c_name"))
    Sources.writeJdbc(src, url, "customer", props, mode = "overwrite")

    val cat = Sources.jdbcCatalog(spark, url, props)
    assert(cat.keySet == Set("customer"))
    assert(cat("customer").schema.fieldNames.toSeq.map(_.toLowerCase) ==
      Seq("c_custkey", "c_name"))

    val gen = ConfigIO.generateConfig(cat, schema = "app")
    assert(gen.tablesList == Seq("app.customer"))
    // configGen ships rules with no per-column strategy — a human edits
    // the YAML before running; simulate that edit via the global map
    val edited = gen.config.copy(reviewed = true,
      columnStrategy = gen.config.columnStrategy :+
        ("HASH_SHA256" -> Seq("c_name")))
    assert(Planner.preflight(edited, Planner.Apply).isEmpty)

    val plan = Planner.buildPlan(edited, "t")
    val counts = Engine.dryRun(plan, cat)
    assert(counts == Map("app.customer" -> src.count()))

    val out = Engine.transform(plan, cat)("app.customer")
    Sources.writeJdbc(out, url, "customer_anon", props, mode = "overwrite")
    val got = Sources.jdbc(spark, url, "customer_anon", props)
      .orderBy("c_custkey").collect()
    val want = src.orderBy("c_custkey").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(1) ==
        org.apache.commons.codec.digest.DigestUtils.md5Hex(w.getString(1)))
    }
  }

  test("catalogFromDir lists tables sorted and reads them") {
    val cat = Tables.catalogFromDir(spark, "/root/testdata/sf0.001")
    assert(cat.keySet == Tables.names.toSet)
    assert(cat("region").count() == 5)
  }

  test("schema evolution: mergeSchema unions a column added mid-history; " +
      "old files read it as NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // day 1 writes (id, v); day 2's pipeline added a quality column — the
    // 100 TB reality where history is never rewritten to match new code
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.9)).toDF("id", "v", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "quality", "v"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"),
        r.isNullAt(r.fieldIndex("quality")))).toSeq
    // old files surface the new column as NULL; new files carry the value
    assert(rows == Seq((1L, true), (2L, true), (3L, false)))
  }

  test("dbConfigFromEnv mirrors the reference's PG* env resolution") {
    // defaults + ssl off (reference tool.config.ts:20-31 semantics)
    val base = Map("PGUSER" -> "u", "PGPASSWORD" -> "pw", "PGDATABASE" -> "d")
    val cfg = Sources.dbConfigFromEnv(base)
    assert(cfg == Sources.DbConfig("localhost", 5432, "u", "pw", "d", ssl = false))
    assert(cfg.jdbcUrl == "jdbc:postgresql://localhost:5432/d")
    assert(cfg.jdbcProps.getProperty("user") == "u")
    assert(cfg.jdbcProps.getProperty("ssl") == null)
    // explicit host/port + PGSSLMODE=require turns ssl on
    val full = Sources.dbConfigFromEnv(base ++ Map(
      "PGHOST" -> "db.example.com", "PGPORT" -> "5433", "PGSSLMODE" -> "REQUIRE"))
    assert(full.host == "db.example.com" && full.port == 5433 && full.ssl)
    assert(full.jdbcProps.getProperty("ssl") == "true")
    // a missing required var fails loudly, naming the variable
    val e = intercept[IllegalArgumentException] {
      Sources.dbConfigFromEnv(base - "PGPASSWORD")
    }
    assert(e.getMessage.contains("PGPASSWORD"))
  }

  test("fixture events.ts encoding is supported and normalizes to nanos-long") {
    // Pin the contract with the harness testdata: whatever physical encoding
    // events.ts carries (nanos-long | TIMESTAMP | TIMESTAMP_NTZ), Tables.load
    // must surface the engine's epoch-nanos LongType. If the testdata drifts
    // to a new encoding, THIS assertion names the drift (normalizeTs throws
    // with the offending type) instead of nine queries failing analysis.
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val physical = raw.schema("ts").dataType
    assert(Set[org.apache.spark.sql.types.DataType](
      LongType, TimestampType, TimestampNTZType).contains(physical),
      s"unsupported fixture ts encoding: $physical")
    val loaded = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(loaded.schema("ts").dataType == LongType)
    // value-level round-trip: the nanos long re-derives the original instant
    val r = loaded.select(min(col("ts"))).head().getLong(0)
    val viaTs = queries.Q.t(spark, "/root/testdata/sf0.001", "events")
      .select(min(queries.Q.tsCol("ts").cast("long"))).head().getLong(0)
    assert(r / 1000000000L == viaTs, s"nanos $r does not floor to seconds $viaTs")
  }

  test("generic parquet source passes a user 'ts' column through " +
      "untouched — no rewrite, no throw (events-only convention)") {
    import org.apache.spark.sql.types.{StringType, TimestampType}
    // a NON-events user table whose ts is (a) a real timestamp, (b) a
    // string: the generic connector must surface both verbatim
    val dir = java.nio.file.Files.createTempDirectory("graft-userts").toString
    spark.range(3)
      .select(col("id"), expr("timestamp_micros(id * 1000000)").as("ts"),
        expr("cast(id as string)").as("ts_str"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val back = Sources.parquet(spark, s"$dir/t.parquet")
    assert(back.schema("ts").dataType == TimestampType,
      "user timestamp ts must not be rewritten to nanos-long")
    assert(back.count() == 3)
    // a string 'ts' through the catalog path: only the events table is
    // normalized, so this must neither throw nor change the schema
    spark.range(2).select(expr("cast(id as string)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/weird.parquet")
    val cat = Tables.catalogFromDir(spark, dir)
    assert(cat("weird").schema("ts").dataType == StringType)
  }

  test("normalizeTs round-trips a known instant under each timestamp encoding") {
    import org.apache.spark.sql.types.LongType
    val nanos = 1704067200123456000L // 2024-01-01T00:00:00.123456Z
    // nanos-long passthrough
    val asLong = spark.range(1).select(lit(nanos).as("ts"))
    assert(Tables.normalizeTs(asLong).head().getLong(0) == nanos)
    // TIMESTAMP (µs instant) and TIMESTAMP_NTZ (µs wall-clock, UTC session)
    val asTs = spark.range(1)
      .select(expr(s"timestamp_micros(${nanos / 1000}L)").as("ts"))
    val asNtz = spark.range(1)
      .select(expr(s"cast(timestamp_micros(${nanos / 1000}L) as timestamp_ntz)").as("ts"))
    for (df <- Seq(asTs, asNtz)) {
      val out = Tables.normalizeTs(df)
      assert(out.schema("ts").dataType == LongType)
      assert(out.head().getLong(0) == nanos)
    }
  }
}
