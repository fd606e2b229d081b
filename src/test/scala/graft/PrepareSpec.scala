package graft

import org.apache.spark.sql.functions._

/** graft.Prepare CLI: artifacts written, funnel exact, order stable. */
class PrepareSpec extends SparkSpec {

  test("Prepare.run writes model/assignments/sequences, the funnel " +
      "accounts for every doc, and the consumption order is a valid " +
      "shard interleave") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_prepare").toString
    val r = Prepare.run(spark, "/root/testdata/sf0.001", out)
    // funnel: gate is monotone and packing accounts for every gated doc
    // (a gated doc has >= 20 words, so its token count is >= 1; the only
    // pack drop is the oversize class, which is counted, never silent)
    assert(r.nGated <= r.nDocs)
    assert(r.nPacked + r.nOversize == r.nGated,
      s"packed ${r.nPacked} + oversize ${r.nOversize} != gated ${r.nGated}")
    assert(r.nWords > 0 && r.nFallbackWords <= r.nWords)
    // model: pruned vocabulary keeps the single-char floor
    val model = spark.read.parquet(s"$out/model.parquet")
    assert(model.columns.toSet == Set("piece", "cost"))
    assert(model.filter(length(col("piece")) === 1).count() > 0)
    // assignments: every packed doc exactly once, tokens within capacity
    val asg = spark.read.parquet(s"$out/assignments.parquet")
    assert(asg.count() == r.nPacked)
    assert(asg.select("doc_id").distinct().count() == r.nPacked)
    assert(asg.filter(col("n_tokens") > 2048).count() == 0)
    // sequences: positions unique, padding accounting matches the report
    val sq = spark.read.parquet(s"$out/sequences.parquet")
    assert(sq.count() == r.nSequences)
    assert(sq.select("pos").distinct().count() == r.nSequences)
    val pad = sq.agg(sum("padding")).collect()(0).getLong(0)
    assert(pad == r.totalPadding && pad >= 0)
    // per shard, pos walks the shard's comb: pos % shards == shard
    assert(sq.filter(pmod(col("pos"), lit(4)) =!= col("shard")).count() == 0)
    // sequences' docs reconcile with assignments
    val seqDocs = sq.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(seqDocs == r.nPacked)
  }
}
