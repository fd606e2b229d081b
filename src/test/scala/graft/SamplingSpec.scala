package graft

import graft.operators.Sampling
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SamplingSpec extends SparkSpec {

  private def ids(n: Int) = {
    spark.createDataFrame(
      java.util.Arrays.asList((0 until n).map(i => Row(i.toLong)): _*),
      StructType(Seq(StructField("id", LongType))))
  }

  test("keepHex is deterministic and repartition-invariant") {
    val df = ids(2000)
    val once = df.filter(Sampling.keepHex(col("id"), "s1", "2000"))
      .collect().map(_.getLong(0)).toSet
    val again = df.repartition(7).filter(Sampling.keepHex(col("id"), "s1", "2000"))
      .collect().map(_.getLong(0)).toSet
    assert(once == again)
  }

  test("keepHex keeps roughly the requested fraction") {
    val n = 4000
    val kept = ids(n).filter(Sampling.keepHex(col("id"), "s2", "4000"))
      .count().toDouble
    // threshold 0x4000/0x10000 = 25%; md5 is uniform, allow ±5pp.
    assert(math.abs(kept / n - 0.25) < 0.05, s"kept ${kept / n}")
  }

  test("a row's fate is independent of the rest of the dataset") {
    val small = ids(100).filter(Sampling.keepHex(col("id"), "s3", "8000"))
      .collect().map(_.getLong(0)).toSet
    val large = ids(5000).filter(Sampling.keepHex(col("id"), "s3", "8000"))
      .collect().map(_.getLong(0)).filter(_ < 100).toSet
    assert(small == large)
  }

  test("splitLabel partitions every row into exactly one split, ~80/10/10") {
    val n = 5000
    val counts = ids(n)
      .select(Sampling.splitLabel(col("id"), "corpus").as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n)
    assert(math.abs(counts("train").toDouble / n - 0.80) < 0.04)
    assert(math.abs(counts("val").toDouble / n - 0.10) < 0.03)
    assert(math.abs(counts("test").toDouble / n - 0.10) < 0.03)
  }

  test("different salts give independent samples") {
    val df = ids(2000)
    val a = df.filter(Sampling.keepHex(col("id"), "saltA", "8000"))
      .collect().map(_.getLong(0)).toSet
    val b = df.filter(Sampling.keepHex(col("id"), "saltB", "8000"))
      .collect().map(_.getLong(0)).toSet
    assert(a != b)
    // overlap of two independent 50% samples ≈ 25% of the base
    val overlap = a.intersect(b).size.toDouble / 2000
    assert(overlap > 0.15 && overlap < 0.35, s"overlap $overlap")
  }

  test("groupSample keeps exactly min(k, |group|) rows per group, stably") {
    import org.apache.spark.sql.functions.floor
    // 10 groups of 40 plus one tiny group of 3
    val df = ids(403).withColumn("g", floor(col("id") / 40))
    val s1 = Sampling.groupSample(df, Seq("g"), "id", "s1", 5)
    val sizes = s1.groupBy("g").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 9L).forall(sizes(_) == 5L))
    assert(sizes(10L) == 3L) // group with only 3 members keeps them all
    // deterministic: a re-run selects the same rows
    val again = Sampling.groupSample(df, Seq("g"), "id", "s1", 5)
    assert(s1.exceptAll(again).isEmpty && again.exceptAll(s1).isEmpty)
    // a different salt selects a different 5-of-40
    val other = Sampling.groupSample(df, Seq("g"), "id", "s2", 5)
    assert(s1.drop("sample_rank").exceptAll(other.drop("sample_rank"))
      .count() > 0)
  }

  test("the sampling gate stays a scan-local filter — no shuffle in the plan") {
    val plan = ids(100).filter(Sampling.keepHex(col("id"), "s", "2000"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("repeatUpsample: per-key copies are exactly floor(w) or ceil(w), " +
      "the mean converges to w, zero/negative weights drop the row, and " +
      "the choice is deterministic") {
    val n = 4000
    val out = Sampling.repeatUpsample(ids(n), "id", "rep", lit(2.25))
      .groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n, "no key may vanish at w >= 1")
    assert(out.values.forall(c => c == 2L || c == 3L))
    val mean = out.values.sum.toDouble / n
    assert(math.abs(mean - 2.25) < 0.05, s"mean $mean")
    // copy indices are 1..c per key
    val copies = Sampling.repeatUpsample(ids(5), "id", "rep", lit(2.25))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    copies.groupBy(_._1).foreach { case (_, cs) =>
      assert(cs.map(_._2).sorted.toSeq == (1L to cs.length.toLong))
    }
    // w <= 0 drops; 0 < w < 1 is deterministic downsampling
    assert(Sampling.repeatUpsample(ids(100), "id", "rep", lit(0.0)).count() == 0)
    val down = Sampling.repeatUpsample(ids(2000), "id", "rep", lit(0.5)).count()
    assert(down > 800 && down < 1200, s"w=0.5 kept $down of 2000")
    // deterministic under repartitioning
    val a = Sampling.repeatUpsample(ids(500), "id", "rep", lit(1.5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.repeatUpsample(ids(500).repartition(7), "id", "rep",
      lit(1.5)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("shuffleShards is a balanced, deterministic permutation: every row " +
      "exactly once, contiguous in-shard positions, repartition-invariant") {
    val n = 2000; val shards = 8
    val out = Sampling.shuffleShards(ids(n), "id", "epoch1", shards)
      .select("id", "shard", "pos")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // permutation: n rows, every id once, (shard, pos) unique
    assert(rows.length == n)
    assert(rows.map(_._1).toSet.size == n)
    assert(rows.map(t => (t._2, t._3)).toSet.size == n)
    // positions are contiguous 1..|shard| within each shard
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong),
        s"shard $s positions not contiguous")
    }
    // md5 is uniform → shards balance (±40% of n/shards is generous)
    val sizes = rows.groupBy(_._2).values.map(_.length)
    assert(sizes.size == shards)
    assert(sizes.forall(s => s > n / shards * 0.6 && s < n / shards * 1.4),
      s"unbalanced shards: $sizes")
    // deterministic under a different input partitioning
    val again = Sampling.shuffleShards(ids(n).repartition(7), "id", "epoch1",
      shards).select("id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
  }

  test("interleave ordering: positions are unique, and every block of " +
      "n_src consecutive positions touches each source at most once") {
    val rows = SparkEntry.queries("q_interleave")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val nSrc = rows.map(_._2).distinct.length
    assert(rows.length == 500 && rows.map(_._3).distinct.length == 500)
    // round-robin law: pos div n_src is the rank level; within a level
    // every source appears at most once, so ANY aligned batch of n_src
    // positions sees a maximally-even source mix
    rows.groupBy(t => t._3 / nSrc).foreach { case (lvl, rs) =>
      assert(rs.map(_._2).distinct.length == rs.length,
        s"level $lvl repeats a source")
    }
    // the in-source order is the md5 permutation, not ingest order
    val bySrc = rows.groupBy(_._2).head._2.sortBy(_._3).map(_._1)
    assert(bySrc != bySrc.sorted, "in-source order should look shuffled")
  }

  test("shuffleShards: the permutation actually decorrelates ingest order " +
      "and different salts give different epoch orders") {
    val n = 1024
    val out = Sampling.shuffleShards(ids(n), "id", "e1", 4)
      .select("id", "shard", "pos")
      .orderBy("shard", "pos")
      .collect().map(_.getLong(0))
    // global read order (shards-in-order, positions-in-order) must not be
    // the ingest order: count adjacent id pairs that stayed adjacent —
    // a real shuffle leaves almost none
    val adjacentKept = out.sliding(2).count(p => p(1) == p(0) + 1)
    assert(adjacentKept < n / 50, s"$adjacentKept adjacent pairs survived")
    val out2 = Sampling.shuffleShards(ids(n), "id", "e2", 4)
      .select("id", "shard", "pos")
      .orderBy("shard", "pos")
      .collect().map(_.getLong(0))
    assert(!(out sameElements out2), "salts e1/e2 gave identical orders")
  }

  test("shuffleShards plan: one hash exchange on the shard id, no global sort") {
    val plan = Sampling.shuffleShards(ids(500), "id", "p1", 8)
      .queryExecution.executedPlan.toString
    // exactly one shuffle — the hashpartitioning on shard for the window
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("gumbelTopK: deterministic per salt, dominated by a large enough " +
      "score gap, sensitive to the salt, and plans as TakeOrdered") {
    import spark.implicits._
    import graft.operators.Sampling
    // 100 rows with mildly varying scores + one runaway winner: a score
    // gap far above the Gumbel spread (its seeded range here is about
    // [-2.7, 14.6]) must always be drawn
    val df = ((1 to 100).map(i => (i.toLong, (i % 7).toDouble)) :+
      (999L, 1000.0)).toDF("id", "score")
    def draw(salt: String) = Sampling.gumbelTopK(df, "id", col("score"),
      salt, k = 10).select("id").collect().map(_.getLong(0)).toSeq
    val d1 = draw("s1")
    assert(d1.length == 10 && d1.distinct.length == 10)
    assert(d1.contains(999L), "a dominating score must always be kept")
    assert(draw("s1") == d1, "same salt ⇒ identical draw forever")
    assert(draw("s2") != d1, "independent salts ⇒ different draws")
    val plan = Sampling.gumbelTopK(df, "id", col("score"), "s1", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("packSequences: every doc packed once, no sequence over capacity, " +
      "uniform slot widths, all-but-last sequences full per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 300L).map(i => (i, 1L + rnd.nextInt(128)))
      .toDF("id", "toks")
    val out = Sampling.packSequences(docs, "id", "toks", "s", nShards = 3,
        capacity = 128)
      .select("id", "toks", "shard", "bucket", "seq_id", "slot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getLong(5)))
    assert(out.length == 300 && out.map(_._1).distinct.length == 300,
      "every doc assigned exactly once")
    out.foreach { case (_, t, _, b, _, _) =>
      assert(t <= b && (b == 1 || t > b / 2), "bucket is the tight pow2")
    }
    out.groupBy { case (_, _, sh, b, q, _) => (sh, b, q) }
      .foreach { case ((_, b, _), rows) =>
        assert(rows.length <= 128 / b, "sequence over capacity")
        assert(rows.map(_._6).sorted.toSeq ==
          (0L until rows.length.toLong), "slots contiguous from 0")
      }
    // within each (shard, bucket) only the LAST seq_id may be partial
    out.groupBy { case (_, _, sh, b, _, _) => (sh, b) }
      .foreach { case ((_, b), rows) =>
        val bySeq = rows.groupBy(_._5).view.mapValues(_.size).toMap
        val last = bySeq.keys.max
        bySeq.foreach { case (q, n) =>
          if (q != last) assert(n == 128 / b, s"non-final seq $q partial")
        }
      }
  }

  test("pack curve (q_pack_curve): capacity sweep laws — oversize " +
      "monotone down, admitted tokens monotone up, exact budget " +
      "accounting per capacity") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_pack_curve")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == Seq(64L, 128L, 256L))
    rows.foreach { case (cap, nSeqs, used, pad, _, frac) =>
      // per capacity the budget is exact: used + padding = n_seqs · cap
      assert(used + pad == nSeqs * cap, s"budget leak at cap $cap")
      assert(frac == (if (nSeqs == 0) 0.0 else pad.toDouble / (nSeqs * cap)))
    }
    // doubling capacity only ADMITS docs: oversize count monotone down,
    // admitted token mass monotone up
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._5 <= lo._5, "n_oversize must fall with capacity")
      assert(hi._3 >= lo._3, "used_tokens must rise with capacity")
    }
    // the funnel never loses a doc: oversize is bounded by the corpus
    val docs = queries.Q.t(spark, dir, "documents")
      .filter(col("text").isNotNull).count()
    rows.foreach { case (_, _, _, _, over, _) => assert(over <= docs) }
  }

  test("prepare composition (q_prepare_e2e): gate monotone, packing " +
      "exact, positions round-robin the shards") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_prepare_e2e")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    // packing accounting: used + padding = capacity, bucket capacity kept
    out.foreach { case (_, _, b, _, nDocs, used, pad) =>
      assert(used + pad == 128L && pad >= 0L, s"padding accounting: $used/$pad")
      assert(nDocs >= 1L && nDocs <= 128L / b, s"capacity: $nDocs docs at bucket $b")
    }
    // interleave: pos unique; within a shard pos ≡ shard (mod 4) and the
    // ranks are contiguous from 0
    assert(out.map(_._1).distinct.length == out.length, "pos not unique")
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ranks = rows.map { case (pos, _, _, _, _, _, _) =>
        assert(pos % 4 == shard, s"pos $pos off shard $shard's comb")
        pos / 4
      }.sorted.toSeq
      assert(ranks == (0L until rows.length.toLong),
        s"shard $shard ranks not contiguous")
    }
    // gate monotone: packed docs <= gated docs <= all docs
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nGated = docs.filter(col("text").isNotNull &&
      size(split(col("text"), "\\s+")) >= 20).count()
    val nPacked = out.map(_._5).sum
    assert(nPacked <= nGated && nGated <= docs.count(),
      s"funnel: $nPacked packed, $nGated gated")
  }
}
