package graft

import graft.operators.{Dedup, Similarity, TextAnalysis => TA}
import graft.functions.VectorOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (i, t) => Row(i, t) }: _*),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  test("q_dedup_soft conservation law: every doc keeps weight exactly " +
      "1/|its cluster|, cluster members agree on size, and total mass " +
      "equals the cluster count — one document's worth per cluster") {
    val out = SparkEntry.queries("q_dedup_soft")(spark,
        "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cluster"), r.getAs[Long]("n_members"),
        r.getAs[Double]("w")))
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (c, rows) =>
      assert(rows.forall(_._3 == rows.length),
        s"cluster $c size disagrees: ${rows.toSeq}")
      rows.foreach { case (_, _, n, w) =>
        assert(w == BigDecimal(1.0 / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          s"cluster $c: w=$w != round(1/$n)")
      }
      // per-cluster mass 1 within the 6-decimal rounding of each member
      assert(math.abs(rows.map(_._4).sum - 1.0) <= rows.length * 5e-7)
    }
    assert(math.abs(out.map(_._4).sum - byCluster.size) <= out.length * 5e-7)
    // the labels agree with the hard-dedup clustering: every labeled
    // pair in q_dedup_cluster shares a q_dedup_soft cluster
    val hard = SparkEntry.queries("q_dedup_cluster")(spark,
        "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val soft = out.map(t => t._1 -> t._2).toMap
    hard.foreach { case (id, comp) =>
      assert(soft(id) == soft(comp), s"doc $id split from its label $comp")
    }
  }

  test("shingles: distinct word n-grams; short docs yield one partial shingle") {
    val out = docs((1L, "a b c d")).select(Dedup.shingles(col("text"), 3))
      .collect().head.getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
    val short = docs((1L, "a b")).select(Dedup.shingles(col("text"), 3))
      .collect().head.getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("minhash: identical shingle sets → identical signatures, fixed length") {
    val df = docs((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"),
      (3L, "entirely different words here now"))
    val sigs = df.select(col("doc_id"),
      Dedup.minhash(Dedup.shingles(col("text"), 2), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length == 8)
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("connectedComponents closes chains and keeps components separate") {
    import org.apache.spark.sql.types._
    val edges = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 2L), Row(2L, 3L), Row(3L, 4L), Row(4L, 5L), // 4-hop chain
        Row(10L, 11L),                                      // separate pair
        Row(20L, 21L), Row(21L, 20L)),                      // duplicate edge
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val comps = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents closes a worst-case path graph in O(log d) rounds") {
    import org.apache.spark.sql.types._
    // 64-node path: diameter 63. Plain min-label propagation moves the min
    // one hop per round (63 rounds — over the default cap); the
    // pointer-halving hop collapses label chains exponentially, so a
    // maxIter of 10 (~log2 63 + slack + confirmation) must suffice.
    val rows = (0L until 63L).map(i => Row(i, i + 1))
    val edges = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val comps = Dedup.connectedComponents(edges, "a", "b", maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length == 64)
    assert(comps.forall(_._2 == 0L))
  }

  test("connectedComponents: tiny clusters (the near-dup norm) close with " +
      "ZERO loop rounds; init halving keeps deep chains within budget") {
    import org.apache.spark.sql.types._
    // Pairs and stars — the shape of real near-dup/entity clusters —
    // converge inside the init aggregate (min-direct-neighbor + the folded
    // halving hop); the edge-violation probe detects that and skips the
    // loop entirely, so no confirmation round ever runs.
    val tiny = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 2L),                                   // pair
        Row(10L, 11L), Row(10L, 12L), Row(10L, 13L)),  // star, center = min
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(tiny, "a", "b")
    assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L,
        13L -> 10L))
    assert(rounds == 0, s"expected init-converged with 0 loop rounds, got $rounds")
    // A leaf-min star needs the label to flow leaf→center→other leaves
    // (two propagation hops): exactly one change round + confirmation.
    val leafMin = spark.createDataFrame(
      java.util.Arrays.asList(Row(23L, 20L), Row(23L, 21L), Row(23L, 22L)),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val (llabels, lrounds) =
      Dedup.connectedComponentsWithRounds(leafMin, "a", "b")
    assert(llabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
    assert(lrounds == 2, s"expected 1 change + 1 confirm, got $lrounds")
    // Deep chain: 64-node path (diameter 63) still closes in O(log d)
    // loop rounds — the halving-in-init head start keeps it ≤ 6.
    val path = spark.createDataFrame(
      java.util.Arrays.asList((0L until 63L).map(i => Row(i, i + 1)): _*),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val (plabels, prounds) =
      Dedup.connectedComponentsWithRounds(path, "a", "b", maxIter = 10)
    assert(plabels.collect().forall(_.getLong(1) == 0L))
    assert(prounds <= 6, s"path-64 took $prounds rounds")
  }

  test("connectedComponents agrees with a driver-side union-find on random graphs") {
    import org.apache.spark.sql.types._
    // Seeded, so failures reproduce; 6 random graphs exercise shapes the
    // hand-built cases (chain, star, path) do not: multi-component tangles,
    // duplicate edges, high-degree hubs — each checked against a plain
    // union-find computed on the driver.
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val n = 10 + rnd.nextInt(30)
      val edgeSeq = Seq.fill(n + rnd.nextInt(2 * n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x
        else { parent(x) = find(parent(x)); parent(x) }
      edgeSeq.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // union-by-min (parent(max)=min) makes every root the component's
      // minimum id — exactly the label contract connectedComponents keeps
      val inGraph = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = inGraph.map(id => id -> find(id.toInt).toLong).toMap

      val edges = spark.createDataFrame(
        java.util.Arrays.asList(edgeSeq.map { case (a, b) => Row(a, b) }: _*),
        StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
      val got = Dedup.connectedComponents(edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial (n=$n, edges=${edgeSeq.size})")
    }
  }

  test("connectedComponents on an empty edge list returns an empty frame") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    assert(Dedup.connectedComponents(empty, "a", "b").count() == 0)
  }

  test("nearDuplicates finds planted near-dups and skips unrelated docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base.replace("epsilon", "EPSILON") // one token changed
    val other = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    val out = Dedup.nearDuplicates(
      docs((1L, base), (2L, nearDup), (3L, other), (4L, base)),
      "doc_id", "text", shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = out.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(out.find(p => p._1 == 1L && p._2 == 4L).get._3 == 1.0)
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated
  }

  test("null-text docs are excluded from shingle dedup, not paired together") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val out = Dedup.nearDuplicatesPortable(
      docs((1L, base), (2L, base), (3L, null), (4L, null)),
      "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the real dup pair survives; the two null docs do NOT become a pair
    // (concat_ws would otherwise give them identical "" shingles)
    assert(out == Set((1L, 2L)))
    val cont = Dedup.containmentPairs(
      docs((1L, base), (3L, null), (4L, null)), "doc_id", "text")
      .collect()
    assert(cont.isEmpty)
  }

  test("bandedRecallPortable: ground truth is banding-independent, and " +
      "1-row bands catch everything a single 16-row band can miss") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val near = base.replace("epsilon", "EPSILON") // J ≈ 15/21 ≥ 0.5
    val other = "one two three four five six seven eight nine ten"
    val corpus = docs((1L, base), (2L, near), (3L, base), (4L, other))
    val queries = corpus.filter(col("doc_id") === 1L)
    def run(bands: Int): (Long, Long, Long) = {
      val rows = Dedup.bandedRecallPortable(corpus, queries, "doc_id",
        "text", shingleN = 3, numHashes = 16, bands = bands, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.length == 1); rows.head
    }
    // truth for q=1 is {2 (near-dup), 3 (identical)} under EVERY banding —
    // the ground-truth side must not depend on the candidate generation
    val wide = run(16) // 1-row bands: ANY shared minhash family → candidate
    assert(wide == ((1L, 2L, 2L)), s"got $wide")
    val narrow = run(1) // one 16-row band: candidate iff ALL 16 agree
    assert(narrow._1 == 1L && narrow._2 == 2L,
      "truth set must be identical under the stingiest banding")
    // the identical doc 3 always shares the full signature → caught;
    // monotone: a 16-row band can never catch more than 1-row bands
    assert(narrow._3 >= 1L && narrow._3 <= wide._3)
  }

  test("bandedRecallCurvePortable: recall monotone over NESTED bandings " +
      "(finer aligned bands have superset candidates) and truth is shared") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val near = base.replace("epsilon", "EPSILON")
    val near2 = base.replace("tau", "TAU")
    val other = "one two three four five six seven eight nine ten"
    val corpus = docs((1L, base), (2L, near), (3L, base), (4L, other),
      (5L, near2))
    val out = Dedup.bandedRecallCurvePortable(corpus,
        corpus.filter(col("doc_id") <= 2L), "doc_id", "text",
        shingleN = 3, numHashes = 16, bandsList = Seq(1, 2, 4, 8, 16),
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5)))
    val byQ = out.groupBy(_._2)
    byQ.foreach { case (q, rows) =>
      // n_true identical across the curve: truth never depends on banding
      assert(rows.map(_._3).distinct.length == 1, s"q=$q truth varies")
      val sorted = rows.sortBy(_._1) // ascending bands = finer banding
      // 1 | 2 | 4 | 8 | 16 are aligned nested splits of the 16-hash
      // signature, so candidates only GROW with bands: n_caught and
      // n_cand are both monotone non-decreasing
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"q=$q n_caught not monotone in bands")
      assert(sorted.map(_._5).toSeq == sorted.map(_._5).sorted.toSeq,
        s"q=$q n_cand not monotone in bands")
    }
  }

  test("containmentPairs scores an embedded quote ~1.0 where Jaccard stays low") {
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val quote = "alpha beta gamma delta epsilon zeta" // prefix ⊂ long
    val other = "one two three four five six seven eight nine ten"
    val out = Dedup.containmentPairs(
      docs((1L, long), (2L, quote), (3L, other)), "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // the quote's shingles are all in the long doc: containment exactly 1,
    // while Jaccard would be 4/22 ≈ 0.18
    assert(out((1L, 2L)) == 1.0)
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("capBlocks bounds a corpus-common min-shingle block; planted " +
      "near-dups still meet in their other blocks") {
    // 1000 filler docs all share the lexicographically smallest shingle
    // "a a a" (a boilerplate prefix) but nothing else — without the cap,
    // that ONE block expands to ~500k candidate pairs; with it, the block
    // is dropped and the fillers (rightly) produce no pairs at all.
    val fillers = (1 to 1000).map(i =>
      (i.toLong, s"a a a u$i v$i w$i x$i y$i z$i q$i"))
    // planted near-dup pairs share the SAME boilerplate prefix; they must
    // survive the cap by meeting in their 2nd/3rd-smallest-shingle blocks.
    val planted = (1 to 3).flatMap { p =>
      val base = s"a a a b$p c$p d$p e$p f$p g$p h$p"
      Seq((2000L + 2 * p, base), (2001L + 2 * p, base + " zz"))
    }
    val df = docs((fillers ++ planted): _*)
    val out = Dedup.containmentPairs(df, "doc_id", "text",
        shingleN = 3, kBlock = 3, minCont = 0.5, maxBlock = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val expected = (1 to 3).map(p => (2000L + 2 * p, 2001L + 2 * p)).toSet
    assert(out.keySet == expected) // full recall on the planted pairs…
    assert(out.values.forall(_ == 1.0)) // …each a perfect-containment twin
    // and the capped helper really removes the oversized block's rows
    val blocked = df.select(col("doc_id"),
      explode(org.apache.spark.sql.functions.slice(
        sort_array(Dedup.shingles(col("text"), 3)), 1, 3)).as("blk"))
    val capped = Dedup.capBlocks(blocked, "blk", 100)
    assert(capped.filter(col("blk") === "a a a").count() == 0)
    assert(capped.count() == blocked.count() - 1006) // only that block dropped
  }

  test("duplicatedSpans finds the exact shared word run and nothing else; " +
      "removal excises it and reassembles the rest") {
    // docs 1 and 2 share a 9-word license block mid-document (≥ w=4, so
    // every interior anchor is duplicated); doc 3 shares nothing.
    val block = "this block is shared verbatim between the two documents"
    val d1 = s"alpha beta gamma $block tail1 tail2 tail3"
    val d2 = s"x1 x2 $block y1 y2"
    val d3 = "totally unrelated words that appear exactly once only here now"
    val df = docs((1L, d1), (2L, d2), (3L, d3))
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 1: block occupies words 4-12; doc 2: words 3-11 (1-based)
    assert(spans == Set((1L, 4, 12), (2L, 3, 11)))
    val clean = Dedup.removeDuplicatedSpans(df, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(clean(1L) == ((15L, 9L, "alpha beta gamma tail1 tail2 tail3")))
    assert(clean(2L) == ((13L, 9L, "x1 x2 y1 y2")))
    assert(clean(3L) == ((10L, 0L, d3)))
  }

  test("duplicatedSpans and removeDuplicatedSpans agree with a driver-side " +
      "brute force on random small-alphabet corpora") {
    // Seeded random corpora over a 3-5 word alphabet make cross-doc
    // duplicated runs plentiful and adversarial (overlapping runs,
    // repeats inside one doc, full-doc duplicates) — shapes the planted
    // license-block test cannot cover. Reference: literal per-doc anchor
    // census + run grouping on the driver.
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val vocabN = 3 + rnd.nextInt(3)
      val vocab = (0 until vocabN).map(i => ('a' + i).toChar.toString)
      val w = 2 + rnd.nextInt(2)
      val corpus = (1 to 4 + rnd.nextInt(5)).map { id =>
        val len = 3 + rnd.nextInt(30)
        (id.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocabN))).mkString(" "))
      }
      val wordsById = corpus.toMap.map { case (k, v) => k -> v.split(" ").toSeq }
      val shingleDocs = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.Set[Long]]
      for ((id, ws) <- wordsById; i <- 0 to ws.length - w)
        shingleDocs.getOrElseUpdate(ws.slice(i, i + w).mkString(" "),
          scala.collection.mutable.Set.empty) += id
      val expected = (for {
        (id, ws) <- wordsById.toSeq
        dupPos = (0 to ws.length - w).filter(i =>
          shingleDocs(ws.slice(i, i + w).mkString(" ")).size > 1).map(_ + 1)
        run <- dupPos.foldLeft(List.empty[List[Int]]) { (acc, p) =>
          acc match {
            case (h :: t) :: rest if h == p - 1 => (p :: h :: t) :: rest
            case _ => List(p) :: acc
          }
        }
      } yield (id, run.min, run.max + w - 1, run.size.toLong)).toSet
      val df = docs(corpus: _*)
      val got = Dedup.duplicatedSpans(df, "doc_id", "text", w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getLong(3))).toSet
      assert(got == expected, s"trial $trial w=$w corpus=$corpus")
      // removal agreement: uncovered words reassemble in order
      val covered = expected.groupBy(_._1).map { case (id, spans) =>
        id -> spans.flatMap(s => s._2 to s._3)
      }
      val cleanExp = wordsById.map { case (id, ws) =>
        val cov = covered.getOrElse(id, Set.empty[Int])
        id -> ((ws.length.toLong, cov.size.toLong,
          ws.zipWithIndex.collect { case (wd, i) if !cov(i + 1) => wd }
            .mkString(" ")))
      }
      val cleanGot = Dedup.removeDuplicatedSpans(df, "doc_id", "text", w)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(cleanGot == cleanExp, s"trial $trial w=$w corpus=$corpus")
    }
  }

  test("duplicatedSpans robustness: empty corpus, single doc, null text, " +
      "and docs shorter than the window all yield no spans; removal " +
      "passes them through") {
    val empty = docs()
    assert(Dedup.duplicatedSpans(empty, "doc_id", "text", 4).count() == 0)
    assert(Dedup.removeDuplicatedSpans(empty, "doc_id", "text", 4).count() == 0)
    // one doc (nothing cross-doc), a null text, and a 2-word doc (< w)
    val df = docs((1L, "a long enough document with many words here"),
      (2L, null.asInstanceOf[String]), (3L, "too short"))
    assert(Dedup.duplicatedSpans(df, "doc_id", "text", 4).count() == 0)
    val clean = Dedup.removeDuplicatedSpans(df, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    // null-text doc drops (no tokens); the others pass through untouched
    assert(clean.keySet == Set(1L, 3L))
    assert(clean(1L)._2 == 0L && clean(3L) == ((2L, 0L, "too short")))
  }

  test("simHash16: equal texts equal, near texts within small Hamming distance") {
    val df = docs((1L, "spark engine scale data pipeline quality"),
      (2L, "spark engine scale data pipeline quality"),
      (3L, "spark engine scale data pipeline throughput"),
      (4L, "q w e r t y u i o p"))
    val sigs = df.select(col("doc_id"), Dedup.simHash16(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(1L) == sigs(2L))
    assert(hamming(sigs(1L), sigs(3L)) <= 6)
    assert(hamming(sigs(1L), sigs(4L)) > 0)
  }

  test("nearDuplicatesPortable recovers the same planted near-dups as the " +
      "xxhash64 family") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base.replace("epsilon", "EPSILON")
    val other = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    val out = Dedup.nearDuplicatesPortable(
      docs((1L, base), (2L, nearDup), (3L, other), (4L, base)),
      "doc_id", "text", shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = out.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 4L)))
    assert(out.find(p => p._1 == 1L && p._2 == 4L).get._3 == 1.0)
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("nearDuplicatesDeltaPortable pairs delta-vs-corpus only, never " +
      "corpus-vs-corpus") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base.replace("epsilon", "EPSILON")
    val other = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    // corpus holds an internal exact-dup pair (1, 4) that must NOT appear;
    // delta doc 10 is a near-dup of corpus doc 1, delta doc 11 is clean
    val corpus = docs((1L, base), (3L, other), (4L, base))
    val delta = docs((10L, nearDup), (11L, "totally fresh unmatched words " +
      "here that share no shingles with anything else at all"))
    val out = Dedup.nearDuplicatesDeltaPortable(corpus, delta, "doc_id",
      "text", shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).toSet == Set(10L))        // only the dirty delta doc
    assert(out.map(_._2).toSet.subsetOf(Set(1L, 4L))) // against its corpus dups
    assert(out.nonEmpty)
  }

  test("portableHash64 is deterministic, non-negative, and spreads tokens") {
    val df = docs((1L, "x"), (2L, "x"), (3L, "y"))
      .select(col("doc_id"), Dedup.portableHash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df(1L) == df(2L))
    assert(df(1L) != df(3L))
    assert(df.values.forall(_ >= 0L)) // 60-bit hex prefix: always fits a long
  }

  test("simHash16Portable: same Hamming-distance laws as the xxhash family") {
    val df = docs((1L, "spark engine scale data pipeline quality"),
      (2L, "spark engine scale data pipeline quality"),
      (3L, "spark engine scale data pipeline throughput"),
      (4L, "q w e r t y u i o p"))
    val sigs = df.select(col("doc_id"), Dedup.simHash16Portable(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(1L) == sigs(2L))
    assert(hamming(sigs(1L), sigs(3L)) <= 6)
    assert(hamming(sigs(1L), sigs(4L)) > 0)
    assert(sigs.values.forall(s => s >= 0L && s <= 0xFFFFL))
  }

  test("repetitionRatio: 0 for all-distinct grams, 0.5 for abab pattern") {
    import graft.operators.TextAnalysis
    val df = docs((1L, "a b a b a b"), (2L, "one two three four five six"))
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .select(col("doc_id"),
        TextAnalysis.repetitionRatio(col("w"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // "a b a b a b": grams [aba, bab, aba, bab] -> 2 distinct of 4 -> 0.5
    assert(df(1L) == 0.5)
    assert(df(2L) == 0.0)
  }

  test("exactByKey keeps exactly the first-ordered row per key") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 2L, "b"), Row(1L, 1L, "a"), Row(2L, 9L, "z")),
      StructType(Seq(StructField("k", LongType), StructField("o", LongType),
        StructField("v", StringType))))
    val out = Dedup.exactByKey(df, Seq("k"), Seq(col("o"))).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(out == Seq((1L, "a"), (2L, "z")))
  }
}

class SimilaritySpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Double])*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (i, v) => Row(i, v) }: _*),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("emb", ArrayType(DoubleType)))))

  test("cosine: hand-checked values via VectorOps") {
    val df = vecs((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (3L, Seq(2.0, 0.0)))
    val out = df.crossJoin(vecs((9L, Seq(1.0, 0.0)))
        .select(col("emb").as("q_emb")))
      .select(col("vec_id"), VectorOps.cosine(col("emb"), col("q_emb")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0 && out(3L) == 1.0)
    assert(out(2L) == 0.0)
  }

  test("exactTopK ranks by cosine desc with vec_id tiebreak") {
    val corpus = vecs((1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(1.0, 0.0)))
    val qs = vecs((1L, Seq(1.0, 0.0))).select(col("vec_id").as("q_id"),
      col("emb").as("q_emb"))
    val out = Similarity.exactTopK(corpus, qs, 2)
      .orderBy("rn").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(out == Seq(4L, 2L)) // cos(4)=1.0 (id-tiebreak beats 2), then 2
  }

  test("LSH: same vector → same bucket; opposite vectors differ; topK ⊆ bucket") {
    val planes = Similarity.hyperplanes(8, 4)
    assert(planes == Similarity.hyperplanes(8, 4)) // seeded determinism
    val corpus = vecs((1L, Seq(1.0, 2.0, -1.0, 0.5)), (2L, Seq(1.0, 2.0, -1.0, 0.5)),
      (3L, Seq(-1.0, -2.0, 1.0, -0.5)))
    val buckets = Similarity.withLshBucket(corpus, "emb", planes)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(buckets(1L) == buckets(2L))
    assert(buckets(1L) != buckets(3L)) // sign-flip of every projection
    val qs = vecs((10L, Seq(1.0, 2.0, -1.0, 0.5)))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val hits = Similarity.lshTopK(corpus, qs, 5, planes)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(hits == Set(1L, 2L)) // bucket-mates only; 3 is filtered by LSH
  }

  test("hardNegatives drops the near-duplicate band but keeps the hardest " +
      "survivor on top; ranks are re-numbered after the cut") {
    // corpus vs query (1,0): 2 is a near-clone (cos≈0.998), 3 is hard
    // (cos≈0.894), 4 orthogonal, 5 opposite
    val corpus = vecs((2L, Seq(1.0, 0.07)), (3L, Seq(1.0, 0.5)),
      (4L, Seq(0.0, 1.0)), (5L, Seq(-1.0, 0.0)))
    val qs = vecs((1L, Seq(1.0, 0.0))).select(col("vec_id").as("q_id"),
      col("emb").as("q_emb"))
    val all = Similarity.exactTopK(corpus, qs, 4)
      .orderBy("rn").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(all.head == 2L, "sanity: the clone tops the unfiltered ranking")
    val hard = Similarity.hardNegatives(corpus, qs, 4, dupThreshold = 0.95)
      .orderBy("rn").collect()
    assert(hard.map(_.getAs[Long]("vec_id")).toSeq == Seq(3L, 4L, 5L),
      "clone excluded, hardest negative first, ranks renumbered")
    assert(hard.map(_.getAs[Long]("rn")).toSeq == Seq(1L, 2L, 3L))
    assert(hard.forall(_.getAs[Double]("cos") < 0.95))
  }
}

class TextAnalysisSpec extends SparkSpec {

  test("token counts: whitespace vs BPE-ish regex") {
    val df = strDf("t", Seq("hello world, friend!"))
    val out = df.select(TA.tokenCountWs(col("t")), TA.tokenCountRe(col("t")))
      .collect().head
    assert(out.getLong(0) == 3)
    assert(out.getLong(1) == 5) // hello / world / , / friend / !
  }

  test("occurrences counts non-overlapping literal matches") {
    val df = strDf("t", Seq("the cat the dog the bird"))
    assert(df.select(TA.occurrences(col("t"), "the ")).collect().head.getLong(0) == 3)
  }

  test("langId picks the marker-heavy language; unknown when no markers") {
    val df = strDf("t", Seq(
      "the cat sat on a mat with the hat",
      "der hund und der vogel und die katze",
      "le chat et le chien et la souris",
      "xyz qrs tuv"))
    val out = collectStrings(df.select(TA.langId(col("t"))))
    assert(out == Seq("en", "de", "fr", "unknown"))
  }

  test("quality score rewards sane token count and token length") {
    val good = ("word " * 25).trim
    val out = strDf("t", Seq(good, "a b", "x"))
      .select(TA.qualityScore(col("t"))).collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(1.0, 0.0, 0.0))
  }

  test("bm25TopK: tf raises, length normalizes, non-matches drop, " +
      "multi-term scores add") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark join"),   // tf=2 at dl=3
      (2L, "spark join x"),       // tf=1 at dl=3
      (3L, "spark a b c d e"),    // tf=1 at dl=6 — length-normalized down
      (4L, "other words here"),   // no term: filtered out
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val one = TA.bm25TopK(docs, "doc_id", "text", Seq("spark"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(one.map(_._1).toSeq == Seq(1L, 2L, 3L), "rank by tf then 1/dl")
    assert(one.forall(_._2 > 0))
    // adding a second query term can only add score, and doc 1 (hits both
    // terms twice+once) stays on top
    val two = TA.bm25TopK(docs, "doc_id", "text", Seq("spark", "join"),
      topK = 10).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oneMap = one.toMap
    assert(two(1L) > oneMap(1L) && two(2L) > oneMap(2L))
    assert(two(1L) > two(2L) && two(2L) > two(3L))
  }

  test("bm25BatchTopK: a one-query table reproduces bm25TopK's ranking; " +
      "corpus-absent terms contribute nothing; no cross-query bleed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark join"),
      (2L, "spark join x"),
      (3L, "spark a b c d e"),
      (4L, "other words here"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val single = TA.bm25TopK(docs, "doc_id", "text", Seq("spark", "join"),
      topK = 10).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = TA.bm25BatchTopK(docs, "doc_id", "text",
      Seq((0L, "spark join"), (1L, "other"), (2L, "absent spark"))
        .toDF("q_id", "qtext"),
      "q_id", "qtext", topK = 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    // query 0 = the literal term set: same doc set, same scores to the
    // 1e-5 the decimal term-sum rounding allows, same ranking
    val q0 = batch.collect { case ((0L, d), (rnk, sc)) => d -> (rnk, sc) }
    assert(q0.keySet == single.keySet)
    q0.foreach { case (d, (_, sc)) =>
      assert(math.abs(sc - single(d)) < 1e-5, s"doc $d: $sc vs ${single(d)}")
    }
    assert(q0.toSeq.sortBy(_._2._1).map(_._1) == Seq(1L, 2L, 3L))
    // query 1 matches only doc 4; query 2's absent term adds nothing, so
    // its candidates are exactly the spark docs
    assert(batch.keys.collect { case (1L, d) => d }.toSet == Set(4L))
    assert(batch.keys.collect { case (2L, d) => d }.toSet == Set(1L, 2L, 3L))
  }

  test("URL extraction and host canonicalization: order kept, case folded, " +
      "www. stripped once, ports kept, non-URLs empty") {
    val df = strDf("t", Seq(
      "a http://www.Example.COM/x then https://CDN3.example.org/p?q=1 done",
      "bare https://host:8080/path and https://www.www.deep.io/",
      "no urls here",
      ""))
    val urls = df.select(TA.extractUrls(col("t")).as("u")).collect()
      .map(_.getSeq[String](0))
    assert(urls(0) == Seq("http://www.Example.COM/x",
      "https://CDN3.example.org/p?q=1"))
    assert(urls(2).isEmpty && urls(3).isEmpty)
    val hosts = df.select(explode(TA.extractUrls(col("t"))).as("u"))
      .select(TA.canonicalHost(col("u"))).collect().map(_.getString(0))
    assert(hosts.toSeq == Seq("example.com", "cdn3.example.org",
      "host:8080", "www.deep.io"),
      s"got ${hosts.toSeq} — exactly ONE leading www. strips, ports stay")
    // non-URL input through canonicalHost alone → empty string
    assert(strDf("u", Seq("ftp://x", "plain"))
      .select(TA.canonicalHost(col("u"))).collect()
      .forall(_.getString(0) == ""))
  }

  test("redaction law on 300 randomized texts: idempotent (a second pass " +
      "changes nothing) and detector-clean afterwards") {
    // seeded mix of emails, phone shapes, digit runs, and plain words —
    // adjacency of digit fragments exercises the non-overlapping-match
    // edge cases (a replacement must never expose a NEW match, which
    // holds because the placeholders carry no digits or @)
    val rnd = new scala.util.Random(7)
    def frag(): String = rnd.nextInt(6) match {
      case 0 => s"user${rnd.nextInt(1000)}@ex${rnd.nextInt(10)}.com"
      case 1 => s"${100 + rnd.nextInt(900)}-${100 + rnd.nextInt(900)}-" +
        s"${1000 + rnd.nextInt(9000)}"
      case 2 => Seq.fill(1 + rnd.nextInt(14))(('0' + rnd.nextInt(10)).toChar)
        .mkString
      case _ => rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString
    }
    val texts = Seq.fill(300)(
      Seq.fill(1 + rnd.nextInt(12))(frag())
        .mkString(if (rnd.nextBoolean()) " " else ""))
    val once = strDf("t", texts).select(TA.redactPii(col("t")).as("t"))
    assert(once.select((TA.redactPii(col("t")) <=> col("t")).as("same"))
      .collect().forall(_.getBoolean(0)), "redactPii must be idempotent")
    assert(once.filter(TA.hasEmail(col("t")) || TA.hasPhone(col("t")))
      .count() == 0, "no detector may fire after redaction")
  }

  test("canonicalHost law on randomized hosts: lowercases and strips " +
      "exactly ONE leading www.") {
    val rnd = new scala.util.Random(11)
    val cases = Seq.fill(200) {
      val k = rnd.nextInt(3) // 0..2 www. prefixes
      val name = (1 + rnd.nextInt(3) to 3).map(_ =>
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString).mkString(".")
      val mixedCase = name.map(c =>
        if (rnd.nextBoolean()) c.toUpper else c).mkString
      val url = s"https://${"www." * k}$mixedCase/p?x=1"
      val expected = ("www." * math.max(0, k - 1)) + name.toLowerCase
      (url, expected)
    }
    val out = strDf("u", cases.map(_._1))
      .select(TA.canonicalHost(col("u"))).collect().map(_.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want got $got")
    }
  }

  test("PII detectors hit emails and phone shapes, not plain text") {
    val df = strDf("t", Seq("contact bob@example.com now", "call 415-555-1234",
      "nothing here"))
    val out = df.select(TA.hasEmail(col("t")), TA.hasPhone(col("t"))).collect()
    assert(out(0).getBoolean(0) && !out(0).getBoolean(1))
    assert(!out(1).getBoolean(0) && out(1).getBoolean(1))
    assert(!out(2).getBoolean(0) && !out(2).getBoolean(1))
  }

  test("redactPii scrubs every email/phone occurrence in-place, leaves " +
      "clean text untouched") {
    val df = strDf("t", Seq(
      "contact bob@example.com or sue@test.org today",
      "call 415-555-1234 or 212.555.9876 now",
      "mixed: a@b.io and 415-555-1234",
      "nothing sensitive here"))
    val out = df.select(TA.redactPii(col("t"))).collect()
      .map(_.getString(0)).toSeq
    assert(out(0) == "contact [EMAIL] or [EMAIL] today")
    assert(out(1) == "call [PHONE] or [PHONE] now")
    assert(out(2) == "mixed: [EMAIL] and [PHONE]")
    assert(out(3) == "nothing sensitive here")
    // after redaction the detectors find nothing — the scan/redact pair
    // closes the loop
    val re = df.select(TA.redactPii(col("t")).as("t"))
    assert(re.filter(TA.hasEmail(col("t")) || TA.hasPhone(col("t"))).count() == 0)
  }

  test("langIdNaiveBayes separates distinct char distributions perfectly; " +
      "every doc gets exactly one prediction") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "alpha alpha alpha beta beta alpha", "aa"),
        Row(2L, "alpha beta alpha beta alpha beta", "aa"),
        Row(3L, "zulu zulu yankee yankee zulu zulu", "zz"),
        Row(4L, "yankee zulu yankee zulu zulu zulu", "zz"),
        Row(5L, null, "aa")),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    val out = TA.langIdNaiveBayes(df, "doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.length == 4, "null-text docs get no prediction row")
    assert(out.forall(t => t._2 == t._3),
      s"disjoint char distributions must classify perfectly: ${out.toSeq}")
  }

  test("langIdAssign fills only NULL langs from the labeled subset's " +
      "model; labels and schema untouched, unresolvable rows keep NULL") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "alpha alpha alpha beta beta alpha", "aa"),
        Row(2L, "zulu zulu yankee yankee zulu zulu", "zz"),
        // unlabeled, each firmly in one training distribution
        Row(3L, "alpha beta alpha beta alpha beta", null),
        Row(4L, "yankee zulu yankee zulu zulu zulu", null),
        // unlabeled + null text: nothing to score, stays NULL
        Row(5L, null, null),
        // LABELED rows are never rescored — the label wins even for text
        // the model has no opinion on
        Row(6L, "qoph qoph waw qoph waw qoph", "zz")),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    val out = TA.langIdAssign(df, "doc_id", "text", "lang")
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang"),
      "assignment returns the input schema unchanged")
    val m = out.collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(m == Map(1L -> Some("aa"), 2L -> Some("zz"), 3L -> Some("aa"),
      4L -> Some("zz"), 5L -> None, 6L -> Some("zz")), s"got $m")
  }

  test("stripHtml: element bodies dropped, block tags become line breaks, " +
      "inline tags spaces, entities decoded in order, whitespace normalized") {
    val df = strDf("t", Seq(
      "<p>Hello <b>world</b></p>",
      // raw < inside the script body must not end the element early
      "<script>if (x < 2) { y(); }</script>after",
      "<style a=\"b\">p { x: 1 }</style>text",
      // &amp;lt; is a DOUBLE-escaped '<': single-pass unescape yields the
      // literal text "&lt;", never a tag-like "<"
      "a &amp;lt;b&amp;gt; c",
      "x &lt;i&gt; y &amp; z &nbsp;w &quot;q&quot; &#39;s&#39;",
      "  spaced\t\tout \n lines  ",
      // block structure survives as lines; <pre> is NOT a block tag here
      // and must not be eaten by the <p> alternative (the \b guard)
      "<h1>Title</h1><p>First para.</p><p>Second para.</p>",
      "a<pre>keep</pre>b<br>c"))
    val out = df.select(TA.stripHtml(col("t"))).collect().map(_.getString(0))
    assert(out(0) == "Hello world")
    assert(out(1) == "after")
    assert(out(2) == "text")
    assert(out(3) == "a &lt;b&gt; c")
    assert(out(4) == "x <i> y & z w \"q\" 's'")
    assert(out(5) == "spaced out\nlines")
    assert(out(6) == "Title\nFirst para.\nSecond para.")
    assert(out(7) == "a keep b\nc")
  }

  test("stripHtml law on 300 markup-free word soups: whitespace normalized " +
      "(no runs, no space-adjacent newlines, trimmed), content chars kept") {
    val rnd = new scala.util.Random(13)
    val texts = Seq.fill(300)(Seq.fill(1 + rnd.nextInt(20))(
      rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      .mkString(Seq(" ", "  ", "\n", "\t", " \n ")(rnd.nextInt(5))))
    val out = strDf("t", texts).select(col("t"),
      TA.stripHtml(col("t")).as("s")).collect()
    out.foreach { r =>
      val (in, s) = (r.getString(0), r.getString(1))
      assert(!s.contains("  ") && !s.contains(" \n") && !s.contains("\n "))
      assert(!s.contains("\t") && !s.contains("\n\n"))
      assert(s == s.trim)
      assert(s.filterNot(_.isWhitespace) == in.filterNot(_.isWhitespace),
        "non-whitespace content must pass through untouched")
    }
  }

  test("keepLine/filterLines: punctuation, min-words, and banned-phrase " +
      "rules; survivors keep their order") {
    import graft.operators.Curation
    val page = Seq(
      "This is a fine first sentence with many words.", // kept
      "Ends with punctuation!",                          // 3 words → drop
      "no terminal punctuation on this long line here",  // no punct → drop
      "Please enable JAVASCRIPT to see this content.",   // banned → drop
      "Our cookie policy applies to all visitors here.", // banned → drop
      "Does a question count as terminal punctuation?",  // kept
      "The closing sentence arrives at the very end.")   // kept
      .mkString("\n")
    val out = strDf("t", Seq(page))
      .select(Curation.filterLines(col("t"), 5)).collect()(0).getString(0)
    assert(out == Seq(
      "This is a fine first sentence with many words.",
      "Does a question count as terminal punctuation?",
      "The closing sentence arrives at the very end.").mkString("\n"))
    // zero survivors → empty string, not null
    val none = strDf("t", Seq("short.\nno punct line"))
      .select(Curation.filterLines(col("t"), 5)).collect()(0).getString(0)
    assert(none == "")
  }

  test("filterLines law on 200 randomized pages: output lines are exactly " +
      "the keepLine-passing input lines, in order") {
    import graft.operators.Curation
    val rnd = new scala.util.Random(17)
    def line(): String = {
      val words = Seq.fill(1 + rnd.nextInt(9))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      val punct = Seq(".", "!", "?", "", "x")(rnd.nextInt(5))
      val banned = if (rnd.nextInt(6) == 0) " javascript" else ""
      words.mkString(" ") + banned + punct
    }
    val pages = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(8))(line())
      .mkString("\n"))
    def keepRef(l: String): Boolean =
      l.nonEmpty && ".!?".contains(l.last) &&
        l.trim.split("\\s+").length >= 5 &&
        Curation.bannedLinePhrases.forall(p => !l.toLowerCase.contains(p))
    val out = strDf("t", pages)
      .select(col("t"), Curation.filterLines(col("t"), 5).as("f"))
      .collect()
    out.foreach { r =>
      val want = r.getString(0).split("\n", -1).filter(keepRef).mkString("\n")
      assert(r.getString(1) == want)
    }
  }

  test("mmrSelect law: 4 seeded random corpora match the driver greedy " +
      "reference pick-for-pick") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    (1 to 4).foreach { trial =>
      val vecs = (0 until 6).map(i =>
        i.toLong -> Seq.fill(3)(rnd.nextDouble() * 2 - 1)).toMap
      val qv = Seq.fill(3)(rnd.nextDouble() * 2 - 1)
      val out = Similarity.mmrSelect(
          vecs.toSeq.toDF("vec_id", "emb"),
          Seq((99L, qv)).toDF("q_id", "q_emb"),
          candK = 6, k = 3, lambda = 0.6, mu = 0.4)
        .orderBy("pick").collect().map(r => (r.getLong(2), r.getDouble(3)))
      val rel = vecs.map { case (id, v) => id -> cos(v, qv) }
      var picked = Vector.empty[(Long, Double)]
      (1 to 3).foreach { _ =>
        val cand = vecs.keySet -- picked.map(_._1)
        val scored = cand.toSeq.map { id =>
          val pen = if (picked.isEmpty) 0.0
            else picked.map(p => cos(vecs(id), vecs(p._1))).max
          (id, 0.6 * rel(id) - 0.4 * pen)
        }
        picked :+= scored.minBy { case (id, s) => (-s, id) }
      }
      assert(out.toSeq == picked, s"trial $trial")
    }
  }

  test("zipfFit: a planted 1/rank spectrum fits slope ~ -1 and matches a " +
      "driver-side OLS on the same quantized points") {
    import spark.implicits._
    // freq(r) = round(600/r) for 6 tokens -> near-perfect Zipf
    val freqs = (1 to 6).map(r => (s"tok$r", math.round(600.0 / r).toInt))
    val text = freqs.flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.zipfFit(docs, "doc_id", "text",
      topRanks = 6).collect().head
    assert(out.getAs[Long]("n_ranks") == 6L)
    val slope = out.getAs[Double]("slope")
    assert(slope > -1.02 && slope < -0.98, s"slope $slope")
    // driver-side OLS over the same ln-microunit quantization
    val pts = freqs.zipWithIndex.map { case ((_, c), i) =>
      (math.round(math.log(i + 1.0) * 1e6),
        math.round(math.log(c.toDouble) * 1e6))
    }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - want) < 1e-6, s"spark $slope vs driver $want")
  }

  test("mmrSelect matches a driver-side greedy MMR reference exactly " +
      "and diversifies away from near-clones") {
    import spark.implicits._
    // corpus: a near-clone pair along e0 and two progressively off-axis
    // vectors; query slightly off e0 so relevance != pairwise similarity
    val vecs = Map(
      10L -> Seq(1.0, 0.0, 0.0), 11L -> Seq(0.98, 0.05, 0.0),
      12L -> Seq(0.6, 0.8, 0.0), 13L -> Seq(0.5, 0.0, 0.9))
    val corpus = vecs.toSeq.toDF("vec_id", "emb")
    val qv = Seq(1.0, 0.1, 0.1)
    val qs = Seq((99L, qv)).toDF("q_id", "q_emb")
    val (lam, mu) = (0.5, 0.5)
    val out = Similarity.mmrSelect(corpus, qs, candK = 4, k = 3, lam, mu)
      .orderBy("pick").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    // driver-side reference with the same sequential-dot cosine
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val rel = vecs.map { case (id, v) => id -> cos(v, qv) }
    var picked = Vector.empty[(Long, Double)]
    (1 to 3).foreach { _ =>
      val cand = vecs.keySet -- picked.map(_._1)
      val scored = cand.toSeq.map { id =>
        val pen = if (picked.isEmpty) 0.0
          else picked.map(p => cos(vecs(id), vecs(p._1))).max
        (id, lam * rel(id) - mu * pen)
      }
      picked :+= scored.minBy { case (id, s) => (-s, id) }
    }
    assert(out.toSeq == picked,
      s"spark=${out.toSeq} reference=$picked")
    // and the near-clone of pick 1 must NOT be pick 2 despite having the
    // 2nd-best relevance — the diversity penalty must push it out
    assert(out(1)._1 != 10L && out(1)._1 != 11L)
  }

  test("textrankKeywords: a hub token co-occurring with everything ranks " +
      "first; short/stripped tokens never appear") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha Hub beta hub gamma HUB delta"),
      (2L, "epsilon hub zeta hub, eta"),
      (3L, "is at to of")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .textrankKeywords(docs, "doc_id", "text", minLen = 3, iters = 2,
        topN = 10)
      .collect()
    assert(out.head.getString(0) == "hub", out.map(_.getString(0)).toSeq)
    // every term survived the [a-z0-9] strip + length filter
    assert(out.forall(r => r.getString(0).matches("[a-z0-9]{3,}")))
    // stopword-only doc 3 contributes tokens but none beat the hub
    assert(out.map(_.getLong(1)).toSeq ==
      out.map(_.getLong(1)).sorted.reverse.toSeq)
  }

  test("retrieveRerank fails fast on column-name misuse") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta")).toDF("id", "text")
    val emb = Seq((1L, Seq(1.0, 0.0))).toDF("vid", "emb")
    // qIdCol == idCol would make the self-mask and candidate joins ambiguous
    val e1 = intercept[IllegalArgumentException] {
      TA.retrieveRerank(docs, "id", "text", docs, "id", "text",
        emb, "vid", "emb", candK = 5, topK = 3)
    }
    assert(e1.getMessage.contains("must differ"))
    // a caller column shadowing an internal name must be rejected by name
    val qs = Seq((2L, "alpha")).toDF("bm25", "qt")
    val e2 = intercept[IllegalArgumentException] {
      TA.retrieveRerank(docs, "id", "text", qs, "bm25", "qt",
        emb, "vid", "emb", candK = 5, topK = 3)
    }
    assert(e2.getMessage.contains("bm25"))
  }

  test("rrfFuse: a doc top-1 in both rankings is top-1 fused; a doc " +
      "absent from one list scores only its present term; score ties " +
      "break on the lower id") {
    import spark.implicits._
    // planted fixture (the spec-law discipline): doc 10 is rank 1 in
    // BOTH lists; 11/12 split the seconds; 13 appears only sparse-side,
    // 14 only dense-side at the same rank (tie -> lower id first)
    val sparse = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 13L, 3L))
      .toDF("q_id", "doc_id", "rnk")
    val dense = Seq((0L, 10L, 1L), (0L, 12L, 2L), (0L, 14L, 3L))
      .toDF("q_id", "doc_id", "rnk")
    val out = TA.rrfFuse(sparse, dense, "q_id", "doc_id", "rnk",
        topK = 10)
      .orderBy("rnk").collect()
    assert(out.head.getLong(2) == 10L,
      "top-1 in both rankings must fuse to top-1")
    assert(out.head.getDouble(5) == math.rint(
      (1.0 / 61 + 1.0 / 61) * 1e6) / 1e6)
    // 11 and 12 both carry exactly one 1/62 term -> tie, lower id first
    val pair = out.filter(r => Set(11L, 12L)(r.getLong(2)))
    assert(pair.map(_.getLong(2)).toSeq == Seq(11L, 12L))
    // single-list docs carry a NULL rank on the absent side
    val d13 = out.find(_.getLong(2) == 13L).get
    assert(d13.getLong(3) == 3L && d13.isNullAt(4))
    val d14 = out.find(_.getLong(2) == 14L).get
    assert(d14.isNullAt(3) && d14.getLong(4) == 3L)
    // 13 vs 14: same single term 1/63 -> tie, 13 first
    assert(out.map(_.getLong(2)).toSeq ==
      Seq(10L, 11L, 12L, 13L, 14L))
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.operators.Multimodal

  private def media = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "some fake image bytes".getBytes("UTF-8"), "image/png", 4, 4),
      Row(2L, Array.emptyByteArray, "image/png", 0, 0),
      Row(3L, null, null, null, null)),
    Multimodal.mediaSchema)

  test("extractMeta: byte length, emptiness, stable content hash") {
    val out = Multimodal.extractMeta(media).orderBy("media_id").collect()
    assert(out(0).getAs[Long]("n_bytes") == 21L)
    assert(!out(0).getAs[Boolean]("is_empty"))
    assert(out(0).getAs[String]("content_hash").matches("[0-9a-f]{64}"))
    assert(out(1).getAs[Boolean]("is_empty"))
    assert(out(2).getAs[Boolean]("is_empty")) // NULL payload → empty
  }

  test("decodeStub: deterministic frames with the declared schema") {
    val frames = Multimodal.decodeStub(media, framesPerItem = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "feature"))
    val rows = frames.collect().sortBy(f => (f.media_id, f.frame_no))
    assert(rows.length == 6) // 3 items × 2 frames, null payload included
    val again = Multimodal.decodeStub(media, framesPerItem = 2)
      .collect().sortBy(f => (f.media_id, f.frame_no))
    assert(rows.toSeq == again.toSeq) // stub is deterministic
  }

  /** Well-formed PCM-16 mono WAV bytes from a sample function. */
  private def wavBytes(nSamples: Int, sample: Int => Short): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val dataSize = nSamples * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    (0 until nSamples).foreach(i => buf.putShort(sample(i)))
    buf.array()
  }

  test("mediaInfo: canonical hand-built FLAC/MP4 headers parse to the " +
      "spec'd fields; malformed payloads report unknown; synth round-trips") {
    // 44.1 kHz stereo 16-bit STREAMINFO — the canonical byte pattern
    // (0x0A 0xC4 0x42) real FLAC encoders emit, built here by hand from
    // RFC 9639 §8.2 so the parser is pinned independently of synthMedia
    val flac = new Array[Byte](42)
    "fLaC".getBytes("US-ASCII").copyToArray(flac)
    flac(7) = 34 // type 0 (STREAMINFO), length 34
    flac(8 + 10) = 0x0a; flac(8 + 11) = 0xc4.toByte // rate 44100 hi bits
    flac(8 + 12) = 0x42 // rate low nibble 4, channels-1 = 1, bps-1 hi 0
    flac(8 + 13) = 0xf0.toByte // bps-1 low nibble 15 (16-bit), total hi 0
    flac(8 + 17) = 0x64 // total samples = 100
    val f = Multimodal.parseFlacStreamInfo(flac)
    assert(f.contains((44100L, 2L, 100L)))
    // QuickTime-default mvhd: timescale 600, duration 1800 → 3 s
    val mp4 = new Array[Byte](16 + 8 + 108)
    def w32(i: Int, x: Long): Unit = (0 to 3).foreach(k =>
      mp4(i + k) = ((x >> (24 - 8 * k)) & 0xff).toByte)
    w32(0, 16); "ftyp".getBytes.copyToArray(mp4, 4)
    "isom".getBytes.copyToArray(mp4, 8)
    w32(16, 116); "moov".getBytes.copyToArray(mp4, 20)
    w32(24, 108); "mvhd".getBytes.copyToArray(mp4, 28)
    w32(24 + 20, 600); w32(24 + 24, 1800)
    assert(Multimodal.parseMp4Mvhd(mp4).contains((600L, 1800L)))
    // canonical MP3: two CBR frames, 128 kbps stereo 44.1 kHz — the
    // 0xFF 0xFB 0x90 0x00 pattern real encoders emit; frame length 417
    val mp3 = new Array[Byte](2 * 417)
    Seq(0, 417).foreach { o =>
      mp3(o) = 0xff.toByte; mp3(o + 1) = 0xfb.toByte
      mp3(o + 2) = 0x90.toByte; mp3(o + 3) = 0x00
    }
    assert(Multimodal.parseMp3(mp3).contains((44100L, 2L, 2L * 1152L)))
    // an ID3v2 prefix (syncsafe size 0) is skipped, frames still parse
    val withId3 = ("ID3".getBytes("US-ASCII") ++ Array.fill(7)(0.toByte)
      ++ mp3)
    assert(Multimodal.parseMp3(withId3).contains((44100L, 2L, 2L * 1152L)))
    // a trailing 128-byte ID3v1 'TAG' block (the near-universal wild
    // case) is tolerated — frames count the same, tag bytes ignored
    val id3v1 = new Array[Byte](128)
    "TAG".getBytes("US-ASCII").copyToArray(id3v1)
    assert(Multimodal.parseMp3(mp3 ++ id3v1)
      .contains((44100L, 2L, 2L * 1152L)))
    assert(Multimodal.parseMp3(withId3 ++ id3v1)
      .contains((44100L, 2L, 2L * 1152L)))
    // but a trailer that is not exactly an ID3v1 block still fails the
    // frame-boundary walk (conservative drop, never a mis-parse)
    assert(Multimodal.parseMp3(mp3 ++ id3v1.take(127)).isEmpty)
    assert(Multimodal.parseMp3(mp3 ++ "TAGX".getBytes).isEmpty)
    // an UNTAGGED file whose audio bytes coincidentally read 'TAG' at
    // length-128 must still parse: the trimmed walk misaligns, the
    // full-length fallback decides (tag tolerance never costs a file
    // that parsed before)
    val falseTag = mp3.clone()
    "TAG".getBytes("US-ASCII").copyToArray(falseTag, falseTag.length - 128)
    assert(Multimodal.parseMp3(falseTag).contains((44100L, 2L, 2L * 1152L)))
    // totality: junk, truncation, wrong magic, torn frame boundary
    assert(Multimodal.parseFlacStreamInfo("fLaX junk".getBytes).isEmpty)
    assert(Multimodal.parseFlacStreamInfo(flac.take(20)).isEmpty)
    assert(Multimodal.parseMp4Mvhd(mp4.take(10)).isEmpty)
    assert(Multimodal.parseMp4Mvhd("garbage garbage!".getBytes).isEmpty)
    assert(Multimodal.parseMp3(mp3.take(500)).isEmpty)
    assert(Multimodal.parseMp3("garbage".getBytes).isEmpty)
    // the Spark path: synth payloads parse back to the id-derived fields
    import spark.implicits._
    val ids = (0L until 30L).toDF("doc_id")
    val out = Multimodal.mediaInfo(Multimodal.synthMedia(ids, "doc_id"))
      .collect().map(m => m.media_id -> m).toMap
    assert(out.size == 30)
    (0L until 30L).foreach { id =>
      val m = out(id); val v = id / 3
      if (id % 3 == 0) {
        assert(m.container == "flac")
        assert(m.sample_rate_hz.contains(
          Seq(8000L, 16000L, 22050L, 44100L)((v % 4).toInt)))
        assert(m.channels.contains(1 + v % 2))
        assert(m.duration_ms == (1 + v % 5) * 1000)
      } else if (id % 3 == 2) {
        assert(m.container == "mp3")
        assert(m.sample_rate_hz.contains(44100L))
        assert(m.channels.contains(2L))
        assert(m.duration_ms == (20 + 10 * (v % 5)) * 1152L * 1000 / 44100)
      } else {
        assert(m.container == "mp4" && m.sample_rate_hz.isEmpty)
        assert(m.duration_ms == (2 + v % 4) * 1000)
      }
    }
    // duration arithmetic on the hand headers: 100 samples @44.1k → 2 ms
    val handDf = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, flac, null, null, null),
        org.apache.spark.sql.Row(2L, mp4, null, null, null),
        org.apache.spark.sql.Row(3L, null, null, null, null)),
      Multimodal.mediaSchema)
    val hand = Multimodal.mediaInfo(handDf)
      .collect().map(m => m.media_id -> m).toMap
    assert(hand(1L).duration_ms == 100L * 1000 / 44100)
    assert(hand(2L).duration_ms == 3000L)
    assert(hand(3L).container == "unknown" && hand(3L).duration_ms == 0L)
  }

  test("decodeWav: REAL PCM decode — sine RMS ≈ A/√2, silence is 0, junk emits nothing") {
    val amp = 16384 // half full-scale → normalized amplitude 0.5
    val sine = wavBytes(8000,
      i => (amp * math.sin(2 * math.Pi * 440 * i / 8000.0)).toShort)
    val silence = wavBytes(4000, _ => 0.toShort)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, sine, "audio/wav", null, null),
        Row(2L, silence, "audio/wav", null, null),
        Row(3L, "not a wav at all, just text bytes padded to length 44+"
          .getBytes("UTF-8"), "text/plain", null, null),
        Row(4L, null, null, null, null)),
      Multimodal.mediaSchema)
    val frames = Multimodal.decodeWav(df, framesPerItem = 4)
      .collect().sortBy(f => (f.media_id, f.frame_no))
    // junk and NULL payloads decode to nothing; the two WAVs give 4 frames
    assert(frames.map(_.media_id).toSeq == Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L))
    assert(frames.forall(_.n_samples > 0))
    // a full-scale-0.5 sine has RMS 0.5/√2 ≈ 0.35355 in every window that
    // holds whole cycles (2000 samples = 110 cycles exactly at 440/8000)
    frames.filter(_.media_id == 1L).foreach(f =>
      assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 1e-3, f.toString))
    frames.filter(_.media_id == 2L).foreach(f => assert(f.rms == 0.0))
  }

  test("decodeBmp/resizeBmp: REAL image decode — luma law, round-trip, resize picks source pixels") {
    // 2×2 BMP, top-down logical pixels: red, green / blue, white
    val rgb = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val bmp = Multimodal.writeBmp24(2, 2, rgb)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, bmp, "image/bmp", 2, 2),
        Row(2L, "jpeg bytes pretending, long enough to pass the length gate padding padding"
          .getBytes("UTF-8"), "image/jpeg", null, null)),
      Multimodal.mediaSchema)
    val stats = Multimodal.decodeBmp(df).collect()
    assert(stats.map(_.media_id).toSeq == Seq(1L)) // junk emits nothing
    val s = stats.head
    assert(s.width == 2 && s.height == 2)
    // Rec.601 luma: (76.245 red + 149.685 green + 29.07 blue + 255 white)/4
    val want = (0.299 * 255 + 0.587 * 255 + 0.114 * 255 + 255.0) / 4
    assert(math.abs(s.mean_luma - want) < 1e-9)

    // resize 2×2 → 1×1: nearest-neighbour maps (0,0) → the top-left (red)
    val small = Multimodal.resizeBmp(df, 1, 1)
    val rows = small.orderBy("media_id").collect()
    assert(rows(1).isNullAt(1)) // non-BMP resizes to NULL
    val one = Multimodal.decodeBmp(
      spark.createDataFrame(java.util.Arrays.asList(
        Row(1L, rows(0).getAs[Array[Byte]](1), "image/bmp", 1, 1)),
        Multimodal.mediaSchema)).collect().head
    assert(one.width == 1 && one.height == 1)
    assert(math.abs(one.mean_luma - 0.299 * 255) < 1e-9) // the red pixel
  }

  test("dHash56 is codec-agnostic (BMP and PNG of identical pixels hash " +
      "equal); imageNearDups finds planted twins, drops junk, and a " +
      "1-byte perturbation flips at most one bit") {
    val rgb = Array.tabulate(192)(i => ((i * 37 + 11) % 256).toByte)
    val bmp = Multimodal.writeBmp24(8, 8, rgb)
    // the same pixels through a genuinely compressed codec
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val s = (y * 8 + x) * 3
      img.setRGB(x, y, ((rgb(s) & 0xff) << 16) | ((rgb(s + 1) & 0xff) << 8) |
        (rgb(s + 2) & 0xff))
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val hb = Multimodal.dHash56Bytes(bmp).get
    val hp = Multimodal.dHash56Bytes(baos.toByteArray).get
    assert(hb == hp, "PNG and BMP of identical pixels must hash identically")
    assert(hb >= 0L, "56-bit hash stays in the positive long range")

    val pert = rgb.clone()
    pert(0) = (((pert(0) & 0xff) + 8) % 256).toByte
    val hq = Multimodal.dHash56Bytes(Multimodal.writeBmp24(8, 8, pert)).get
    assert(java.lang.Long.bitCount(hb ^ hq) <= 1,
      "a pixel-(0,0) red bump touches only the row-0 x=0 gradient")

    val other = Array.tabulate(192)(i => ((i * 101 + 7) % 256).toByte)
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, bmp, "image/bmp", 8, 8),
        Row(2L, Multimodal.writeBmp24(8, 8, pert), "image/bmp", 8, 8),
        Row(3L, bmp, "image/bmp", 8, 8), // exact copy of 1
        Row(4L, Multimodal.writeBmp24(8, 8, other), "image/bmp", 8, 8),
        Row(5L, "junk bytes, not an image at all".getBytes("UTF-8"),
          null, null, null),
        Row(6L, null, null, null, null)),
      Multimodal.mediaSchema)
    val pairs = Multimodal.imageNearDups(media, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(t => (t._1, t._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"twins and the exact copy pair up, unrelated/junk/null do not: " +
        s"${pairs.toSeq}")
    assert(pairs.find(p => p._1 == 1L && p._2 == 3L).get._3 == 0L,
      "the exact copy sits at Hamming 0")
  }

  test("decodeImage: REAL compressed decode via the JDK's bundled PNG/JPEG codecs") {
    import java.awt.image.BufferedImage
    // 2×2 image with known pixels, encoded to genuinely-compressed bytes
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    def encode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val png = encode("png")
    val jpg = encode("jpg")
    // PNG really is compressed/filtered — not a raw pixel dump
    assert(!png.sameElements(jpg))
    assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, png, "image/png", 2, 2),
        Row(2L, jpg, "image/jpeg", 2, 2),
        Row(3L, "definitely not an image, but long enough to look like one"
          .getBytes("UTF-8"), "image/png", null, null)),
      Multimodal.mediaSchema)
    val stats = Multimodal.decodeImage(df).collect()
      .map(s => s.media_id -> s).toMap
    assert(stats.keySet == Set(1L, 2L)) // junk emits nothing, never throws
    val want = (0.299 * 255 + 0.587 * 255 + 0.114 * 255 + 255.0) / 4
    // PNG is lossless: exact luma law, exact dimensions
    assert(stats(1L).width == 2 && stats(1L).height == 2)
    assert(math.abs(stats(1L).mean_luma - want) < 1e-9)
    // JPEG is lossy: same dimensions, luma within DCT quantization error
    assert(stats(2L).width == 2 && stats(2L).height == 2)
    assert(math.abs(stats(2L).mean_luma - want) < 40.0,
      s"jpeg luma ${stats(2L).mean_luma} vs $want")
  }

  test("media-stats law: the q_media_stats histogram conserves the " +
      "corpus, and mediaGate thresholds READ OFF it are data-derived — " +
      "the global envelope admits everything, a cell-level cap admits " +
      "a count the stats cells bound exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = 90L
    val media = Multimodal.synthMedia((0L until n).toDF("doc_id"), "doc_id")
      .persist()
    val info = Multimodal.mediaInfo(media).toDF().persist()
    val cells = info
      .groupBy(col("container"),
        (col("duration_ms") / 1000).cast("long").as("dur_s"))
      .agg(count(lit(1)).as("n"), min("duration_ms").as("min_ms"),
        max("duration_ms").as("max_ms"))
      .collect()
      .map(r => (r.getAs[String]("container"), r.getAs[Long]("n"),
        r.getAs[Long]("min_ms"), r.getAs[Long]("max_ms")))
    // conservation: every synth payload parses into exactly one cell
    assert(cells.map(_._2).sum == n)
    assert(cells.map(_._1).toSet == Set("flac", "mp4", "mp3"))
    // derivation 1: the table's global envelope admits the whole corpus
    val lo = cells.map(_._3).min
    val hi = cells.map(_._4).max
    assert(graft.streaming.Streams.mediaGate(media, lo, hi).count() == n)
    // derivation 2: cap at the median cell max — the stats cells bound
    // the admitted count exactly (cells fully under the cap are all in;
    // cells starting above it are all out), and the gate lands inside
    val cap = cells.map(_._4).sorted.apply(cells.length / 2)
    val atLeast = cells.filter(_._4 <= cap).map(_._2).sum
    val atMost = cells.filter(_._3 <= cap).map(_._2).sum
    val admitted = graft.streaming.Streams.mediaGate(media, lo, cap).count()
    assert(admitted >= atLeast && admitted <= atMost,
      s"admitted=$admitted not in stats-derived [$atLeast, $atMost]")
    // and the cap genuinely cuts — thresholds change admission
    assert(admitted < n)
    media.unpersist(); info.unpersist()
  }
}

/** Fixture-level invariants of the registered curation queries (the
  * behavioral complement to their DuckDB oracles and PlanSpec pins). */
class CurationQuerySpec extends SparkSpec {

  test("dsirWeights ranks target-vocabulary docs above disjoint-vocab " +
      "docs; n_feats counts unigrams + bigrams; every doc is scored") {
    import graft.operators.Curation
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        // target subcorpus: shared fruit vocabulary
        Row(1L, "apple banana cherry apple banana", "en"),
        Row(2L, "banana apple apple cherry apple", "en"),
        // raw-only docs: one target-like, one disjoint
        Row(3L, "apple banana apple cherry banana", "fr"),
        Row(4L, "zulu yankee xray whiskey victor", "fr"),
        Row(5L, null, "fr")),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))))
    val out = Curation.dsirWeights(df, "doc_id", "text",
      col("lang") === lit("en"), nBuckets = 256).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // null-text doc 5 is unscorable; everyone else gets a weight
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // 5 unigrams + 4 bigrams
    assert(out.values.forall(_._1 == 9L))
    // the target-like raw doc must importance-rank above the disjoint one
    assert(out(3L)._2 > out(4L)._2,
      s"target-vocab doc must outrank disjoint vocab: $out")
    // disjoint-vocab features are raw-only: every bucket term is
    // ln(1) - ln(cr+1) + pen < pen, so its weight sits below n·pen
    assert(out(4L)._2 < out(3L)._2 && out(1L)._2 > out(4L)._2)
  }

  test("leakage-free split: near-dup cluster members never straddle " +
      "splits, and both splits are non-trivial on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val split = SparkEntry.queries("q_split_leakfree")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the leakage invariant: every near-dup edge joins two docs of the
    // SAME split (train/val gate on the shared cluster label)
    val edges = SparkEntry.queries("q_dedup_cluster")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "fixture must contain near-dup clusters")
    edges.foreach { case (id, comp) =>
      assert(split(id)._1 == split(comp)._1 && split(id)._2 == split(comp)._2,
        s"doc $id (split ${split(id)}) split away from its cluster $comp " +
          s"(${split(comp)})")
    }
    // and the gate actually splits: both sides populated at sf0.001
    val sides = split.values.map(_._2).toSet
    assert(sides == Set("train", "val"), s"degenerate split: $sides")
  }

  test("token windows tile exactly: every window except each source's " +
      "last sums to 128 tokens with gapless spans, and every doc's " +
      "pieces add up to its token count") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_token_windows")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case ((src, w), rs) =>
      val lastW = rows.filter(_._1 == src).map(_._2).max
      val total = rs.map(_._5).sum
      if (w < lastW) assert(total == 128L, s"$src window $w holds $total")
      else assert(total <= 128L)
      // spans tile the window without gaps or overlap, in doc order
      val sorted = rs.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4,
          s"$src window $w: gap between ${a._3} and ${b._3}")
        case _ =>
      }
    }
    // carryover actually happens on the fixture, and pieces reassemble
    val byDoc = rows.groupBy(_._3)
    assert(byDoc.values.exists(_.length > 1), "no doc crossed a boundary")
    val toks = SparkEntry.queries("q_token_count")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens_ws")).toMap
    byDoc.foreach { case (d, rs) =>
      assert(rs.map(_._5).sum == toks(d), s"doc $d pieces do not reassemble")
    }
  }

  test("split audit: the leak-free gate reports ZERO leaky val docs by " +
      "construction; the naive per-doc gate is the one that leaks") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_split_audit")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("naive", "leakfree"))
    assert(rows("leakfree")._2 == 0L,
      "an edge's two ends share a cluster label, hence a gate key — a " +
        "leak here means the gate stopped keying on the component")
    assert(rows("leakfree")._1 > 0L, "val side must be populated")
    // the naive gate's count is whatever the fixture yields (possibly 0
    // at this SF) — the audit only has to agree with the oracle there
  }

  test("perplexity buckets: per language the tertiles cover every scored " +
      "doc, sizes differ by at most one, and score ranges do not overlap") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_ppl_bucket")(spark, dir).collect()
    val scored = SparkEntry.queries("q_lm_score")(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scored,
      "every doc with a score must land in exactly one bucket")
    rows.groupBy(_.getString(0)).foreach { case (lang, bs) =>
      assert(bs.length == 3, s"$lang: expected 3 tertiles")
      val sizes = bs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$lang: uneven tertiles $sizes")
      // ntile ordered by score desc → bucket k's min >= bucket k+1's max
      val byB = bs.sortBy(_.getAs[Long]("bucket"))
      byB.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi.getAs[Double]("min_logp") >= lo.getAs[Double]("max_logp"),
          s"$lang: bucket ranges overlap")
      }
    }
  }

  test("URL host stats canonicalize case and www., and count documents " +
      "distinctly per host") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_url_stats")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_urls")))
      .toMap
    val nDocs = SparkEntry.queries("q_token_count")(spark, dir).count()
    // every doc seeds one www.example.com URL → canonical host example.com
    // with n_docs == corpus size; the mixed-case CDN hosts fold to
    // lowercase shards
    assert(rows.keySet.forall(h => h == h.toLowerCase && !h.startsWith("www.")),
      s"non-canonical hosts: ${rows.keySet}")
    assert(rows("example.com") == (nDocs, nDocs), rows("example.com").toString)
    val cdn = rows.keys.filter(_.startsWith("cdn")).toSeq.sorted
    assert(cdn == (0 until 7).map(i => s"cdn$i.example.org"), cdn.toString)
    assert(cdn.map(h => rows(h)._1).sum == nDocs,
      "each doc seeds exactly one CDN shard URL")
  }

  test("q_curate_explain attributes each doc to the FIRST dropping stage " +
      "on a planted fixture: low_quality, duplicate (with survivor id), " +
      "contaminated, kept — and funnel order wins on overlap") {
    val long = (1 to 25).map(i => s"tok$i").mkString(" ")
    val benchText = (1 to 25).map(i => s"bench$i").mkString(" ")
    // 5 = contaminated (shares a 4-gram run with bench); 6 = BOTH a
    // duplicate of 1 and quality-passing — duplicate must win over any
    // later stage; 7 = short AND a near-copy — low_quality must win
    val dir = java.nio.file.Files.createTempDirectory("explain").toString
    spark.createDataFrame(java.util.Arrays.asList(
        Row(1L, long, "en", "src1", long.length.toLong),
        Row(2L, "too short", "en", "src1", 9L),
        Row(5L, s"$long bench1 bench2 bench3 bench4", "en", "src2", 0L),
        Row(6L, long.toUpperCase.replace(" ", "  "), "en", "src3", 0L),
        Row(7L, "tiny", "en", "src1", 4L),
        Row(8L, null, "en", "src1", 0L),
        Row(90L, benchText, "en", "src19", 0L)),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))))
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_curate_explain")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1L) == ("kept", -1L))
    assert(out(2L) == ("low_quality", -1L))
    assert(out(5L) == ("contaminated", -1L))
    // 6 normalizes (lowercase + whitespace) to doc 1's fingerprint: the
    // duplicate verdict names the survivor
    assert(out(6L) == ("duplicate", 1L), out(6L).toString)
    assert(out(7L) == ("low_quality", -1L))
    // NULL text is quality-dropped (the e2e funnel excludes it from
    // n_quality) — the null gate verdict must not fall through to kept
    assert(out(8L) == ("low_quality", -1L))
    assert(!out.contains(90L), "bench docs are not funnel candidates")
  }
}
