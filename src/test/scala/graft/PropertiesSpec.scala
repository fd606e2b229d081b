package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws (SURVEY §5.2) over the driver-side compiler —
  * resolution precedence, downgrade totality, mask length laws. */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val strategyNames =
    Gen.oneOf("KEEP", "SET_NULL", "REDACT", "HASH_SHA256", "TRUNCATE",
      "EMAIL_FAKE", "SCRAMBLE", "")
  private val groups = Gen.oneOf(TypeGroup.STRING, TypeGroup.NUMBER,
    TypeGroup.BOOLEAN, TypeGroup.DATE, TypeGroup.JSON, TypeGroup.UUID,
    TypeGroup.OTHER)

  test("normalize is total and idempotent for any strategy × type group") {
    check(Prop.forAll(strategyNames, groups) { (name, g) =>
      val st = Strategy.parse(name)
      val once = Strategies.normalize(st, g)
      Strategies.normalize(once, g) == once
    })
  }

  test("normalize never emits a strategy that violates the type rules") {
    check(Prop.forAll(strategyNames, groups) { (name, g) =>
      Strategies.normalize(Strategy.parse(name), g) match {
        case Strategy.EmailFake | Strategy.Redact | Strategy.Truncate =>
          g == TypeGroup.STRING
        case Strategy.HashSha256 =>
          g == TypeGroup.STRING || g == TypeGroup.OTHER
        case _ => true
      }
    })
  }

  test("maskSampleStr length law: len>6 → exactly 7 chars, len in 1..6 → ***") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val m = ConfigIO.maskSampleStr(s)
      if (s.isEmpty) m == s
      else if (s.length <= 6) m == "***"
      else m.length == 7 && m.startsWith(s.take(2)) && m.endsWith(s.takeRight(2))
    })
  }

  test("resolution precedence: explicit rule always beats the global map") {
    val gen = for {
      colName <- Gen.alphaStr.suchThat(_.nonEmpty)
      explicit <- strategyNames.suchThat(_.nonEmpty)
      globalStrat <- strategyNames.suchThat(_.nonEmpty)
    } yield (colName, explicit, globalStrat)
    check(Prop.forAll(gen) { case (c, ex, g) =>
      val resolved = Planner.resolveStrategy(c,
        Seq(ColumnRule(c, Some(ex))), Seq(g -> Seq(c)))
      resolved.strategy == Strategy.parse(ex)
    })
  }

  test("resolution is KEEP whenever nothing matches") {
    check(Prop.forAll(Gen.alphaStr.suchThat(_.nonEmpty)) { c =>
      Planner.resolveStrategy(c, Seq(ColumnRule(c)), Nil)
        .strategy == Strategy.Keep
    })
  }

  test("parse round-trips every builtin name and tags the rest Unknown") {
    check(Prop.forAll(strategyNames) { name =>
      Strategy.parse(name) match {
        case Strategy.Unknown(raw) => raw == name &&
          !Strategy.builtins.exists(_.name == name)
        case st => st.name == name
      }
    })
  }

  // --- TopKAgg: driver-side merge laws (no Spark session needed) ---

  private val scoredList: Gen[List[(Double, Long)]] = Gen.listOf(
    for {
      s <- Gen.chooseNum(0, 20).map(_ / 2.0) // coarse scores force ties
      id <- Gen.chooseNum(0L, 50L)
    } yield (s, id))

  test("TopKAgg.merge equals brute-force sorted-take over any two buffers") {
    val agg = new graft.functions.TopKAgg(5)
    def buf(xs: List[(Double, Long)]) =
      xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    check(Prop.forAll(scoredList, scoredList) { (xs, ys) =>
      // brute force: all elements, descending (score, id), top 5.
      // buffers may hold duplicate (score,id) pairs — so does the
      // brute-force reference (no distinct; duplicates rank adjacently)
      val want = (xs ++ ys).sortBy { case (s, id) => (-s, -id) }.take(5)
      agg.merge(buf(xs), buf(ys)) == want
    })
  }

  test("TopKAgg buffers never exceed k and stay descending") {
    val agg = new graft.functions.TopKAgg(3)
    check(Prop.forAll(scoredList) { xs =>
      val b = xs.foldLeft(agg.zero)((acc, x) => agg.reduce(acc, x))
      b.length <= 3 &&
        b.sliding(2).forall {
          case Seq((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 >= i2)
          case _ => true
        }
    })
  }

  test("FreqItemsAgg: the Misra-Gries bounds hold on random zipf-ish " +
      "streams under ANY chunking and merge order") {
    // The MG guarantee — est ≤ true, est ≥ true − N/(k+1), every key
    // above N/(k+1) present, buffer ≤ k — must survive arbitrary
    // partial-aggregate boundaries and merge orders (what Spark's
    // partitioning does to the stream). Random chunk sizes + shuffled
    // merges probe exactly that.
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 12) {
      val k = 4 + rnd.nextInt(8)
      val n = 500 + rnd.nextInt(1500)
      val stream = Seq.fill(n) {
        val r = rnd.nextInt(100)
        if (r < 40) "a" else if (r < 60) "b" else if (r < 72) "c"
        else s"t${rnd.nextInt(40)}"
      }
      val truth = stream.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong
      }
      val agg = new graft.functions.FreqItemsAgg(k)
      val partials = stream.grouped(1 + rnd.nextInt(50)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val sketch = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      val bound = n / (k + 1)
      assert(sketch.size <= k, s"k=$k buffer ${sketch.size}")
      sketch.foreach { case (t, est) =>
        assert(est <= truth(t), s"overcount: $t est=$est true=${truth(t)}")
        assert(est >= truth(t) - bound,
          s"undercount past N/(k+1): $t est=$est true=${truth(t)} bound=$bound")
      }
      truth.foreach { case (t, c) =>
        if (c > bound)
          assert(sketch.contains(t), s"heavy key $t (n=$c > $bound) missing")
      }
    }
    // null keys are ignored (a null map key cannot cross the Catalyst
    // encoder; "how often is NULL" is a count(*) question)
    val agg = new graft.functions.FreqItemsAgg(4)
    val withNulls = Seq("a", null, "a", null, "b")
      .foldLeft(agg.zero)(agg.reduce)
    assert(withNulls == Map("a" -> 2L, "b" -> 1L))
  }

  test("BMP codec law: writeBmp24 ∘ parseBmp24 is pixel-identity for any " +
      "size (including the padded non-multiple-of-4 row widths)") {
    import graft.operators.Multimodal
    val gen = for {
      w <- Gen.choose(1, 13)
      h <- Gen.choose(1, 13)
      px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, px.map(_.toByte).toArray)
    check(Prop.forAll(gen) { case (w, h, rgb) =>
      Multimodal.parseBmp24(Multimodal.writeBmp24(w, h, rgb)) match {
        case Some((pw, ph, prgb)) =>
          pw == w && ph == h && prgb.sameElements(rgb)
        case None => false
      }
    })
  }

  test("media container parsers are TOTAL on arbitrary bytes (never " +
      "throw, never mis-magic), including adversarial prefixes") {
    import graft.operators.Multimodal
    val anyBytes = Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
    // seed some adversarial prefixes in front of random tails: right
    // magic + torn body is the case a naive parser throws on
    val seeded = for {
      prefix <- Gen.oneOf("fLaC", "ID3", "ÿû", "....ftyp",
        "....moov", "")
      tail <- anyBytes
    } yield prefix.getBytes("ISO-8859-1") ++ tail
    check(Prop.forAll(Gen.oneOf(anyBytes, seeded)) { bytes =>
      // totality: each parser returns an Option, never throws; and a
      // successful parse implies the magic actually matched
      val f = Multimodal.parseFlacStreamInfo(bytes)
      val m = Multimodal.parseMp4Mvhd(bytes)
      val p = Multimodal.parseMp3(bytes)
      f.forall(_ => bytes.length >= 4 && bytes(0) == 'f') &&
        m.forall(_ => bytes.length >= 8 &&
          new String(bytes, 4, 4, "US-ASCII") == "ftyp") &&
        p.forall(_ => bytes.length >= 4)
    })
  }

  test("dHash laws: total + deterministic on any 8×8 image, one perturbed " +
      "pixel flips ≤ 2 bits, and ANY pair within Hamming 3 shares a " +
      "clean 14-bit band (the pigeonhole the near-dup join relies on)") {
    import graft.operators.Multimodal
    val img = Gen.listOfN(192, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)
    val tweak = for {
      rgb <- img
      i <- Gen.choose(0, 191)
      d <- Gen.choose(1, 255)
    } yield (rgb, i, d)
    check(Prop.forAll(tweak) { case (rgb, i, d) =>
      val h1 = Multimodal.dHash56Bytes(Multimodal.writeBmp24(8, 8, rgb)).get
      val h1b = Multimodal.dHash56Bytes(Multimodal.writeBmp24(8, 8, rgb)).get
      val p = rgb.clone(); p(i) = (((p(i) & 0xff) + d) % 256).toByte
      val h2 = Multimodal.dHash56Bytes(Multimodal.writeBmp24(8, 8, p)).get
      // a pixel (x,y) feeds at most the (x−1,y) and (x,y) gradients
      h1 == h1b && h1 >= 0L && java.lang.Long.bitCount(h1 ^ h2) <= 2
    })
    // pigeonhole: ≤ 3 flipped bits leave ≥ 1 of the 4 bands untouched
    val flips = for {
      h <- Gen.choose(0L, (1L << 56) - 1)
      n <- Gen.choose(0, 3)
      bits <- Gen.listOfN(n, Gen.choose(0, 55))
    } yield (h, bits)
    check(Prop.forAll(flips) { case (h, bits) =>
      val h2 = bits.foldLeft(h)((a, b) => a ^ (1L << b))
      (0 until 4).exists(b =>
        ((h >> (b * 14)) & 0x3fff) == ((h2 >> (b * 14)) & 0x3fff))
    })
  }
}
