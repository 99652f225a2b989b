package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away today"
  private def nearDup = base.replace("today", "tonight") // one-token change

  private lazy val docs = Seq(
    (0L, base),
    (1L, base),                      // exact dup of 0
    (2L, nearDup),                   // near dup of 0
    (3L, "completely different text about spark sql shuffle partitions and joins"),
    (4L, "another unrelated document mentioning encoder serialization formats")
  ).toDF("id", "text")

  test("exactDedup keeps one representative per content group (lowest id)") {
    val out = Dedup.exactDedup(docs, "text", "id")
    assert(out.count() == 4)
    assert(out.filter($"text" === base).select("id").as[Long].head() == 0L)
  }

  test("exactDupStats histogram") {
    val stats = Dedup.exactDupStats(docs, "text")
      .orderBy("group_size").as[(Long, Long)].collect().toList
    assert(stats == List((1L, 3L), (2L, 1L)))
  }

  test("shingles produce positional word n-grams") {
    val sh = docs.filter($"id" === 3).select(Dedup.shingles($"text", 3))
      .as[Seq[String]].head()
    assert(sh.head == "completely different text")
    assert(sh.last == "partitions and joins")
    assert(sh.size == 10 - 2)
  }

  test("minhash: exact dups agree on every signature; near dups on most") {
    val sigBase = Dedup.minhashSig(Seq("a b c", "b c d", "c d e"), 64)
    assert(sigBase == Dedup.minhashSig(Seq("a b c", "b c d", "c d e"), 64))
    val cands = Dedup.minhashCandidates(docs, "id", "text", shingleSize = 3, k = 64, bands = 16)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(cands((0L, 1L)) == 1.0) // exact dup: all positions agree
    assert(cands.getOrElse((0L, 2L), 0.0) > 0.5) // near dup: most positions agree
    assert(!cands.contains((3L, 4L))) // unrelated docs: no band collision
  }

  test("minhashCandidatePairs matches minhashCandidates' pair set") {
    val slim = Dedup.minhashCandidatePairs(docs, "id", "text", shingleSize = 3, k = 64, bands = 16)
      .as[(Long, Long)].collect().toSet
    val full = Dedup.minhashCandidates(docs, "id", "text", shingleSize = 3, k = 64, bands = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(slim == full && slim.nonEmpty)
  }

  test("degenerate boilerplate bucket is capped: drops logged, near-dups elsewhere survive") {
    // 30 identical boilerplate docs → every band puts all 30 in ONE
    // bucket; with maxBucket below that the bucket is dropped (logged)
    // instead of exploding into a 30² self-join group, while pairs in
    // small buckets are unaffected
    val boiler = (100L until 130L).map(i => (i, base + " boilerplate footer"))
    val corpus = (boiler ++ Seq((0L, base), (2L, nearDup))).toDF("id", "text")
    // other suites share the session and may legitimately hold caches —
    // assert these calls PIN no new cache entries (the round-2 leak): the
    // default path's only additions are the result's own local-checkpoint
    // blocks, which the ContextCleaner owns (dropped when the frame is
    // GC'd) — a forgotten persist() would show up as a non-checkpoint entry
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val capped = Dedup.minhashCandidatePairs(corpus, "id", "text",
      shingleSize = 3, k = 64, bands = 16, maxBucket = 20)
      .as[(Long, Long)].collect().toSet
    assert(!capped.exists(p => p._1 >= 100L && p._2 >= 100L)) // clique dropped
    assert(capped.contains((0L, 2L))) // real near-dup pair survives
    assert(spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !cachedBefore.contains(id) }
      .values.forall(_.isCheckpointed), "a non-checkpoint cache entry leaked")
    // stagePath variant produces the identical pair set with NO new
    // entries of any kind (parquet is the materialization)
    val cachedBefore2 = spark.sparkContext.getPersistentRDDs.keySet
    val stage = graft.TestSpark.tempDir("minhash-stage") + "/cands.parquet"
    val staged = Dedup.minhashCandidatePairs(corpus, "id", "text",
      shingleSize = 3, k = 64, bands = 16, maxBucket = 20, stagePath = stage)
      .as[(Long, Long)].collect().toSet
    assert(staged == capped)
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(cachedBefore2))
  }

  test("simhash: identical docs at distance 0, near dups close, others far") {
    val pairs = Dedup.simhashPairs(docs, "id", "text", maxDist = 10)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs.get((0L, 2L)).exists(_ <= 10))
  }

  test("null text rows flow through dedup/fingerprint ops without failing") {
    // SEVERAL degenerate rows: null text and punctuation-only (tokenless)
    // text — they must neither crash nor pair with each other (empty docs
    // all hash identically, so keeping them would emit a quadratic clique
    // of bogus hamming-0 'near-dups')
    val withNull = docs.unionByName(Seq(
      (5L, null.asInstanceOf[String]),
      (6L, null.asInstanceOf[String]),
      (7L, "!!! ??? ...")).toDF("id", "text"))
    val degenerate = Set(5L, 6L, 7L)
    val mh = Dedup.minhashCandidatePairs(withNull, "id", "text",
      shingleSize = 3, k = 64, bands = 16).as[(Long, Long)].collect().toSet
    val mhClean = Dedup.minhashCandidatePairs(docs, "id", "text",
      shingleSize = 3, k = 64, bands = 16).as[(Long, Long)].collect().toSet
    assert(mh == mhClean)
    val sp = Dedup.simhashPairs(withNull, "id", "text", maxDist = 10)
      .as[(Long, Long, Int)].collect()
    assert(sp.exists(r => (r._1, r._2) == (0L, 1L))) // real pairs unaffected
    assert(!sp.exists(r => degenerate(r._1) || degenerate(r._2)))
    val nj = Dedup.ngramJaccardPairs(withNull, "id", "text", n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(!nj.exists(r => r._1 == 5L || r._2 == 5L))
    val fp = withNull.select($"id", TextOps.fingerprint($"text").as("f"))
      .as[(Long, Long)].collect().toMap
    assert(fp.contains(5L)) // fingerprint of the empty stream, not a crash
  }

  test("simhashPairs maxDist=0 stays an equi-join and finds only identical hashes") {
    val pairs = Dedup.simhashPairs(docs, "id", "text", maxDist = 0)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.contains((0L, 1L))) // exact dup: identical simhash
    assert(pairs.values.forall(_ == 0))
  }

  test("ngram jaccard: exact dup = 1.0, near dup high, others below threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, "id", "text", n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.contains((3L, 4L)))
  }

  // ---- similarity ----

  private lazy val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (1L, Seq(0.999, 0.04, 0.0)), // nearly parallel to 0
    (2L, Seq(0.0, 1.0, 0.0)),
    (3L, Seq(0.0, 0.0, 1.0)),
    (4L, Seq(-1.0, 0.0, 0.0))
  ).toDF("vec_id", "vec")

  test("cosine column expression computes the expected values") {
    val c = vecs.filter($"vec_id" === 0).crossJoin(
        vecs.filter($"vec_id" === 4).select($"vec".as("vec2")))
      .select(Similarity.cosine($"vec", $"vec2").as("c")).as[Double].head()
    assert(math.abs(c - (-1.0)) < 1e-12)
  }

  test("bruteForceTopK ranks the nearly-parallel vector first") {
    val res = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "vec", 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(res(0)._3 == 1L) // rank 1 = the near-parallel vector
    assert(res(0)._4 > 0.99)
  }

  test("lshTopK finds the same nearest neighbor as brute force for near dups") {
    val res = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "vec", 1,
      bits = 4, tables = 8)
    val top = res.as[(Long, Int, Long, Double)].collect()
    assert(top.nonEmpty && top.head._3 == 1L)
  }

  test("slim LSH pair/attach decomposition reproduces the attached candidate sets") {
    val q = vecs.filter($"vec_id" === 0)
    val attached = Similarity.lshCandidates(vecs, q, "vec_id", "vec", bits = 4, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val slim = Similarity.lshCandidatePairs(vecs, q, "vec_id", "vec", bits = 4, tables = 8)
      .as[(Long, Long)].collect().toSet
    assert(attached == slim && slim.nonEmpty)
    val attachedPairs = Similarity.embeddingCandidates(vecs, "vec_id", "vec", bits = 4, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val slimPairs = Similarity.embeddingCandidatePairs(vecs, "vec_id", "vec", bits = 4, tables = 8)
      .as[(Long, Long)].collect().toSet
    assert(attachedPairs == slimPairs && slimPairs.nonEmpty)
  }

  test("ivfTopK with full probing matches brute force; lists partition the corpus") {
    val centroids = Similarity.ivfTrain(vecs, "vec_id", "vec", nLists = 2, seed = 7L)
    assert(centroids.length == 2)
    // every corpus row lands in exactly one list at nProbe=1
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "vec", centroids)
    assert(assigned.count() == 5)
    assert(assigned.select("id").distinct().count() == 5)
    // probing ALL lists makes IVF exhaustive — must equal brute force
    val ivf = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "vec",
      k = 2, nLists = 2, nProbe = 2, seed = 7L)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    val bf = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "vec", 2).as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(ivf.toSeq == bf.toSeq)
  }

  test("null embeddings are dropped before bucketing, never bucketed together") {
    val withNull = vecs.unionByName(Seq(
      (5L, null.asInstanceOf[Seq[Double]]),
      (6L, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "vec"))
    val pairs = Similarity.embeddingCandidatePairs(withNull, "vec_id", "vec",
      bits = 4, tables = 8).as[(Long, Long)].collect().toSet
    // the two null rows must not collide into a sig-0 bucket pair
    assert(!pairs.exists(p => p._1 >= 5L || p._2 >= 5L))
    assert(pairs.contains((0L, 1L))) // real candidates unaffected
    val top = Similarity.lshTopK(withNull, withNull.filter($"vec_id" === 0),
      "vec_id", "vec", 1, bits = 4, tables = 8)
      .as[(Long, Int, Long, Double)].collect()
    assert(top.nonEmpty && top.head._3 == 1L)
  }

  test("embeddingNearDups surfaces the planted near-parallel pair") {
    val dups = Similarity.embeddingNearDups(vecs, "vec_id", "vec", threshold = 0.99,
      bits = 4, tables = 8)
    val ids = dups.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ids.contains((0L, 1L)))
  }

  // ---- text ops ----

  test("langid: distinguishes clearly-marked english, german, chinese") {
    assert(TextOps.detectLang("the cat and the dog of the house is to be found") == "en")
    assert(TextOps.detectLang("der hund und die katze ist schön und schnell") == "de")
    assert(TextOps.detectLang("我是一个在这里的人，我有的是时间") == "zh")
    assert(TextOps.detectLang("") == "und")
    assert(TextOps.detectLang(null) == "und")
  }

  test("fingerprint is whitespace/punctuation-layout invariant, content-sensitive") {
    val a = spark.range(1).select(TextOps.fingerprint(lit("hello world foo")).as("f")).as[Long].head()
    val b = spark.range(1).select(TextOps.fingerprint(lit("  hello,   world!\nfoo  ")).as("f")).as[Long].head()
    val c = spark.range(1).select(TextOps.fingerprint(lit("hello world bar")).as("f")).as[Long].head()
    assert(a == b)
    assert(a != c)
  }

  test("dedupLines: cross-doc boilerplate removed, order/blanks kept, in-doc repeats kept") {
    val df = Seq(
      (1L, "alpha one\nfooter\n\nbody a"),
      (2L, "beta two\nfooter\nbody b"),
      (3L, "footer"),                 // only boilerplate → comes back empty
      (4L, "gamma\n\ngamma")          // repeats WITHIN one doc only → kept
    ).toDF("id", "text")
    val out = TextOps.dedupLines(df, "id", "text", minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha one\n\nbody a") // 'footer' gone, blank line kept
    assert(out(2L) == "beta two\nbody b")
    assert(out(3L) == "")                    // all lines boilerplate, row kept
    assert(out(4L) == "gamma\n\ngamma")      // minDocs counts DISTINCT docs
    assert(out.size == 4)
  }

  test("fingerprintDupGroups: one row per exact-sequence clique with representative") {
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha, beta. gamma!"), // layout-mangled copy — same sequence
      (3L, "alpha beta gamma"),
      (4L, "other text entirely")).toDF("id", "text")
    val g = TextOps.fingerprintDupGroups(corpus, "id", "text").collect()
    assert(g.length == 1) // singletons excluded; the clique is ONE row
    val r = g.head
    assert(r.getAs[Long]("rep_id") == 1L && r.getAs[Long]("group_size") == 3L)
    assert(r.getAs[scala.collection.Seq[Long]]("ids").toSeq == Seq(1L, 2L, 3L))
  }

  test("quality features on a fixed document") {
    val row = TextOps.qualityFeatures(Seq((1L, "The cat, the hat!")).toDF("id", "text"), "text")
      .head()
    assert(row.getAs[Long]("n_tokens") == 4L)
    assert(row.getAs[Double]("stopword_ratio") == 0.5) // "the" twice of 4
    assert(row.getAs[Double]("punct_ratio") > 0.0)
  }

  test("approx BPE token count: 4-char chunks plus punctuation") {
    val n = Seq((1L, "abcdefgh xy!")).toDF("id", "text")
      .select(TextOps.approxBpeTokenCount($"text").as("n")).as[Long].head()
    assert(n == 2 + 1 + 1) // ceil(8/4) + ceil(2/4) + one '!' mark
  }

  // ---- multimodal ----

  test("multimodal: real PNG payloads decode via imageio (pixel histogram)") {
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 4)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(MediaRecord(1L, "image", bos.toByteArray, 8, 4, 0L)).toDS()
    val f = Multimodal.extractFeatures(spark, media).head()
    assert(f.decoder == "image")
    assert(f.histogram.sum == 32) // pixels of the DECODED image, not bytes
    assert(f.histogram(0) == 16 && f.histogram(15) == 16) // half black, half white
    // an undecodable "image" payload falls back to the byte histogram
    val bad = Seq(MediaRecord(2L, "image", Array[Byte](1, 2, 3), 1, 1, 0L)).toDS()
    val fb = Multimodal.extractFeatures(spark, bad).head()
    assert(fb.decoder == "bytes" && fb.histogram.sum == 3)
  }

  test("multimodal: synthesize → features → frames plumbing is consistent") {
    val media = Multimodal.synthesize(docs, "id", "text").as[MediaRecord]
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length == 5)
    feats.foreach { f =>
      assert(f.histogram.sum == f.byte_len) // histogram partitions the bytes
      assert(f.payload_hash.length == 16)
    }
    val frames = Multimodal.sampleFrames(spark, media, everyMs = 100, maxFrames = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.groupBy(_.media_id).values.forall(_.length <= 4))
    // text payloads decode with no reader → every row is the fallback path
    assert(frames.forall(f => f.decoder == "bytes" && f.top_bin == -1))
    val resized = Multimodal.resize(media.toDF(), maxSide = 64)
    assert(resized.agg(max(greatest(col("width"), col("height")))).head().getInt(0) <= 64)
  }

  test("multimodal: animated GIFs decode frame-by-frame (real imageio path)") {
    val media = Multimodal.synthesizeGifs(spark, docs, "id")
    val frames = Multimodal.sampleFrames(spark, media, everyMs = 500, maxFrames = 8).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.keySet == docs.select("id").as[Long].collect().toSet)
    byId.foreach { case (id, fs) =>
      // frame count comes from the DECODED stream, not duration_ms (which
      // is 3×-inflated so a fallback regression changes the count)
      assert(fs.length == (id % 5).toInt + 1, s"media $id frame count")
      fs.foreach { f =>
        assert(f.decoder == "frames" && f.hist_sum == 64, s"media $id: $f")
        // uniform gray (id*31 + f*8) % 256 survives the GIF palette
        // round-trip exactly → dominant bin is the formula's
        assert(f.top_bin == ((id * 31 + f.frame_index * 8) % 256).toInt / 16,
          s"media $id frame ${f.frame_index}: $f")
      }
    }
    // fallback retained for true video: undecodable payload → byte slices
    val vid = Seq(MediaRecord(9L, "video", Array[Byte](1, 2, 3, 4), 0, 0, 1000L)).toDS()
    val fb = Multimodal.sampleFrames(spark, vid, everyMs = 500, maxFrames = 8).collect()
    assert(fb.length == 2 && fb.forall(f => f.decoder == "bytes" && f.top_bin == -1))
  }

  // ---- connected components / dup groups ----

  private def ccMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("connectedComponents: chain + separate pair + triangle") {
    // chain 1-2-3-4, pair 5-6, triangle 7-8-9 (redundant edge), self-loop 10
    // (a self-loop-only node is still a node in `edges` → singleton row)
    val cc = ccMap(Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L),
      (7L, 8L), (8L, 9L), (7L, 9L), (10L, 10L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 10L))
  }

  test("connectedComponents: long path converges in O(log² n) rounds") {
    // a 64-node path is the worst case for label propagation (63 rounds);
    // the star alternation must finish far inside maxIter = 12
    val path = (0L until 63L).map(i => (i, i + 1))
    val cc = Dedup.connectedComponents(path.toDF("id_a", "id_b"), maxIter = 12)
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 64 && cc.values.forall(_ == 0L))
  }

  test("connectedComponents: empty edges, reversed orientation, string ids") {
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    // (b, a) input orientation must give the same answer as (a, b)
    val rev = ccMap(Seq((4L, 3L), (2L, 3L), (2L, 1L)))
    assert(rev == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val s = Dedup.connectedComponents(Seq(("zz", "aa"), ("mm", "zz")).toDF("id_a", "id_b"))
      .as[(String, String)].collect().toMap
    assert(s == Map("aa" -> "aa", "zz" -> "aa", "mm" -> "aa"))
  }

  test("connectedComponents matches a sequential union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(260)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> find(id.toInt).toLong).toMap
    val got = ccMap(edges)
    assert(got == expected)
  }

  test("connectedComponents: staged rounds match localCheckpoint rounds") {
    val dir = graft.TestSpark.tempDir("cc-stage")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val staged = Dedup.connectedComponents(edges, stagePath = dir)
      .as[(Long, Long)].collect().toMap
    assert(staged == ccMap(Seq((1L, 2L), (2L, 3L), (5L, 6L))))
  }

  test("nearDupGroups labels components and singletons; minhashDupGroups e2e") {
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("id_a", "id_b")
    val labels = Dedup.nearDupGroups(docs, "id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L))
    // end-to-end: docs 0/1 exact dups, 2 a near dup → one group {0,1,2};
    // keeping id = component rows IS the deduped corpus
    val g = Dedup.minhashDupGroups(docs, "id", "text",
        shingleSize = 3, k = 64, bands = 32, threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(g == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L))
    assert(g.count { case (id, comp) => id == comp } == 3)
  }

  // ---- text cleaning / decontamination ----

  test("cleanText strips tags, unescapes entities in order, NFC-normalizes, collapses whitespace") {
    def clean(s: String): String =
      Seq(s).toDF("t").select(TextOps.cleanText($"t")).as[String].head()
    assert(clean("<p class=\"x\">hi   <b>there</b></p>\n\tnow") == "hi there now")
    assert(clean("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b&nbsp;c &amp; d")
      == "a <tag> \"q\" 's' b c & d")
    // &amp; unescapes LAST: a literal "&amp;lt;" is "&lt;", never "<"
    assert(clean("x &amp;lt;y") == "x &lt;y")
    // NFC: decomposed e + combining acute (U+0065 U+0301) → é (U+00E9)
    assert(clean("café") == "café")
    assert(clean(null) == null)
  }

  test("redactPii replaces emails, IPs, phone runs — in that order") {
    def r(s: String): String =
      Seq(s).toDF("t").select(TextOps.redactPii($"t")).as[String].head()
    assert(r("mail me at jo.doe+x@sub.example.org today")
      == "mail me at <EMAIL> today")
    assert(r("host 192.168.0.1 and 10.255.3.77.") == "host <IP> and <IP>.")
    assert(r("call 555-123-4567 or 08 123 456 789 now")
      == "call <PHONE> or <PHONE> now")
    // an email containing digits must NOT be half-eaten by the phone rule
    assert(r("a12345678@example.com") == "<EMAIL>")
    // short numbers survive
    assert(r("version 3.5.1 of 2024") == "version 3.5.1 of 2024")
  }

  test("repetitionFeatures computes Gopher-style duplicate-line stats") {
    val df = Seq((1L, "aa\nbb\naa\ncc"), (2L, "xx\nyy"), (3L, "")).toDF("id", "text")
    val out = TextOps.repetitionFeatures(df, "text")
      .select("id", "n_lines", "dup_line_frac", "dup_line_char_frac")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: 4 lines, "aa" twice → 1 repeated occurrence of 4; chars 4/8
    assert(out(1L) == (1L, 4L, 0.25, 0.5))
    assert(out(2L) == (2L, 2L, 0.0, 0.0))
    assert(out(3L) == (3L, 0L, 0.0, 0.0))
  }

  test("ngramRepetitionFeatures computes Gopher top/dup n-gram char fractions") {
    // doc 1: "a b c d e f" twice then 20 unique tokens; 32 tokens, T = 63
    //   top2 "a b" (tie at count 2, lexicographically smallest): 2·3/63
    //   top3 "a b c": 2·5/63; dup5 {"a b c d e","b c d e f"}×2: 36/63
    //   dup10: the two 12-token halves diverge after position 0 vs 6 → 0
    val rep = "a b c d e f a b c d e f " +
      ('g' to 'z').map(_.toString).mkString(" ")
    // doc 2: 12 identical tokens — every fraction saturates the cap at 1
    val df = Seq((1L, rep), (2L, "x x x x x x x x x x x x"), (3L, ""))
      .toDF("id", "text")
    val out = TextOps.ngramRepetitionFeatures(df, "text")
      .select("id", "top2_frac", "top3_frac", "dup5_frac", "dup10_frac")
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, 0.0952, 0.1587, 0.5714, 0.0))
    assert(out(2L) == (2L, 1.0, 1.0, 1.0, 1.0))
    assert(out(3L) == (3L, 0.0, 0.0, 0.0, 0.0))
  }

  test("gopherQualityFeatures computes symbol/bullet/ellipsis/alpha/stopword inputs") {
    val doc = Seq((0L,
      "- one\n* two\nplain...\n### x # y\nthe cat and dog have fun with 123"))
      .toDF("doc_id", "text")
    val r = TextOps.gopherQualityFeatures(doc, "text").head()
    // tokens: one two plain x y the cat and dog have fun with 123 = 13
    assert(r.getAs[Long]("n_words") == 13L)
    // symbols: 4 '#' + 1 '...' over 13 words
    assert(r.getAs[Double]("symbol_word_ratio") == math.rint(5.0 / 13 * 1e4) / 1e4)
    // 2 of 5 non-blank lines start with a bullet; 1 of 5 ends with '...'
    assert(r.getAs[Double]("bullet_line_frac") == 0.4)
    assert(r.getAs[Double]("ellipsis_line_frac") == 0.2)
    // every word but '123' has an alphabetic char
    assert(r.getAs[Double]("alpha_word_frac") == math.rint(12.0 / 13 * 1e4) / 1e4)
    // required stopwords present: the, and, have, with
    assert(r.getAs[Long]("req_stopword_hits") == 4L)
    // degenerate: empty doc — all zeros, no division blowups
    val z = TextOps.gopherQualityFeatures(Seq((1L, "")).toDF("doc_id", "text"), "text").head()
    assert(z.getAs[Long]("n_words") == 0L && z.getAs[Long]("req_stopword_hits") == 0L)
    assert(z.getAs[Double]("bullet_line_frac") == 0.0)
  }

  test("packSequences: offsets, chunk spans, zero-token docs, reshard-invariance") {
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val in = Seq((0L, words(5)), (1L, words(7)), (2L, words(4)), (3L, words(10)),
      (4L, "")).toDF("doc_id", "text")
    // groups = 1: one sequential stream ordered by id; seqLen = 8
    val out = TextOps.packSequences(in, "doc_id", "text", seqLen = 8, groups = 1)
      .orderBy("id")
      .select("id", "n_tokens", "start_off", "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      (0L, 5L, 0L, 0L, 0L),   // tokens 0..4   → chunk 0
      (1L, 7L, 5L, 0L, 1L),   // tokens 5..11  → spans chunks 0-1
      (2L, 4L, 12L, 1L, 1L),  // tokens 12..15 → chunk 1
      (3L, 10L, 16L, 2L, 3L), // tokens 16..25 → spans chunks 2-3
      (4L, 0L, 26L, 3L, 3L))) // empty doc occupies nothing
    // resharding the input changes NOTHING (hash groups + id order)
    val re = TextOps.packSequences(in.repartition(7), "doc_id", "text",
        seqLen = 8, groups = 1)
      .orderBy("id")
      .select("id", "n_tokens", "start_off", "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(re == out)
    // multi-group: offsets restart per group and every doc appears once
    val multi = TextOps.packSequences(in, "doc_id", "text", seqLen = 8, groups = 4)
    assert(multi.count() == 5)
    assert(multi.groupBy("grp").agg(min("start_off").as("m"))
      .filter($"m" =!= 0L).count() == 0)
  }

  test("stratifiedSample: per-group rates, deterministic, reshard-invariant") {
    val in = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = TextOps.stratifiedSample(in, "id", "lang", Map("en" -> 0.3)).cache()
    // every row decided, kept ⇔ bucket under its group's threshold
    assert(out.count() == 1000)
    assert(out.filter($"lang" === "en" && $"kept" =!= ($"bucket" < 300000L)).count() == 0)
    // unlisted group falls back to defaultRate = 1.0 (all kept)
    assert(out.filter($"lang" === "de" && !$"kept").count() == 0)
    // the en keep-rate lands near 30% (hash uniformity, not exactness)
    val keptEn = out.filter($"lang" === "en" && $"kept").count()
    assert(keptEn > 100 && keptEn < 200, s"kept $keptEn of 500")
    // deterministic and resharding-invariant: identical kept id sets
    val again = TextOps.stratifiedSample(in.repartition(13), "id", "lang",
      Map("en" -> 0.3))
    assert(out.filter($"kept").select("id").except(
      again.filter($"kept").select("id")).count() == 0)
    assert(again.filter($"kept").count() == out.filter($"kept").count())
    out.unpersist()
  }

  test("hashedTfidf: smooth-idf weights at hashed buckets, zero vector for empty docs") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, ""))
      .toDF("id", "text")
    val dim = 16
    val out = TextOps.hashedTfidf(docs, "id", "text", dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out.size == 3 && out.values.forall(_.length == dim))
    assert(out(3L).forall(_ == 0.0f)) // empty doc → zero vector, not absent
    def bucket(t: String) = spark.range(1)
      .select(pmod(xxhash64(lit(t)), lit(dim.toLong)).cast("int")).head().getInt(0)
    def idf(df: Long) = math.log(4.0 / (df + 1.0)) + 1.0 // N = 3
    // doc1: tf(alpha)=2 df=1; tf(beta)=1 df=2
    assert(math.abs(out(1L)(bucket("alpha")) - 2.0 * idf(1)) < 1e-5)
    assert(math.abs(out(1L)(bucket("beta")) - 1.0 * idf(2)) < 1e-5)
    assert(math.abs(out(2L)(bucket("gamma")) - 1.0 * idf(1)) < 1e-5)
    // everything else is zero (no hash collisions among 3 terms here)
    assert(out(1L).count(_ != 0.0f) == 2 && out(2L).count(_ != 0.0f) == 2)
    // a corpus-trained vocabulary embeds NEW docs consistently: known
    // terms score with the trained idf, unknown terms vanish
    val v = TextOps.tfidfVocab(docs, "id", "text", dim)
    val fresh = TextOps.hashedTfidf(Seq((9L, "beta zzz")).toDF("id", "text"),
      "id", "text", dim, vocab = Some(v)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(math.abs(fresh(9L)(bucket("beta")) - idf(2)) < 1e-5)
    assert(fresh(9L).count(_ != 0.0f) == 1)
    // a vocab trained at another dim fails loudly instead of silently
    // dropping every bucket >= dim
    assertThrows[IllegalArgumentException](
      TextOps.hashedTfidf(docs, "id", "text", dim = 4, vocab = Some(v)))
  }

  test("chunkDocs: overlapping windows cover every char; empty docs kept") {
    val docs = Seq((1L, "abcdefghij"), (2L, ""), (3L, "short")).toDF("id", "text")
    val out = TextOps.chunkDocs(docs, "id", "text", size = 4, overlap = 1)
      .orderBy("id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 0, "abcd"), (1L, 1, "defg"), (1L, 2, "ghij"),
      (2L, 0, ""), (3L, 0, "shor"), (3L, 1, "rt")))
    // dropping each chunk's leading overlap reconstructs the original
    val rebuilt = out.filter(_._1 == 1L).sortBy(_._2).zipWithIndex.map {
      case ((_, _, c), i) => if (i == 0) c else c.drop(1)
    }.mkString
    assert(rebuilt == "abcdefghij")
    // doc length == size → exactly one chunk (no empty trailing chunk)
    val one = TextOps.chunkDocs(Seq((9L, "abcd")).toDF("id", "text"), "id", "text", 4, 1)
    assert(one.count() == 1)
  }

  test("epochMix: fractional epochs, dense copy ordinals, reshard-invariant") {
    val in = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = TextOps.epochMix(in, "id", "lang",
      Map("en" -> 2.25, "de" -> 0.5)).cache()
    // en (epochs 2.25): every row at least twice, ~25% a third time
    assert(out.filter($"lang" === "en").groupBy("id").count()
      .filter($"count" < 2).count() == 0)
    val enRows = out.filter($"lang" === "en").count()
    assert(enRows > 1050 && enRows < 1200, s"en rows $enRows for 500 docs")
    // de (epochs 0.5): degrades to sampling — 0 or 1 copies, ~half kept
    assert(out.filter($"lang" === "de").groupBy("id").count()
      .filter($"count" =!= 1).count() == 0)
    val deDocs = out.filter($"lang" === "de").count()
    assert(deDocs > 150 && deDocs < 350, s"de docs $deDocs of 500")
    // copy ordinals are dense 0..n-1 per doc
    assert(out.groupBy("id").agg(max($"copy").as("m"), count(lit(1)).as("n"))
      .filter($"m" =!= $"n" - 1).count() == 0)
    // deterministic and resharding-invariant: identical (id, copy) multiset
    val again = TextOps.epochMix(in.repartition(13), "id", "lang",
      Map("en" -> 2.25, "de" -> 0.5))
    assert(out.select("id", "copy").except(again.select("id", "copy")).count() == 0)
    assert(again.count() == out.count())
    out.unpersist()
  }

  test("classifierScore: sigmoid of mean vocab weight; unmatched and empty docs score sigmoid(bias)") {
    val docs = Seq((1L, "spark spark query"), (2L, "todo, error!"), (3L, ""),
      (4L, "no vocabulary overlap here")).toDF("id", "text")
    val w = Seq(("spark", 0.8), ("query", 0.5), ("todo", -0.8), ("error", -0.6))
      .toDF("term", "weight")
    val out = TextOps.classifierScore(docs, "id", "text", w)
    assert(out.count() == 4) // every doc scored, including the empty one
    val m = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    assert(math.abs(m(1L) - sig((0.8 * 2 + 0.5) / 3)) < 2e-6)
    assert(math.abs(m(2L) - sig((-0.8 - 0.6) / 2)) < 2e-6)
    assert(m(3L) == 0.5 && m(4L) == 0.5) // z = 0 both ways
    // nonzero bias shifts the no-signal score
    val biased = TextOps.classifierScore(docs, "id", "text", w, bias = 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(biased(3L) - sig(2.0)) < 2e-6)
  }

  test("assignSplit is deterministic, total, and resharding-invariant") {
    val ids = (0L until 500L).toDF("id")
    val a = TextOps.assignSplit(ids, "id", valPct = 10, testPct = 10)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a.size == 500 && a.values.forall(Set("train", "val", "test")))
    // recompute under a different partitioning → identical assignment
    val b = TextOps.assignSplit(ids.repartition(7), "id", valPct = 10, testPct = 10)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // roughly the requested proportions (hash uniformity, loose bounds)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 500.0).toMap
    assert(frac("train") > 0.7 && frac("val") > 0.04 && frac("test") > 0.04)
  }

  test("decontaminate flags docs sharing n-grams with the benchmark set") {
    // docs: 0 and 1 exact dups, 2 one-token near dup (13 shared 3-grams
    // of 14... here n=5), 3/4 unrelated
    val bench = docs.filter($"id" === 0)
    val out = TextOps.decontaminate(docs, "id", "text", bench, "text", n = 5, minHits = 1)
      .as[(Long, Long)].collect().toMap
    // doc 0 and exact dup 1 share ALL grams; near dup 2 (last token
    // edited) shares all but the one gram containing it; 3/4 share none
    val nGrams = 14 - 5 + 1
    assert(out(0L) == nGrams && out(1L) == nGrams)
    assert(out(2L) == nGrams - 1)
    assert(!out.contains(3L) && !out.contains(4L))
    // minHits filters marginal overlap
    val strict = TextOps.decontaminate(docs, "id", "text", bench, "text", n = 5,
      minHits = nGrams).as[(Long, Long)].collect().toMap
    assert(strict.keySet == Set(0L, 1L))
  }

  test("dedupParagraphs: cross-doc boilerplate paragraphs removed, in-doc kept") {
    val footer = "copyright 2026\nall rights reserved" // multi-LINE paragraph
    val in = Seq(
      (1L, s"intro one\n\nbody of doc one\n\n$footer"),
      (2L, s"intro two\n\n$footer\n\nbody of doc two"),
      (3L, s"$footer\n\n$footer\n\nonly boilerplate"), // repeated in ONE doc
      (4L, "")
    ).toDF("id", "text")
    val out = TextOps.dedupParagraphs(in, "id", "text")
      .as[(Long, String)].collect().toMap
    // the footer spans two LINES but is one PARAGRAPH: removed as a unit
    assert(out(1L) == "intro one\n\nbody of doc one")
    assert(out(2L) == "intro two\n\nbody of doc two")
    // in-doc repetition counts ONE doc; it appears in 3 docs total → both
    // copies stripped, the unique paragraph survives
    assert(out(3L) == "only boilerplate")
    assert(out(4L) == "")
    // line dedup would NOT have removed it (each line appears < minDocs
    // times per line-unit? no — lines DO repeat; the distinction is the
    // unit boundary): a paragraph shared only PARTIALLY is kept
    val partial = Seq(
      (1L, "copyright 2026\nextra line"),
      (2L, "copyright 2026\ndifferent line")
    ).toDF("id", "text")
    val kept = TextOps.dedupParagraphs(partial, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(kept(1L) == "copyright 2026\nextra line")
    assert(kept(2L) == "copyright 2026\ndifferent line")
  }

  test("highlightSnippets: window around the first query-term occurrence") {
    val content = Seq(
      ("d1", "AAAA BBBB zebra CCCC DDDD EEEE FFFF"),
      ("d2", "yak at the very start of this document body"),
      ("d3", "no match words here at all")
    ).toDF("doc_id", "content")
    val hits = Seq((0, "d1", 1), (0, "d2", 2), (1, "d3", 1))
      .toDF("query_id", "doc_id", "rank")
    val qTerms = Seq((0, "zebra"), (0, "yak"), (1, "missing"))
      .toDF("query_id", "term")
    val out = TextOps.highlightSnippets(hits, content, qTerms,
      before = 5, width = 12)
      .select("query_id", "doc_id", "rank", "snippet")
      .as[(Int, String, Int, String)].collect().toSet
    // d1: 'zebra' at position 11 → window starts at 11-5=6 (1-based)
    assert(out.contains((0, "d1", 1, "BBBB zebra C")))
    // d2: 'yak' at position 1 → start clamps to 1
    assert(out.contains((0, "d2", 2, "yak at the v")))
    // d3: no term occurs → document head fallback
    assert(out.contains((1, "d3", 1, "no match wor")))
    // hit columns carry through; one row per hit
    assert(out.size == 3)
    // terms of ANOTHER query never highlight this query's hits: 'zebra'
    // occurs in d1 but belongs to query 0 — query 1 sees only 'missing',
    // so its d1 snippet is the head fallback, not the zebra window
    val cross = TextOps.highlightSnippets(
      Seq((1, "d1", 1)).toDF("query_id", "doc_id", "rank"), content, qTerms,
      before = 5, width = 12)
      .select("snippet").as[String].head()
    assert(cross == "AAAA BBBB ze")
    // a hit with no content row is NEVER dropped: row kept, snippet null
    val orphan = TextOps.highlightSnippets(
      Seq((0, "d1", 1), (0, "dMISSING", 2)).toDF("query_id", "doc_id", "rank"),
      content, qTerms, before = 5, width = 12)
      .select("doc_id", "rank", "snippet")
      .as[(String, Int, Option[String])].collect().toSet
    assert(orphan == Set(("d1", 1, Some("BBBB zebra C")),
      ("dMISSING", 2, None)))
  }

  test("rrfFuse: both-list docs outrank single-list docs; exact scores; ties by doc_id") {
    // lexical: A B C    semantic: B D A  (query 0); query 1 lexical-only
    val lex = Seq((0, 1, "A"), (0, 2, "B"), (0, 3, "C"), (1, 1, "X"))
      .toDF("query_id", "rank", "doc_id")
    val sem = Seq((0, 1, "B"), (0, 2, "D"), (0, 3, "A"))
      .toDF("query_id", "rank", "doc_id")
    val out = Similarity.rrfFuse(Seq(lex, sem), 10, rrfK = 60)
      .orderBy("query_id", "rank")
      .as[(Int, Int, String, Double)].collect().toSeq
    def r(ranks: Int*) = ranks.map(x => 1.0 / (60 + x)).sum
    // B (lex 2 + sem 1) beats A (lex 1 + sem 3) beats the single-list
    // docs, where D (sem 2, 1/62) outscores C (lex 3, 1/63)
    assert(out.map(x => (x._1, x._2, x._3)) == Seq(
      (0, 1, "B"), (0, 2, "A"), (0, 3, "D"), (0, 4, "C"), (1, 1, "X")))
    assert(out.map(_._4) == Seq(r(2, 1), r(1, 3), r(2), r(3), r(1)))
    // tie-break: two docs with the same single rank order by doc_id asc
    val t1 = Seq((0, 1, "zz")).toDF("query_id", "rank", "doc_id")
    val t2 = Seq((0, 1, "aa")).toDF("query_id", "rank", "doc_id")
    val tied = Similarity.rrfFuse(Seq(t1, t2), 10).orderBy("rank")
      .select("doc_id").as[String].collect().toSeq
    assert(tied == Seq("aa", "zz"))
  }

  test("normalizedFuse: min_max and l2 techniques, weighted mean, hand-checked") {
    // lexical scores 10/6/2 (range 8), semantic 0.9/0.8/0.5 (range 0.4)
    val lex = Seq((0, "A", 10.0), (0, "B", 6.0), (0, "C", 2.0))
      .toDF("query_id", "doc_id", "score")
    val sem = Seq((0, "B", 0.9), (0, "D", 0.8), (0, "A", 0.5))
      .toDF("query_id", "doc_id", "score")
    val out = Similarity.normalizedFuse(Seq((lex, 0.7), (sem, 0.3)), 10)
      .orderBy("rank").as[(Int, Int, String, Double)].collect().toSeq
    // min_max: lex A=1 B=0.5 C=0; sem B=1 D=0.75 A=0
    // mean/sumW=1: A=0.7 B=0.65 D=0.225 C=0
    assert(out.map(_._3) == Seq("A", "B", "D", "C"))
    Seq(0.7, 0.65, 0.225, 0.0).zip(out.map(_._4)).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1e-12, s"expected $e got $g") }
    // l2: lex norm = sqrt(140), sem norm = sqrt(.81+.64+.25)
    val nl = math.sqrt(140.0)
    val ns = math.sqrt(0.81 + 0.64 + 0.25)
    val l2 = Similarity.normalizedFuse(Seq((lex, 1.0), (sem, 1.0)), 10, "l2")
      .orderBy("rank").as[(Int, Int, String, Double)].collect().toSeq
    val expA = (10.0 / nl + 0.5 / ns) / 2.0
    val expB = (6.0 / nl + 0.9 / ns) / 2.0
    assert(math.abs(l2.find(_._3 == "A").get._4 - expA) < 1e-12)
    assert(math.abs(l2.find(_._3 == "B").get._4 - expB) < 1e-12)
    // degenerate single-score list min_maxes to 1.0
    val single = Seq((0, "Z", 3.3)).toDF("query_id", "doc_id", "score")
    val deg = Similarity.normalizedFuse(Seq((single, 1.0)), 10)
      .as[(Int, Int, String, Double)].collect().head
    assert(deg._3 == "Z" && deg._4 == 1.0)
    intercept[IllegalArgumentException] {
      Similarity.normalizedFuse(Seq((lex, 1.0)), 10, "zscore")
    }
  }

  test("incremental minhash index: screen vs index + within-batch, ingest appends survivors") {
    val idx = TestSpark.tempDir("minhash-idx")
    val fresh = "entirely new material concerning window functions watermarks and state stores"
    // batch 1 on an EMPTY index: everything survives
    val b1 = Seq((0L, base), (3L, docs.filter($"id" === 3).select("text").as[String].head()),
      (4L, docs.filter($"id" === 4).select("text").as[String].head())).toDF("id", "text")
    val l1 = Dedup.minhashIngest(b1, "id", "text", idx, threshold = 0.5)
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(l1.keySet == Set(0L, 3L, 4L))
    assert(l1.values.forall(_._1.isEmpty), s"fresh-index batch must all survive: $l1")
    // batch 2: exact dup of indexed 0, near dup of indexed 0, a fresh doc,
    // and a within-batch exact dup of the fresh doc
    val b2 = Seq((10L, base), (11L, nearDup), (12L, fresh), (13L, fresh))
      .toDF("id", "text")
    val l2 = Dedup.minhashScreenBatch(b2, "id", "text", idx, threshold = 0.5)
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(l2(10L)._1.contains(0L) && l2(10L)._2.contains(1.0)) // exact: est 1.0
    assert(l2(11L)._1.contains(0L) && l2(11L)._2.exists(_ >= 0.5)) // near dup
    assert(l2(12L)._1.isEmpty) // fresh: survives
    assert(l2(13L)._1.contains(12L) && l2(13L)._2.contains(1.0)) // within-batch, smaller id wins
    // ingest appends ONLY the survivor; the index now holds 0, 3, 4, 12
    Dedup.minhashIngest(b2, "id", "text", idx, threshold = 0.5)
    val indexed = spark.read.parquet(s"$idx/sigs").select("id").as[Long]
      .collect().toSet
    assert(indexed == Set(0L, 3L, 4L, 12L))
    // crash-resume: re-running the SAME batch re-labels 12 as a dup of
    // itself (already indexed, agreement 1.0) — nothing is re-appended
    val l3 = Dedup.minhashIngest(b2, "id", "text", idx, threshold = 0.5)
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(l3(12L).contains(12L))
    assert(spark.read.parquet(s"$idx/sigs").select("id").as[Long]
      .collect().toSet == Set(0L, 3L, 4L, 12L))
    // banding parameters are the index's identity: a mismatch is refused
    intercept[IllegalArgumentException] {
      Dedup.minhashScreenBatch(b2, "id", "text", idx, bands = 16)
    }
  }
}
