package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import graft.ops.TextOps

/** Reverse search: registered queries match arriving documents. Pinned
  * against a brute-force DataFrame recomputation in OR and AND modes,
  * and batch ≡ streaming (the op is a stateless narrow transform, so
  * `readStream` must produce the identical match set). */
class PercolatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val qTerms: Map[Int, Array[String]] = Map(
    0 -> Array("alpha", "beta", "gamma"),
    1 -> Array("beta"),
    2 -> Array("zzznothere"))

  private def docsDf = Seq(
    (1L, "alpha beta gamma all three present"),
    (2L, "beta only, twice: beta"),
    (3L, "alpha and gamma but never the middle one"),
    (4L, "nothing relevant at all"),
    (5L, "")).toDF("id", "text")

  /** Brute force: explode distinct tokens, join the query-term table,
    * count distinct matched terms per (doc, query). */
  private def brute(conjunctive: Boolean) = {
    val qdf = qTerms.toSeq.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val need = qTerms.toSeq.map { case (q, ts) =>
      (q, if (conjunctive) ts.length else 1) }.toDF("query_id", "need")
    docsDf.select($"id", explode(array_distinct(TextOps.simpleTokens($"text"))).as("term"))
      .join(qdf, "term")
      .groupBy("id", "query_id").agg(count(lit(1)).cast("int").as("matched_terms"))
      .join(need, "query_id").filter($"matched_terms" >= $"need")
      .select("id", "query_id", "matched_terms")
  }

  test("percolate OR and AND match a brute-force recomputation") {
    Seq(false, true).foreach { and =>
      val got = Percolator.percolate(docsDf, "id",
        TextOps.simpleTokens($"text"), qTerms, conjunctive = and)
        .as[(Long, Int, Int)].collect().toSet
      val exp = brute(and).as[(Long, Int, Int)].collect().toSet
      assert(got == exp, s"conjunctive=$and: got $got expected $exp")
    }
    // spot semantics: AND admits doc 1 for query 0 only; OR also 2, 3
    val and0 = Percolator.percolate(docsDf, "id",
      TextOps.simpleTokens($"text"), qTerms, conjunctive = true)
      .filter($"query_id" === 0).select("id").as[Long].collect().toSet
    assert(and0 == Set(1L))
    val or0 = Percolator.percolate(docsDf, "id",
      TextOps.simpleTokens($"text"), qTerms)
      .filter($"query_id" === 0).select("id").as[Long].collect().toSet
    assert(or0 == Set(1L, 2L, 3L))
    // the no-hit query matches nothing in either mode
    assert(Percolator.percolate(docsDf, "id", TextOps.simpleTokens($"text"),
      qTerms).filter($"query_id" === 2).count() == 0)
  }

  test("registry size guard: at the bound passes, one past it refuses") {
    sys.props("graft.percolator.maxEntries") = "30"
    try {
      val atBound: Map[Int, Array[String]] =
        (0 until 3).map(q => q -> Array.tabulate(10)(i => s"t${q}_$i")).toMap
      // exactly 30 distinct (term, query) entries — admitted
      assert(Percolator.percolate(docsDf, "id",
        TextOps.simpleTokens($"text"), atBound).count() == 0)
      // duplicate terms within a query do NOT count twice toward the
      // bound (registrations are distinct-per-query), and the query works
      val dup: Map[Int, Array[String]] = Map(0 -> Array.fill(100)("beta"))
      assert(Percolator.percolate(docsDf, "id",
        TextOps.simpleTokens($"text"), dup).count() > 0)
      // 31 entries — one past the bound — refuses with the documented hint
      val over = atBound + (3 -> Array("one_more"))
      val e = intercept[IllegalArgumentException] {
        Percolator.percolate(docsDf, "id", TextOps.simpleTokens($"text"), over)
      }
      assert(e.getMessage.contains("registry"))
    } finally sys.props.remove("graft.percolator.maxEntries")
  }

  test("range clauses: parse, gate term matches, term-less alerts, null fields") {
    import Percolator.{NumericRange, Registered}
    // Lucene range spelling round-trips
    assert(NumericRange.parse("dl:[40 TO 200]") ==
      NumericRange("dl", Some(40.0), Some(200.0)))
    assert(NumericRange.parse("dl:{40 TO 200}") ==
      NumericRange("dl", Some(40.0), Some(200.0),
        minInclusive = false, maxInclusive = false))
    assert(NumericRange.parse("v:[* TO 5]") ==
      NumericRange("v", None, Some(5.0)))
    intercept[IllegalArgumentException] { NumericRange.parse("dl:[a TO 5]") }
    intercept[IllegalArgumentException] { NumericRange.parse("garbage") }
    intercept[IllegalArgumentException] { NumericRange.parse("v:[* TO *]") }
    intercept[IllegalArgumentException] { // empty interval
      NumericRange("v", Some(5.0), Some(5.0), maxInclusive = false)
    }
    intercept[IllegalArgumentException] { Registered() }
    // docs with metadata: dl (nullable) and score
    val docs = Seq(
      (1L, "alpha beta", java.lang.Double.valueOf(50.0), 0.9),
      (2L, "alpha beta", java.lang.Double.valueOf(500.0), 0.9),
      (3L, "alpha", java.lang.Double.valueOf(120.0), 0.1),
      (4L, "nothing here", java.lang.Double.valueOf(80.0), 0.9),
      (5L, "alpha beta", null.asInstanceOf[java.lang.Double], 0.9))
      .toDF("id", "text", "dl", "score")
    val reg: Map[Int, Registered] = Map(
      // terms + one range: alpha&beta AND dl in [40, 200]
      0 -> Registered(Array("alpha", "beta"),
        Seq(NumericRange.parse("dl:[40 TO 200]"))),
      // term-less metadata alert: any doc with score >= 0.5
      1 -> Registered(ranges = Seq(NumericRange("score", Some(0.5)))),
      // two ranges, both must hold
      2 -> Registered(ranges = Seq(NumericRange.parse("dl:[100 TO *]"),
        NumericRange("score", None, Some(0.5)))))
    val got = Percolator.percolateRegistered(docs, "id",
      TextOps.simpleTokens($"text"), reg, conjunctive = true)
      .as[(Long, Int, Int)].collect().toSet
    val exp = Set(
      (1L, 0, 2), // dl=50 in range, both terms
      // doc 2: terms match but dl=500 out of range; doc 5: dl NULL -> no
      (1L, 1, 0), (2L, 1, 0), (4L, 1, 0), (5L, 1, 0), // score alert
      (3L, 2, 0)) // dl=120 ∧ score=0.1
    assert(got == exp)
    // OR mode still gates on the ranges (doc 3 matches q0's terms ∨ but
    // its dl=120 is in range -> admitted; doc 2 stays excluded)
    val or0 = Percolator.percolateRegistered(docs, "id",
      TextOps.simpleTokens($"text"), reg).filter($"query_id" === 0)
      .select("id").as[Long].collect().toSet
    assert(or0 == Set(1L, 3L))
    // range entries count toward the registry bound
    sys.props("graft.percolator.maxEntries") = "2"
    try intercept[IllegalArgumentException] {
      Percolator.percolateRegistered(docs, "id",
        TextOps.simpleTokens($"text"), reg)
    } finally sys.props.remove("graft.percolator.maxEntries")
  }

  test("phrase clauses: contiguous in-order, gate terms/ranges, phrase-only alerts") {
    import Percolator.{NumericRange, Registered}
    val docs = Seq(
      (1L, "alpha beta gamma"),            // "alpha beta" contiguous
      (2L, "beta alpha beta gamma"),       // contiguous at offset 1
      (3L, "alpha delta beta"),            // words present, NOT contiguous
      (4L, "beta alpha"),                  // reversed order only
      (5L, "alpha"),                       // phrase word missing
      (6L, "gamma gamma alpha beta gamma") // phrase + extra term
    ).toDF("id", "text")
    val reg: Map[Int, Registered] = Map(
      // phrase-only alert
      0 -> Registered(phrases = Seq(Seq("alpha", "beta"))),
      // phrase AND a term clause
      1 -> Registered(Array("gamma"), phrases = Seq(Seq("alpha", "beta"))),
      // two phrases, both must hold
      2 -> Registered(phrases = Seq(Seq("alpha", "beta"), Seq("beta", "gamma"))),
      // three-word phrase
      3 -> Registered(phrases = Seq(Seq("alpha", "beta", "gamma"))))
    val got = Percolator.percolateRegistered(docs, "id",
      TextOps.simpleTokens($"text"), reg)
      .as[(Long, Int, Int)].collect().toSet
    // docs 1/2/6 satisfy every query (6: "alpha beta" at 2, "beta gamma"
    // at 3, the trigram at 2); docs 3 (gap), 4 (reversed), 5 (missing
    // word) match nothing; matched_terms counts TERM clauses only
    val exp = Set(0, 2, 3).flatMap(q => Set(1L, 2L, 6L).map(id => (id, q, 0))) ++
      Set(1L, 2L, 6L).map(id => (id, 1, 1))
    assert(got == exp)
    // a phrase combined with a range clause still gates on both
    val docsM = Seq(
      (1L, "alpha beta", 50.0), (2L, "alpha beta", 500.0),
      (3L, "beta alpha", 50.0)).toDF("id", "text", "dl")
    val regM: Map[Int, Registered] = Map(
      0 -> Registered(phrases = Seq(Seq("alpha", "beta")),
        ranges = Seq(NumericRange.parse("dl:[40 TO 200]"))))
    val gotM = Percolator.percolateRegistered(docsM, "id",
      TextOps.simpleTokens($"text"), regM)
      .select("id").as[Long].collect().toSet
    assert(gotM == Set(1L))
    // phrase words count toward the registry bound; 1-word phrase refused
    intercept[IllegalArgumentException] {
      Registered(phrases = Seq(Seq("solo")))
    }
    sys.props("graft.percolator.maxEntries") = "3"
    try intercept[IllegalArgumentException] {
      Percolator.percolateRegistered(docs, "id",
        TextOps.simpleTokens($"text"), reg)
    } finally sys.props.remove("graft.percolator.maxEntries")
  }

  test("percolate is a valid streaming transform: stream results == batch results") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val streamed = Percolator.percolate(
      ms.toDS().toDF("id", "text"), "id",
      TextOps.simpleTokens($"text"), qTerms)
    val q = streamed.writeStream.format("memory").queryName("perc_stream")
      .outputMode("append").start()
    try {
      val rows = docsDf.as[(Long, String)].collect()
      ms.addData(rows.take(2).toIndexedSeq)
      q.processAllAvailable()
      ms.addData(rows.drop(2).toIndexedSeq) // second micro-batch
      q.processAllAvailable()
      val got = spark.table("perc_stream")
        .as[(Long, Int, Int)].collect().toSet
      val exp = Percolator.percolate(docsDf, "id",
        TextOps.simpleTokens($"text"), qTerms)
        .as[(Long, Int, Int)].collect().toSet
      assert(got == exp)
    } finally q.stop()
  }
}
