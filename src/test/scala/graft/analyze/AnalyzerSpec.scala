package graft.analyze

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[AnalyzerConfig]] chain semantics + spec round-trip + the Column
  * form's row-for-row identity with the driver-side [[AnalyzerConfig.analyze]]. */
class AnalyzerSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("default chain is the bare tokenizer") {
    val cfg = AnalyzerConfig.default
    assert(cfg.isDefault && cfg.spec == "")
    assert(cfg.analyze("parseHttpResponse").toSeq ==
      Tokenizer.tokenize("parseHttpResponse").toSeq)
  }

  test("stop filter runs BEFORE the stemmer (surface-form stopwords)") {
    val cfg = AnalyzerConfig(stopwords = Set("the", "import"), stem = true)
    // "the" is dropped; "imports" is NOT (stopwords match surface form,
    // and "imports" stems to "import" only AFTER the stop filter)
    assert(cfg.analyze("the imports of the parser").toSeq ==
      Seq("import", "of", "parser"))
    // camelCase splits happen before filtering: theParser drops "the"
    assert(cfg.analyze("theParser").toSeq == Seq("parser"))
  }

  test("stemming conflates families; positions close over removed stopwords") {
    val cfg = AnalyzerConfig(stopwords = Set("a", "the"), stem = true)
    assert(cfg.analyze("connecting the connections").toSeq ==
      Seq("connect", "connect"))
    // index positions are post-filter: "spark the query" → spark@0, query@1,
    // so an adjacent phrase across a dropped stopword matches
    val toks = cfg.analyze("spark the query")
    assert(toks.toSeq == Seq("spark", "queri"))
  }

  test("spec round-trips canonically; unknown filters rejected loudly") {
    val cfg = AnalyzerConfig(stopwords = Set("b", "a"), stem = true)
    assert(cfg.spec == "stop=a,b;stem=porter") // sorted, stable
    assert(AnalyzerConfig.parse(cfg.spec) == cfg)
    assert(AnalyzerConfig.parse("") == AnalyzerConfig.default)
    assert(AnalyzerConfig.parse("stem=porter") == AnalyzerConfig(stem = true))
    assert(AnalyzerConfig.parse("stop=x,y") ==
      AnalyzerConfig(stopwords = Set("x", "y")))
    intercept[IllegalArgumentException] { AnalyzerConfig.parse("stem=snowball") }
    intercept[IllegalArgumentException] { AnalyzerConfig.parse("lower") }
    // structural characters in a stopword would corrupt the manifest spec
    intercept[IllegalArgumentException] {
      AnalyzerConfig.validate(AnalyzerConfig(stopwords = Set("a;b")))
    }
  }

  test("edge_ngram: leading grams per token, index side only") {
    val cfg = AnalyzerConfig(edgeNgram = Some((2, 4)))
    // per token: prefixes of length 2..min(4, len); < 2 chars dropped
    assert(cfg.analyze("spark is").toSeq ==
      Seq("sp", "spa", "spar", "is"))
    // the query chain strips the expansion: a typed prefix stays itself
    assert(cfg.analyzeQuery("spa").toSeq == Seq("spa"))
    assert(cfg.queryChain.isDefault)
    // composes after stop/stem: the stem is what gets grammed
    val full = AnalyzerConfig(stopwords = Set("the"), stem = true,
      edgeNgram = Some((2, 3)))
    assert(full.analyze("the queries").toSeq == Seq("qu", "que"))
    assert(full.analyzeQuery("the queries").toSeq == Seq("queri"))
  }

  test("shingle: word n-grams both sides, no unigrams") {
    val cfg = AnalyzerConfig(shingles = Some((2, 3)))
    assert(cfg.analyze("batch window agg").toSeq ==
      Seq("batch window", "batch window agg", "window agg"))
    // query side shingles IDENTICALLY (the _2gram phrase behavior)
    assert(cfg.analyzeQuery("batch window").toSeq == Seq("batch window"))
    // a doc shorter than min emits nothing
    assert(cfg.analyze("single").isEmpty)
  }

  test("gram specs round-trip; bounds and composition validated") {
    val e = AnalyzerConfig(stopwords = Set("a"), edgeNgram = Some((2, 8)))
    assert(e.spec == "stop=a;edge=2,8")
    assert(AnalyzerConfig.parse(e.spec) == e)
    val sh = AnalyzerConfig(stem = true, shingles = Some((2, 2)))
    assert(sh.spec == "stem=porter;shingle=2,2")
    assert(AnalyzerConfig.parse(sh.spec) == sh)
    intercept[IllegalArgumentException] { AnalyzerConfig.parse("edge=0,3") }
    intercept[IllegalArgumentException] { AnalyzerConfig.parse("edge=5,3") }
    intercept[IllegalArgumentException] { AnalyzerConfig.parse("shingle=1,2") }
    intercept[IllegalArgumentException] { AnalyzerConfig.parse("edge=x,3") }
    intercept[IllegalArgumentException] {
      AnalyzerConfig.parse("shingle=2,2;edge=2,3")
    }
  }

  test("Column form equals the driver-side analyze row for row") {
    import spark.implicits._
    val cfg = AnalyzerConfig(stopwords = Set("the", "def"), stem = true)
    val texts = Seq(
      "def parseHttpResponse(the request)",
      "the quick streaming aggregations",
      "tokenizedQueries partitioned buffers",
      "", "justoneword")
    val got = texts.toDF("s")
      .select(cfg.tokens(col("s")).as("toks"))
      .as[Seq[String]].collect().toSeq
    assert(got == texts.map(cfg.analyze(_).toSeq))
    // gram chains run through the same one-call codegen expression
    for (g <- Seq(AnalyzerConfig(edgeNgram = Some((2, 5))),
        AnalyzerConfig(shingles = Some((2, 2)), stopwords = Set("the")))) {
      val gotG = texts.toDF("s")
        .select(g.tokens(col("s")).as("toks"))
        .as[Seq[String]].collect().toSeq
      assert(gotG == texts.map(g.analyze(_).toSeq), s"chain ${g.spec}")
    }
    // the default chain's column form is the bare codegen tokenizer
    val gotDefault = texts.toDF("s")
      .select(AnalyzerConfig.default.tokens(col("s")).as("toks"))
      .as[Seq[String]].collect().toSeq
    assert(gotDefault == texts.map(Tokenizer.tokenize(_).toSeq))
  }
}
