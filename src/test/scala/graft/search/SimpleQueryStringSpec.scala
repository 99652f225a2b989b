package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Pure parser pins for [[SimpleQueryString]] — no Spark. The prefix
  * resolver is a fixed fake dictionary so expansion is deterministic. */
class SimpleQueryStringSpec extends AnyFunSuite {

  private val dict: String => Array[String] = {
    case "par" => Array("parse", "parser", "part")
    case "qu"  => Array("query", "queue")
    case _     => Array.empty[String]
  }

  private def p(text: String, defaultAnd: Boolean = false): Option[SpanQuery] =
    SimpleQueryString.parseWith(text, defaultAnd, dict)

  test("single word, phrase, and prefix leaves") {
    assert(p("spark") == Some(SpanTerm("spark")))
    assert(p("\"group sort\"") ==
      Some(SpanNear(Seq(SpanTerm("group"), SpanTerm("sort")), 0)))
    assert(p("\"group sort\"~2") ==
      Some(SpanNear(Seq(SpanTerm("group"), SpanTerm("sort")), 2)))
    assert(p("par*") == Some(SpanOr(Seq(
      SpanTerm("parse"), SpanTerm("parser"), SpanTerm("part")))))
    // a camelCase word's split tokens stay adjacent
    assert(p("groupSort") ==
      Some(SpanNear(Seq(SpanTerm("group"), SpanTerm("sort")), 0)))
  }

  test("default operator: juxtaposition is OR unless default_and") {
    assert(p("spark query") ==
      Some(SpanOr(Seq(SpanTerm("spark"), SpanTerm("query")))))
    assert(p("spark query", defaultAnd = true) ==
      Some(SpanAnd(Seq(SpanTerm("spark"), SpanTerm("query")))))
  }

  test("explicit operators and precedence: | loosest, + tighter") {
    assert(p("a + b | c") == Some(SpanOr(Seq(
      SpanAnd(Seq(SpanTerm("a"), SpanTerm("b"))), SpanTerm("c")))))
    assert(p("a | b + c") == Some(SpanOr(Seq(
      SpanTerm("a"), SpanAnd(Seq(SpanTerm("b"), SpanTerm("c")))))))
    // grouping overrides
    assert(p("a + (b | c)") == Some(SpanAnd(Seq(
      SpanTerm("a"), SpanOr(Seq(SpanTerm("b"), SpanTerm("c")))))))
  }

  test("negation: doc-level guard bound to its conjunction") {
    assert(p("a + -b") ==
      Some(SpanDocNot(SpanTerm("a"), SpanTerm("b"))))
    assert(p("a -b", defaultAnd = true) ==
      Some(SpanDocNot(SpanTerm("a"), SpanTerm("b"))))
    assert(p("a + b + -c + -d") == Some(SpanDocNot(
      SpanAnd(Seq(SpanTerm("a"), SpanTerm("b"))),
      SpanOr(Seq(SpanTerm("c"), SpanTerm("d"))))))
    // a bare negated disjunct hoists to the whole disjunction (the
    // OpenSearch must_not-regardless-of-default_operator behavior)
    assert(p("a | -b") == Some(SpanDocNot(SpanTerm("a"), SpanTerm("b"))))
    assert(p("a b -c") == Some(SpanDocNot(
      SpanOr(Seq(SpanTerm("a"), SpanTerm("b"))), SpanTerm("c"))))
    // ...but a negation INSIDE an AND group guards only that conjunction
    assert(p("a + -b | c") == Some(SpanOr(Seq(
      SpanDocNot(SpanTerm("a"), SpanTerm("b")), SpanTerm("c")))))
    // all-negation has no bounded match set
    assert(p("-a") == None)
    assert(p("-a | -b") == None)
    // double negation cancels
    assert(p("a + --b") == Some(SpanAnd(Seq(SpanTerm("a"), SpanTerm("b")))))
  }

  test("lenience: malformed syntax never throws") {
    assert(p("\"unclosed phrase") ==
      Some(SpanNear(Seq(SpanTerm("unclosed"), SpanTerm("phrase")), 0)))
    assert(p("a ) b") == Some(SpanOr(Seq(SpanTerm("a"), SpanTerm("b")))))
    assert(p("(a + b") == Some(SpanAnd(Seq(SpanTerm("a"), SpanTerm("b")))))
    assert(p("a + ()") == Some(SpanTerm("a")))
    assert(p("| a") == Some(SpanTerm("a")))
    assert(p("a +") == Some(SpanTerm("a")))
    assert(p("") == None)
    assert(p("   ") == None)
  }

  test("word~N wires to the fuzzy expansion; ~0 degrades to the exact term") {
    val fuzzy: (String, Int) => Array[String] = {
      case ("spark", 1) => Array("spark", "sparks")
      case ("spark", 2) => Array("spark", "sparks", "shark")
      case _            => Array.empty[String]
    }
    def pf(text: String) = SimpleQueryString.parseWith(text, false, dict, fuzzy)
    assert(pf("spark~1") ==
      Some(SpanOr(Seq(SpanTerm("spark"), SpanTerm("sparks")))))
    // bare ~ defaults to 2 edits; explicit larger values clamp to 2
    assert(pf("spark~") == pf("spark~2"))
    assert(pf("spark~7") ==
      Some(SpanOr(Seq(SpanTerm("spark"), SpanTerm("sparks"), SpanTerm("shark")))))
    // ~0 is the exact term, not an expansion
    assert(pf("spark~0") == Some(SpanTerm("spark")))
    // a fuzzy word expanding to nothing matches nothing (multi-term
    // contract) but parses — never a literal token "2" conjunct
    assert(pf("zz~2") == Some(SpanOr(Seq.empty)))
    // a camelCase fuzzy word keeps its split tokens adjacent, each fuzzy
    assert(pf("sparkZz~1") == Some(SpanNear(Seq(
      SpanOr(Seq(SpanTerm("spark"), SpanTerm("sparks"))), SpanOr(Seq.empty)), 0)))
    // a '~' that is not a numeric suffix stays literal text
    assert(pf("a~b") == Some(SpanNear(Seq(SpanTerm("a"), SpanTerm("b")), 0)))
  }

  test("empty prefix expansion matches nothing but stays a valid query") {
    // zz* expands to nothing: an empty SpanOr (match-nothing), kept so
    // search returns cleanly empty rather than erroring
    val q = p("zz*")
    assert(q == Some(SpanOr(Seq.empty)))
    assert(Spans.spans(q.get, _ => Array.emptyLongArray).isEmpty)
    // ...and inside an AND it voids the conjunction for every doc
    val and = p("spark + zz*").get
    assert(Spans.spans(and, t => if (t == "spark") Array(0L) else Array.emptyLongArray).isEmpty)
  }
}
