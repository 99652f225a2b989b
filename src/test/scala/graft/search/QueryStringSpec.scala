package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Pure pins for [[QueryString.extract]] — predicate construction is
  * Column-expression building, no session needed; predicates are
  * compared by their stable expression rendering. */
class QueryStringSpec extends AnyFunSuite {

  private val allowed = Set("lang", "dl", "repo")

  private def ex(text: String): (Seq[String], String) = {
    val (preds, rest) = QueryString.extract(text, allowed)
    (preds.map(_.toString), rest)
  }

  test("fielded equality and ranges extract; the text core survives") {
    val (p1, r1) = ex("lang:en spark + query")
    assert(p1.size == 1 && p1.head.contains("lang") && p1.head.contains("en")
      && r1.trim == "spark + query")
    val (p2, r2) = ex("""dl:[40 TO 200] def""")
    assert(p2.size == 1 && p2.head.contains(">=") && p2.head.contains("40.0") &&
      p2.head.contains("<=") && p2.head.contains("200.0") && r2.trim == "def")
    // exclusive braces and open ends
    val (p3, _) = ex("dl:{40 TO *} def")
    assert(p3.head.contains(">") && p3.head.contains("40.0") &&
      p3.head.contains("true"))
    val (p4, _) = ex("dl:[* TO 200} def")
    assert(p4.head.contains("<") && p4.head.contains("200.0") &&
      p4.head.contains("true"))
    // several fielded conjuncts
    val (p5, r5) = ex("lang:en dl:[40 TO 200] spark")
    assert(p5.size == 2 && r5.trim.replaceAll("\\s+", " ") == "spark")
  }

  test("a negated fielded clause inverts the predicate null-safely") {
    val (p, r) = ex("-lang:en spark")
    assert(p.size == 1 && p.head.contains("!") && r.trim == "spark")
    val (p2, r2) = ex("spark -dl:[40 TO 200]")
    assert(p2.size == 1 && p2.head.contains("!") && r2.trim == "spark")
    // positive clauses are untouched
    val (p3, _) = ex("lang:en spark")
    assert(!p3.head.contains("!"))
  }

  test("a colon inside a quoted phrase is text, not a field") {
    val (p, r) = ex(""""lang:en is quoted" spark""")
    assert(p.isEmpty && r == """"lang:en is quoted" spark""")
  }

  test("unknown fields are rejected loudly (unmapped-field strictness)") {
    intercept[IllegalArgumentException] { ex("bogus:x spark") }
  }

  test("a colon mid-token never extracts a field: only standalone clauses do") {
    // the tail of a hyphenated word must NOT become a fielded clause
    // (would throw unknown-field for text the user meant literally)
    val (p1, r1) = ex("foo-b:c spark")
    assert(p1.isEmpty && r1 == "foo-b:c spark")
    // a URL's scheme colon flows through to the lenient text core
    val (p2, r2) = ex("spark http://x")
    assert(p2.isEmpty && r2 == "spark http://x")
    // ...while the same clause standing alone still extracts
    val (p3, r3) = ex("lang:en spark")
    assert(p3.size == 1 && r3.trim == "spark")
    // and a parenthesized or negated standalone clause still extracts
    val (p4, _) = ex("(lang:en) spark")
    assert(p4.size == 1)
    val (p5, _) = ex("-lang:en spark")
    assert(p5.size == 1 && p5.head.contains("!"))
    // the structural operators '|' and '+' are token boundaries too:
    // a clause right after them still extracts (review fix — the
    // boundary lookbehind must not treat them as mid-token chars)
    val (p6, r6) = ex("spark|lang:en")
    assert(p6.size == 1 && r6.contains("spark"))
    val (p7, _) = ex("+lang:en spark")
    assert(p7.size == 1)
  }
}
