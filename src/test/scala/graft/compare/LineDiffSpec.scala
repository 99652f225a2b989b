package graft.compare

import org.scalatest.funsuite.AnyFunSuite

/** Golden fidelity tests: every expected sequence below is the VERBATIM
  * output of CPython 3 `list(difflib.Differ().compare(a, b))` for the
  * same inputs (generated offline), so this pins byte-level parity with
  * the reference's diff export (reports.py:105-138) including `?` hint
  * rows and their difflib-carried trailing newlines. */
class LineDiffSpec extends AnyFunSuite {

  test("replaced-line mismatch: fancy replace emits aligned ? hint rows") {
    val a = IndexedSeq("Status code: 200", "Headers: {'content-type': 'json'}",
      "{", "    \"hits\": 1,", "    \"took\": 3", "}")
    val b = IndexedSeq("Status code: 404", "Headers: {'content-type': 'html'}",
      "{", "    \"hits\": 2", "}")
    assert(LineDiff.compare(a, b) == Seq(
      "- Status code: 200",
      "?              ^ ^\n",
      "+ Status code: 404",
      "?              ^ ^\n",
      "- Headers: {'content-type': 'json'}",
      "?                            ^^^^\n",
      "+ Headers: {'content-type': 'html'}",
      "?                            ^^^^\n",
      "  {",
      "-     \"hits\": 1,",
      "?             ^^\n",
      "+     \"hits\": 2",
      "?             ^\n",
      "-     \"took\": 3",
      "  }"))
  }

  test("pure delete keeps common lines unhinted") {
    assert(LineDiff.compare(IndexedSeq("alpha", "beta", "gamma"),
      IndexedSeq("alpha", "gamma")) == Seq("  alpha", "- beta", "  gamma"))
  }

  test("dissimilar replace stays plain (no hints), shorter block dumped first") {
    assert(LineDiff.compare(IndexedSeq("one two three"),
      IndexedSeq("completely unrelated line", "and another")) == Seq(
      "- one two three",
      "+ completely unrelated line",
      "+ and another"))
  }

  test("line-level matching anchors on the equal line across a move") {
    assert(LineDiff.compare(IndexedSeq("shared", "abcdefgh"),
      IndexedSeq("abxdefgh", "shared")) == Seq(
      "+ abxdefgh", "  shared", "- abcdefgh"))
  }

  test("hint rows preserve original whitespace (tabs) under blank tags") {
    assert(LineDiff.compare(
      IndexedSeq(" indented line", "tab\tseparated"),
      IndexedSeq("  indented line", "tab\tseparated!")) == Seq(
      "-  indented line",
      "+   indented line",
      "? +\n",
      "- tab\tseparated",
      "+ tab\tseparated!",
      "?    \t         +\n"))
  }
}
