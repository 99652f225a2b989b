package graft.compare

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HarnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Int, Int, String, Double)]) =
    rows.toDF("query_id", "rank", "doc_id", "score")

  test("compare labels every divergence kind") {
    val golden = df(Seq(
      (1, 1, "a", 1.0), (1, 2, "b", 0.9), (1, 3, "c", 0.8),
      (2, 1, "x", 2.0)))
    val fast = df(Seq(
      (1, 1, "a", 1.0),          // identical
      (1, 2, "zz", 0.9),         // doc_changed
      (1, 3, "c", 0.75),         // score_changed
      (2, 1, "x", 2.0), (2, 2, "extra", 1.5))) // rank_only_in_fast
    val cmp = Harness.compare(golden, fast)
    val kinds = cmp.select("query_id", "rank", "kind")
      .as[(Int, Int, String)].collect().map { case (q, r, k) => (q, r) -> k }.toMap
    assert(kinds((1, 1)) == "identical")
    assert(kinds((1, 2)) == "doc_changed")
    assert(kinds((1, 3)) == "score_changed")
    assert(kinds((2, 1)) == "identical")
    assert(kinds((2, 2)) == "rank_only_in_fast")
    val c = Harness.correctness(cmp)
    assert(c.total == 5 && c.identical == 2)
  }

  test("compare flags rank rows missing in fast") {
    val cmp = Harness.compare(df(Seq((1, 1, "a", 1.0), (1, 2, "b", 0.5))),
      df(Seq((1, 1, "a", 1.0))))
    assert(cmp.filter($"kind" === "rank_missing_in_fast").count() == 1)
  }

  test("scoreEps tolerates small float drift when requested") {
    val g = df(Seq((1, 1, "a", 1.0)))
    val f = df(Seq((1, 1, "a", 1.0 + 1e-12)))
    assert(!Harness.compare(g, f).head().getAs[Boolean]("identical"))
    assert(Harness.compare(g, f, scoreEps = 1e-9).head().getAs[Boolean]("identical"))
  }

  test("diffReportText renders mismatch lines") {
    val txt = Harness.diffReportText(Harness.compare(
      df(Seq((1, 1, "a", 1.0))), df(Seq((1, 1, "b", 1.0)))))
    assert(txt.contains("doc_changed") && txt.contains("rank=1"))
  }
}
