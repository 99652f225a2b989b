package graft.compare

import org.scalatest.funsuite.AnyFunSuite

/** Pins the diff taxonomy + path grammar the reference's tests pin
  * (test_response_comparison.py:35-83, README "Understanding the output"),
  * re-specified over our own fixtures. */
class JsonDiffSpec extends AnyFunSuite {
  private def d(l: String, r: String, ex: Seq[String] = Nil) = JsonDiff.diff(l, r, ex).toList

  test("identical documents produce no diff") {
    assert(d("""{"a":1,"b":[1,2]}""", """{"a":1,"b":[1,2]}""") == Nil)
    assert(d("200", "200") == Nil)
  }

  test("scalar value change → values_changed with old/new") {
    assert(d("""{"hello":"world"}""", """{"hello":"goodbye"}""") ==
      List(DiffEntry("root['hello']", "values_changed", "world", "goodbye")))
  }

  test("status-code style int change at root") {
    assert(d("200", "404") == List(DiffEntry("root", "values_changed", "200", "404")))
  }

  test("type change int → string and int → float") {
    assert(d("""{"x":1}""", """{"x":"1"}""") ==
      List(DiffEntry("root['x']", "type_changes", "1", "1")))
    assert(d("""{"x":1}""", """{"x":1.0}""") ==
      List(DiffEntry("root['x']", "type_changes", "1", "1.0")))
  }

  test("dictionary item added and removed") {
    assert(d("""{"a":1,"gone":2}""", """{"a":1,"new":3}""").toSet == Set(
      DiffEntry("root['gone']", "dictionary_item_removed", "2", ""),
      DiffEntry("root['new']", "dictionary_item_added", "", "3")))
  }

  test("list order is significant: swapped elements are two values_changed") {
    assert(d("""{"hello":["a","b"]}""", """{"hello":["b","a"]}""") == List(
      DiffEntry("root['hello'][0]", "values_changed", "a", "b"),
      DiffEntry("root['hello'][1]", "values_changed", "b", "a")))
  }

  test("list length mismatch → iterable_item_added/removed at the tail") {
    assert(d("""[1,2,3]""", """[1]""") == List(
      DiffEntry("root[1]", "iterable_item_removed", "2", ""),
      DiffEntry("root[2]", "iterable_item_removed", "3", "")))
    assert(d("""[1]""", """[1,2]""") == List(
      DiffEntry("root[1]", "iterable_item_added", "", "2")))
  }

  test("nested path grammar root['a'][0]['b']") {
    assert(d("""{"a":[{"b":1}]}""", """{"a":[{"b":2}]}""") ==
      List(DiffEntry("root['a'][0]['b']", "values_changed", "1", "2")))
  }

  test("excluded paths are masked, including everything nested under them") {
    val l = """{"took":5,"version":{"number":"7.10"},"hits":1}"""
    val r = """{"took":9,"version":{"number":"1.0"},"hits":1}"""
    assert(d(l, r, Seq("root['took']", "root['version']")) == Nil)
    // but a non-masked sibling still reports
    val r2 = """{"took":9,"version":{"number":"1.0"},"hits":2}"""
    assert(d(l, r2, Seq("root['took']", "root['version']")) ==
      List(DiffEntry("root['hits']", "values_changed", "1", "2")))
  }

  test("missing field tolerance: one side missing key is a dict diff, not an error") {
    assert(d("""{"a":1}""", """{}""") ==
      List(DiffEntry("root['a']", "dictionary_item_removed", "1", "")))
  }

  test("unparsable input falls back to string scalar comparison") {
    assert(d("not json {", "not json {") == Nil)
    assert(d("not json", "other text") ==
      List(DiffEntry("root", "values_changed", "not json", "other text")))
    // string vs object → type change
    assert(d("plain", """{"a":1}""").map(_.kind) == List("type_changes"))
  }

  test("null handling") {
    assert(d(null, null) == Nil)
    assert(d("""{"a":null}""", """{"a":null}""") == Nil)
    assert(d("""{"a":null}""", """{"a":1}""").map(_.kind) == List("type_changes"))
  }

  test("deterministic ordering: keys visited sorted") {
    val l = """{"z":1,"a":1,"m":1}"""
    val r = """{"z":2,"a":2,"m":2}"""
    assert(d(l, r).map(_.path) == List("root['a']", "root['m']", "root['z']"))
  }
}
