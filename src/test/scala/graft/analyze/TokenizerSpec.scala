package graft.analyze

import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {
  private def t(s: String): List[String] = Tokenizer.tokenize(s).toList

  test("whitespace and punctuation split") {
    assert(t("def foo(bar, baz)") == List("def", "foo", "bar", "baz"))
  }

  test("snake_case splits") {
    assert(t("parse_http_response") == List("parse", "http", "response"))
  }

  test("camelCase splits") {
    assert(t("parseHttpResponse") == List("parse", "http", "response"))
  }

  test("acronym followed by TitleCase splits before last upper") {
    assert(t("HTTPResponse") == List("http", "response"))
    assert(t("parseHTTPResponse") == List("parse", "http", "response"))
  }

  test("digit boundaries split") {
    assert(t("utf8Codec") == List("utf", "8", "codec"))
    assert(t("base64") == List("base", "64"))
  }

  test("mixed code line") {
    assert(t("val myVar_2 = readFile(path)") ==
      List("val", "my", "var", "2", "read", "file", "path"))
  }

  test("null and empty inputs are empty") {
    assert(t(null) == Nil)
    assert(t("") == Nil)
    assert(t("  \n\t ---") == Nil)
  }

  test("all-caps token stays whole") {
    assert(t("CONSTANT") == List("constant"))
  }

  test("tokens longer than MaxTokenLen are split, nothing dropped") {
    val long = "a" * 150
    val got = t(long)
    assert(got.map(_.length).sum == 150)
    assert(got.forall(_.length <= Tokenizer.MaxTokenLen))
  }

  test("deterministic") {
    val s = "Some mixedCase_and snake_case with HTTP2Server"
    assert(t(s) == t(s))
  }
}
