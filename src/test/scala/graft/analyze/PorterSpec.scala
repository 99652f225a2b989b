package graft.analyze

import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[Porter]] against worked examples from the published
  * algorithm (Porter 1980) — each step's illustrative pairs plus
  * end-to-end conflations. Pure, no Spark. */
class PorterSpec extends AnyFunSuite {

  test("step 1: plurals and -ed/-ing") {
    assert(Porter.stem("caresses") == "caress")
    assert(Porter.stem("ponies") == "poni")
    assert(Porter.stem("caress") == "caress")
    assert(Porter.stem("cats") == "cat")
    assert(Porter.stem("feed") == "feed")
    // 1b gives agree, then 5a (m=1, not *o) drops the e — the official
    // vocabulary output is "agre"
    assert(Porter.stem("agreed") == "agre")
    assert(Porter.stem("plastered") == "plaster")
    assert(Porter.stem("bled") == "bled")
    assert(Porter.stem("motoring") == "motor")
    assert(Porter.stem("sing") == "sing")
    // post-strip cleanups: at/bl/iz get an e (which step 5a then drops
    // when the measure allows — official vocabulary outputs), double
    // consonants drop, cvc stems keep their e
    assert(Porter.stem("conflated") == "conflat")
    assert(Porter.stem("troubled") == "troubl")
    assert(Porter.stem("sized") == "size")
    assert(Porter.stem("hopping") == "hop")
    assert(Porter.stem("tanned") == "tan")
    assert(Porter.stem("falling") == "fall")
    assert(Porter.stem("hissing") == "hiss")
    assert(Porter.stem("fizzed") == "fizz")
    assert(Porter.stem("failing") == "fail")
    assert(Porter.stem("filing") == "file")
    // 1c: y → i after a vowel-bearing stem
    assert(Porter.stem("happy") == "happi")
    assert(Porter.stem("sky") == "sky")
  }

  test("steps 2-4: derivational suffixes under the measure conditions") {
    assert(Porter.stem("relational") == "relat")
    assert(Porter.stem("conditional") == "condit")
    assert(Porter.stem("rational") == "ration")
    assert(Porter.stem("electrical") == "electr")
    assert(Porter.stem("hopefulness") == "hope")
    assert(Porter.stem("goodness") == "good")
    assert(Porter.stem("adjustment") == "adjust")
    assert(Porter.stem("adoption") == "adopt")
    assert(Porter.stem("adjustable") == "adjust")
    assert(Porter.stem("formalize") == "formal")
    assert(Porter.stem("sensitivity") == "sensit")
    assert(Porter.stem("dependent") == "depend")
  }

  test("step 5 and conflation families") {
    assert(Porter.stem("controlling") == "control")
    assert(Porter.stem("rolling") == "roll")
    assert(Porter.stem("probate") == "probat")
    assert(Porter.stem("rate") == "rate")
    // the property stemming exists for: a family maps to one stem
    val connectFamily = Seq("connect", "connected", "connecting",
      "connection", "connections")
    assert(connectFamily.map(Porter.stem).toSet == Set("connect"))
    assert(Porter.stem("relate") == Porter.stem("relational"))
  }

  test("short words, non-alphabetic tokens, and nulls pass through") {
    assert(Porter.stem("by") == "by")
    assert(Porter.stem("is") == "is")
    assert(Porter.stem("a") == "a")
    assert(Porter.stem("utf8") == "utf8") // digit: not a stemmable word
    assert(Porter.stem("x86") == "x86")
    assert(Porter.stem(null) == null)
    assert(Porter.stem("") == "")
  }

  test("code-vocabulary families conflate to one stem") {
    // (Porter is deliberately NOT idempotent — e.g. parsing→pars→par —
    // so the property that matters for retrieval is family conflation
    // after ONE application, which is how the chain applies it.)
    assert(Seq("parsing", "parsed", "parses").map(Porter.stem).toSet
      == Set("pars"))
    assert(Seq("tokenizer", "tokenized", "tokenizing").map(Porter.stem).toSet
      == Set("token"))
    assert(Seq("partitions", "partitioned", "partitioning").map(Porter.stem).toSet
      == Set("partit"))
    assert(Seq("streaming", "streamed", "streams").map(Porter.stem).toSet
      == Set("stream"))
    assert(Seq("aggregations", "aggregated", "aggregating").map(Porter.stem).toSet
      == Set("aggreg"))
  }
}
