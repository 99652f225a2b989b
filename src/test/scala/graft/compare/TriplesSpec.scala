package graft.compare

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TriplesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def gzipB64(s: String): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes("UTF-8")); gz.close()
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  private def line(reqExtra: String = "", primaryBody: String = b64("""{"ok":1}"""),
                   shadowBody: String = b64("""{"ok":1}"""),
                   primaryExtra: String = "", shadowExtra: String = "",
                   uri: String = "/index/_search"): String =
    s"""{"request":{"Request-URI":"$uri","Method":"GET","HTTP-Version":"HTTP/1.1","body":"${b64("{}")}","Accept":"*/*","Host":"localhost:9200"$reqExtra},""" +
    s""""primaryResponse":{"HTTP-Version":"HTTP/1.1","Status-Code":"200","Reason-Phrase":"OK","response_time_ms":14,"body":"$primaryBody","Content-Type":"application/json"$primaryExtra},""" +
    s""""shadowResponse":{"HTTP-Version":"HTTP/1.1","Status-Code":"200","Reason-Phrase":"OK","response_time_ms":80,"body":"$shadowBody","Content-Type":"application/json"$shadowExtra}}"""

  test("plain triple: fields popped, residue becomes headers, ignored fields dropped") {
    val t = Triples.parseLine(line()).get
    assert(t.request.method == "GET")
    assert(t.request.uri == "/index/_search")
    assert(t.request.headers == Map("Accept" -> "*/*", "Host" -> "localhost:9200"))
    assert(!t.request.headers.contains("HTTP-Version")) // dropped, not a header
    assert(t.primary.status.contains(200))
    assert(t.primary.latencyMs.contains(14L))
    assert(t.shadow.latencyMs.contains(80L))
    assert(t.primary.body == """{"ok":1}""")
  }

  test("response header keys are lowercased; request keys are not") {
    val t = Triples.parseLine(line()).get
    assert(t.primary.headers.keySet == Set("content-type"))
    assert(t.request.headers.contains("Accept"))
  }

  test("gzipped body is decompressed when content-encoding says gzip") {
    val payload = """{"compressed":true,"n":42}"""
    val t = Triples.parseLine(line(
      primaryBody = gzipB64(payload),
      primaryExtra = ""","content-encoding":"gzip"""")).get
    assert(t.primary.body == payload)
  }

  test("corrupt gzip yields empty body, not a failure (skip-and-log semantics)") {
    val t = Triples.parseLine(line(
      primaryBody = b64("definitely not gzip"),
      primaryExtra = ""","content-encoding":"gzip"""")).get
    assert(t.primary.body == "")
  }

  test("bulk NDJSON request: body parsed per line, bad lines dropped") {
    val ndjson = "{\"index\":{\"_id\":1}}\n{\"f\":\"v1\"}\nnot json\n{\"f\":\"v2\"}"
    val t = Triples.parseLine(line(uri = "/idx/_bulk",
      primaryBody = b64(ndjson), shadowBody = b64(ndjson))).get
    assert(t.primary.body == """[{"index":{"_id":1}},{"f":"v1"},{"f":"v2"}]""")
  }

  test("malformed lines are skipped, well-formed survive") {
    import spark.implicits._
    val lines = Seq(line(), "not json at all", """{"request":{}}""", line()).toDS()
    val parsed = Triples.parse(spark, lines)
    assert(parsed.count() == 2)
    assert(lines.count() - parsed.count() == 2) // the dead-letter count
  }

  test("required fields: a line missing Method / body / Status-Code is skipped") {
    // reference parity: bare dict.pop(key) aborts the line into
    // skip-and-log (log_file_loader.py:85-87,102)
    assert(Triples.parseLine(line().replace(""""Method":"GET",""", "")).isEmpty)
    assert(Triples.parseLine(line()
      .replaceFirst(""""body":"[^"]*"""", """"nobody":"x"""")).isEmpty)
    assert(Triples.parseLine(line()
      .replaceFirst(""""Status-Code":"200"""", """"Status-Code":null""")).isEmpty)
  }

  test("non-integer Status-Code is skipped, integer-shaped string parses") {
    assert(Triples.parseLine(line()
      .replaceFirst(""""Status-Code":"200"""", """"Status-Code":"N/A"""")).isEmpty)
    // every fixture line uses string statuses — pin the parse explicitly
    assert(Triples.parseLine(line()).get.primary.status.contains(200))
  }

  test("compare: identical responses flagged identical") {
    import spark.implicits._
    val cmp = Triples.compare(Triples.parse(spark, Seq(line()).toDS()))
    val row = cmp.head()
    assert(row.getAs[Boolean]("identical"))
  }

  test("compare: masked volatile fields (took, date header) do not break identity") {
    import spark.implicits._
    val l = line(
      primaryBody = b64("""{"took":5,"hits":{"total":7}}"""),
      shadowBody = b64("""{"took":99,"hits":{"total":7}}"""),
      primaryExtra = ""","Date":"Mon, 01 Jan 2024 00:00:00 GMT"""",
      shadowExtra = ""","Date":"Tue, 02 Jan 2024 11:11:11 GMT"""")
    val cmp = Triples.compare(Triples.parse(spark, Seq(l).toDS()))
    assert(cmp.head().getAs[Boolean]("identical"))
  }

  test("compare: real differences are reported with the right kinds") {
    import spark.implicits._
    val l = line(
      primaryBody = b64("""{"hits":1,"only_primary":true}"""),
      shadowBody = b64("""{"hits":2}"""))
    val cmp = Triples.compare(Triples.parse(spark, Seq(l).toDS()))
    val row = cmp.head()
    assert(!row.getAs[Boolean]("identical"))
    val kinds = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("body_diff")
      .map(_.getAs[String]("kind")).toSet
    assert(kinds == Set("values_changed", "dictionary_item_removed"))
  }

  test("status difference is a root values_changed") {
    import spark.implicits._
    val l = line().replace(""""Status-Code":"200","Reason-Phrase":"OK","response_time_ms":80""",
      """"Status-Code":"500","Reason-Phrase":"ERR","response_time_ms":80""")
    val cmp = Triples.compare(Triples.parse(spark, Seq(l).toDS()))
    val row = cmp.head()
    assert(!row.getAs[Boolean]("identical"))
    val sd = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("status_diff")
    assert(sd.map(r => (r.getAs[String]("path"), r.getAs[String]("kind"))) ==
      Seq(("root", "values_changed")))
  }

  test("json-lines sink round-trips through spark json parsing") {
    import spark.implicits._
    val cmp = Triples.compare(Triples.parse(spark, Seq(line()).toDS()))
    val js = Triples.toJsonLines(cmp).collect()
    assert(js.length == 1 && js(0).contains("\"identical\":true"))
  }

  test("S5 source: fromJsonLines round-trips comparison rows; malformed lines drop") {
    import spark.implicits._
    val cmp = Triples.compare(Triples.parse(spark, Seq(
      line(),
      line(primaryBody = b64("""{"hits":1}"""), shadowBody = b64("""{"hits":2}"""))).toDS()))
    val js = Triples.toJsonLines(cmp)
    val back = Triples.fromJsonLines(spark, js.union(Seq("not json", """{"x":1}""").toDS()))
    assert(back.count() == 2) // the two junk lines dropped
    // exact round trip: re-serializing the parsed rows reproduces the lines
    assert(Triples.toJsonLines(back).collect().sorted.toSeq ==
      js.collect().sorted.toSeq)
  }

  test("two-stream matching joins on request equivalence, occurrence-disambiguated") {
    import spark.implicits._
    def req(method: String, uri: String, body: String) =
      ParsedRequest(None, method, uri, Map.empty, body)
    def resp(ts: Long, status: Int) =
      ParsedResponse(Some(ts), Some(status), Some(1L), Map.empty, s"""{"at":$ts}""")
    val primary = Seq(
      RequestResponse(req("GET", "/a", ""), resp(10, 200)),
      RequestResponse(req("GET", "/a", ""), resp(20, 201)), // duplicate request
      RequestResponse(req("PUT", "/b", "x"), resp(30, 200)),
      RequestResponse(req("GET", "/only-primary", ""), resp(40, 200))).toDS()
    val shadow = Seq(
      RequestResponse(req("GET", "/a", ""), resp(11, 500)),
      RequestResponse(req("GET", "/a", ""), resp(21, 201)),
      RequestResponse(req("PUT", "/b", "x"), resp(31, 200)),
      RequestResponse(req("DELETE", "/only-shadow", ""), resp(41, 200))).toDS()
    val triples = Triples.matchStreams(spark, primary, shadow).collect()
    // unmatched requests on either side drop out (inner join)
    assert(triples.length == 3)
    val byUri = triples.groupBy(_.request.uri)
    // i-th occurrence pairs with i-th occurrence: (10,11) and (20,21)
    val aPairs = byUri("/a").map(t => (t.primary.timestamp.get, t.shadow.timestamp.get)).toSet
    assert(aPairs == Set((10L, 11L), (20L, 21L)))
    assert(byUri("/b").head.shadow.status.contains(200))
    assert(!byUri.contains("/only-primary") && !byUri.contains("/only-shadow"))
  }

  test("two-stream matching is header-sensitive (reference test_data.py:37-41)") {
    import spark.implicits._
    def rr(headers: Map[String, String], ts: Long) = RequestResponse(
      ParsedRequest(None, "GET", "/h", headers, ""),
      ParsedResponse(Some(ts), Some(200), Some(1L), Map.empty, "{}"))
    // same method/uri/body; headers differ only in content-type → NOT
    // equivalent (data.py:85-87 includes headers in equivalent_to)
    val primary = Seq(rr(Map("Auth" -> "a", "content-type" -> "application/json"), 10)).toDS()
    val shadow = Seq(rr(Map("Auth" -> "a", "content-type" -> "text/html"), 11)).toDS()
    assert(Triples.matchStreams(spark, primary, shadow).count() == 0)
    // identical headers (regardless of map construction order) DO match
    val shadow2 = Seq(rr(Map("content-type" -> "application/json", "Auth" -> "a"), 12)).toDS()
    assert(Triples.matchStreams(spark, primary, shadow2).count() == 1)
  }

  test("response_time_ms: integer-shaped string parses; other shapes skip the line") {
    // string "456" parses like the Status-Code logic does
    val ok = Triples.parseLine(line().replace(""""response_time_ms":14""",
      """"response_time_ms":"456"""")).get
    assert(ok.primary.latencyMs.contains(456L))
    // a non-integer shape is a skip-and-log drop, not a silent None
    assert(Triples.parseLine(line().replace(""""response_time_ms":14""",
      """"response_time_ms":"fast"""")).isEmpty)
    assert(Triples.parseLine(line().replace(""""response_time_ms":14""",
      """"response_time_ms":14.5""")).isEmpty)
  }
}
