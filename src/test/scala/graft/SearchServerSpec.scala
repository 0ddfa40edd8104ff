package graft

import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** S9: the search HTTP endpoint serves the library's own top-k
  * (reference: `GET /search?query=...`, src/bin/query.rs:301-321). */
class SearchServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tables() = {
    // two docs matching both terms (doc 2 scores higher), one doc matching
    // only one term (conjunctive AND must drop it), plus a noise term
    val postings = Seq(
      (0, "spark", 1L, 5), (0, "frontier", 1L, 3),
      (0, "spark", 2L, 9), (0, "frontier", 2L, 8),
      (0, "spark", 3L, 7),
      (0, "noise", 1L, 2)
    ).toDF("epoch", "term", "doc_id", "score")
    val docmeta = Seq(
      (0, 1L, "https://a.example/1", 8),
      (0, 2L, "https://b.example/\"2\"", 9), // quote exercises JSON escape
      (0, 3L, "https://c.example/3", 7)
    ).toDF("epoch", "doc_id", "url", "term_count")
    (postings, docmeta)
  }

  private def get(url: String): (Int, String) = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("GET /search returns the library's top-k as JSON, in rank order") {
    val (postings, docmeta) = tables()
    val server = SearchServer.start(spark, postings, docmeta, port = 0,
      topK = 20, termCountGate = 0)
    try {
      val port = server.getAddress.getPort
      val (code, body) =
        get(s"http://localhost:$port/search?query=spark%20Frontier")
      assert(code == 200)
      // the endpoint must agree with the library call it fronts
      val expect = Search.search(spark, postings, docmeta,
        "spark frontier", topK = 20, termCountGate = 0).collect()
      assert(expect.length == 2) // doc 3 lacks 'frontier' (AND semantics)
      // count = docs SCANNED: shard size × shards holding every query term
      // (reference: count += SHARD_SIZE * shards_scored,
      // src/bin/query.rs:260-263) — epoch 0 has 3 docs and both terms
      assert(body.contains(""""count":3"""))
      val urlsInOrder =
        """"url":"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(body).map(_.group(1)).toSeq
      assert(urlsInOrder ==
        expect.map(_.getString(0)).toSeq.map(_.replace("\"", "\\\"")))
      expect.foreach { r =>
        assert(body.contains(s""""score":${r.get(1)},"term_count":${r.get(2)}"""))
      }
      assert(body.contains("\"search_time_ms\":"))

      // no-hit and empty queries answer cleanly instead of erroring
      val (c2, b2) = get(s"http://localhost:$port/search?query=absent%20term")
      assert(c2 == 200 && b2.contains("\"count\":0"))
      val (c3, b3) = get(s"http://localhost:$port/search?query=")
      assert(c3 == 200 && b3.contains("\"count\":0"))

      // a malformed percent-escape must never drop the connection without
      // a response: the JDK server 400s URIs its own parser rejects, and
      // anything that reaches the handler decodes INSIDE the try so the
      // 500 error body comes back instead of an exception escaping
      // handle(). Raw socket: HttpClient would refuse to build these URIs.
      val (c4, _) = rawGet(port, "/search?query=%zz")
      assert(c4 == 400 || c4 == 500)
      val (c5, _) = rawGet(port, "/search?query=100%")
      assert(c5 == 400 || c5 == 500)
    } finally server.stop(0)
  }

  /** Send a request line verbatim (invalid escapes included) and read the
    * status code — empty body reads are fine, the status is the contract. */
  private def rawGet(port: Int, pathQuery: String): (Int, String) = {
    val s = new java.net.Socket("localhost", port)
    try {
      s.setSoTimeout(10000)
      val out = s.getOutputStream
      out.write(
        s"GET $pathQuery HTTP/1.1\r\nHost: localhost\r\nConnection: close\r\n\r\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.flush()
      val all = new String(s.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(all.startsWith("HTTP/1.1 "), s"no status line in: $all")
      val code = all.split(" ", 3)(1).toInt
      (code, all.split("\r\n\r\n", 2).lift(1).getOrElse(""))
    } finally s.close()
  }

  test("format=html renders the reference's results page") {
    val (postings, docmeta) = tables()
    val server = SearchServer.start(spark, postings, docmeta, port = 0,
      topK = 20, termCountGate = 0)
    try {
      val port = server.getAddress.getPort
      val (code, body) =
        get(s"http://localhost:$port/search?query=spark%20frontier&format=html")
      assert(code == 200)
      // the reference template's structure (templates/search.html.tera):
      // form, scanned-count line, one anchor per result with (score, tc)
      assert(body.contains("<form") && body.contains("name=\"query\""))
      assert(body.contains("Scanned through 3 pages in"))
      val expect = Search.search(spark, postings, docmeta,
        "spark frontier", topK = 20, termCountGate = 0).collect()
      expect.foreach { r =>
        val u = r.getString(0).replace("\"", "&quot;") // html-escaped
        assert(body.contains(s"""<a href="$u">$u</a> (${r.get(1)}, ${r.get(2)})"""))
      }
      // anchors appear in rank order
      val anchors = """<a href="([^"]*)"""".r.findAllMatchIn(body).map(_.group(1)).toSeq
      assert(anchors == expect.map(_.getString(0).replace("\"", "&quot;")).toSeq)
    } finally server.stop(0)
  }

  test("count exceeds topK when more docs were scanned than returned") {
    val (postings, docmeta) = tables()
    // topK = 1 truncates the result list; the reference's count still
    // reports every scanned doc (3 in the participating shard)
    val server = SearchServer.start(spark, postings, docmeta, port = 0,
      topK = 1, termCountGate = 0)
    try {
      val port = server.getAddress.getPort
      val (code, body) =
        get(s"http://localhost:$port/search?query=spark%20frontier")
      assert(code == 200)
      assert("""\"url\":""".r.findAllIn(body).size == 1) // truncated to topK
      assert(body.contains(""""count":3""")) // 3 > topK = 1
    } finally server.stop(0)
  }
}
