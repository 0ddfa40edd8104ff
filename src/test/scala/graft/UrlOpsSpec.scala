package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class UrlOpsSpec extends AnyFunSuite {

  /** deterministic property sampling (no scalatestplus bridge offline) */
  def forAllSampled[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, Seed(42L)).foreach(f)

  // the reference's only real assertions, ported verbatim
  // (/root/reference/src/bin/traptest.rs:21-28)
  test("trap detection — traptest cases") {
    assert(UrlOps.looksLikeATrap(
      "https://give.stthomas.edu/about/gift-officers/about/impact/gratitude/about/impact/give/impact/morrison-family-college-of-health/index.html").contains(true))
    assert(UrlOps.looksLikeATrap(
      "https://www.nap.edu/topic/404/behavioral-and-social-sciences/human-systems-and-technology").contains(false))
    assert(UrlOps.looksLikeATrap(
      "https://give.stthomas.edu/about/gift-officers/about/about/morrison-family-college-of-health/index.html").contains(true))
  }

  // /root/reference/src/bin/domaintest.rs:7-11 (+ the <=2-label guard of
  // src/main.rs:208-214)
  test("domain_root — domaintest cases") {
    assert(UrlOps.domainRoot("columbia.edu") == "columbia.edu")
    assert(UrlOps.domainRoot("math.columbia.edu") == "columbia.edu")
    assert(UrlOps.domainRoot("src.math.columbia.edu") == "columbia.edu")
    assert(UrlOps.domainRoot("localhost") == "localhost")
  }

  test("clearly_not_html — suffix list + scheme (src/main.rs:112-145)") {
    assert(UrlOps.clearlyNotHtml("https://a.example/x.png"))
    assert(UrlOps.clearlyNotHtml("https://a.example/x.PNG"))
    assert(UrlOps.clearlyNotHtml("https://a.example/data.json"))
    assert(UrlOps.clearlyNotHtml("ftp://a.example/x.html"))
    assert(!UrlOps.clearlyNotHtml("https://a.example/x.html"))
    assert(!UrlOps.clearlyNotHtml("http://a.example/pngx"))
  }

  test("canonicalize strips query+fragment, lowercases, drops default port") {
    assert(UrlOps.canonicalize("https://A.Example:443/p?q=1#f").contains("https://a.example/p"))
    assert(UrlOps.canonicalize("http://a.example:8080/p?x").contains("http://a.example:8080/p"))
    assert(UrlOps.canonicalize("https://a.example").contains("https://a.example/"))
    assert(UrlOps.canonicalize("not a url").isEmpty)
  }

  test("canonicalize is idempotent (property)") {
    val gen = for {
      h <- Gen.oneOf("a.example", "B.Example", "sub.h1.example")
      p <- Gen.oneOf("", "/", "/x", "/x/y", "/x%20y")
      q <- Gen.oneOf("", "?q=1", "#f", "?q=1#f")
      s <- Gen.oneOf("http", "https")
    } yield s"$s://$h$p$q"
    forAllSampled(gen) { url =>
      val c1 = UrlOps.canonicalize(url)
      assert(c1.isDefined)
      assert(UrlOps.canonicalize(c1.get) == c1)
    }
  }

  test("resolve — RFC 3986 relative resolution") {
    assert(UrlOps.resolve("https://a.example/x/y", "/z").contains("https://a.example/z"))
    assert(UrlOps.resolve("https://a.example/x/y", "z").contains("https://a.example/x/z"))
    assert(UrlOps.resolve("https://a.example/x/", "https://b.example/q").contains("https://b.example/q"))
  }

  test("robots.txt parsing (src/robots.rs:59-84)") {
    val body =
      """User-agent: Googlebot
        |Disallow: /google-only
        |User-agent: *
        |Disallow: /private
        |Disallow: /tmp
        |User-agent: Rustbot
        |Disallow: /rust
        |""".stripMargin
    assert(Robots.parseRobotsTxt(body).contains(Seq("/private", "/tmp", "/rust")))
    assert(Robots.parseRobotsTxt("User-agent: *\nAllow: /\n").isEmpty)
  }

  test("robots prefix matching (src/robots.rs:45-57)") {
    val rules = Map("a.example" -> Seq("/private", "/tmp"))
    assert(Robots.allowed("https://a.example/public", rules))
    assert(!Robots.allowed("https://a.example/private/x", rules))
    assert(Robots.allowed("https://other.example/private", rules))
  }

  test("quantization math (src/main.rs:273-276)") {
    assert(Indexer.quantize(1, 255) == 10)
    assert(Indexer.quantize(100, 200) == 255) // clamped
    assert(Indexer.quantize(1, 2550) == 1)
    assert(Indexer.logTermCount(256) == 8)
    assert(Indexer.logTermCount(255) == 7)
  }

  test("parser — link extraction pipeline order (trap drops whole page)") {
    val base = "https://a.example/p"
    val html = "<a href='https://b.example/x'>x</a><a href='/loop/loop/loop/y'>y</a>"
    // the relative trap link resolves under a.example → page dropped entirely
    assert(Parser.extractLinks(base, html, 250, 2) == Seq.empty)
    val ok = "<a href='https://b.example/x'>x</a><a href='/local'>y</a><a href='https://sub.a.example/z?q=1#f'>z</a>"
    val links = Parser.extractLinks(base, ok, 250, 2)
    assert(links == Seq(
      ("https://b.example/x", 2L), // cross-domain bonus
      ("https://a.example/local", 1L),
      ("https://sub.a.example/z", 1L))) // same domain_root; query+frag stripped
  }

  test("parser — term extraction (body sections → tag text → terms)") {
    val html = "<head><title>Skip me</title></head>" +
      "<body class='c'><p>Hello World</p><div>nested Text2</div></body>"
    assert(Parser.extractTerms(html) == Seq("hello", "world", "nested", "text"))
  }

  test("score math — fold semantics (src/bin/query.rs:75-104)") {
    import Search.ScoreMath._
    // single term: just the shifted base
    assert(fold(Seq(100), Seq(1)) == 50)
    // missing earlier term zeroes the doc
    assert(fold(Seq(0, 100), Seq(0, 1)) == 0)
    // base shifted to zero never accumulates
    assert(fold(Seq(100, 1), Seq(0, 3)) == 0)
    // normal accumulation
    assert(fold(Seq(64, 100), Seq(2, 1)) == 66)
    // u8 wrap
    assert(fold(Seq(255, 255), Seq(0, 0)) == ((255 + 255) & 0xff))
    assert(idf(0, 100000) == 1L)
    assert(shiftOf(1) == 0)
    assert(shiftOf(5) == 3)
    assert(shiftOf(8) == 3)
  }

  test("F11 academic gate — reference ACADEMIC_RE semantics (src/main-old.rs:65,180)") {
    assert(UrlOps.isAcademic("cs.stanford.edu"))
    assert(UrlOps.isAcademic("u.ac"))
    assert(UrlOps.isAcademic("weird.ac."))
    assert(!UrlOps.isAcademic("ox.ac.uk")) // the reference regex does NOT match ccTLD .ac.uk
    assert(!UrlOps.isAcademic("site0.example.com"))
    assert(!UrlOps.isAcademic("edu"))
    // config-off default keeps everything; on -> only academic hosts survive
    val html = "<a href='https://cs.mit.edu/a'>x</a><a href='https://h1.example/b'>y</a>"
    val base = "https://src.example/p"
    val all = Parser.extractLinks(base, html, 250, 2L)
    assert(all.map(_._1).toSet ==
      Set("https://cs.mit.edu/a", "https://h1.example/b"))
    val acad = Parser.extractLinks(base, html, 250, 2L, academicOnly = true)
    assert(acad.map(_._1) == Seq("https://cs.mit.edu/a"))
  }
}
