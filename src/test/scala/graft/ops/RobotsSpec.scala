package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** RFC 9309 robots.txt semantics: group selection, wildcard/anchor
  * matching, longest-match precedence, and the broadcast evaluation op. */
class RobotsSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  val txt =
    """# comment
      |User-agent: googlebot-images
      |Disallow: /img/
      |
      |User-agent: googlebot
      |User-agent: bingbot
      |Disallow: /shared/
      |
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Crawl-delay: 10
      |""".stripMargin

  test("group selection: longest matching agent token, * fallback, shared groups") {
    assert(Robots.rulesFor(txt, "GoogleBot-Images/1.0").map(_.path) == Vector("/img/"))
    assert(Robots.rulesFor(txt, "googlebot/2.1").map(_.path) == Vector("/shared/"))
    assert(Robots.rulesFor(txt, "bingbot").map(_.path) == Vector("/shared/")) // consecutive UA lines share rules
    assert(Robots.rulesFor(txt, "graftbot").map(_.path) == Vector("/private", "/private/ok"))
    assert(Robots.rulesFor("User-agent: x\nDisallow: /", "graftbot").isEmpty) // no * group
    assert(Robots.rulesFor("", "graftbot").isEmpty)
  }

  test("path matching: prefix, * wildcard, $ anchor") {
    assert(Robots.pathMatches("/a/b", "/a/b/c"))
    assert(!Robots.pathMatches("/a/b", "/a/x"))
    assert(Robots.pathMatches("/*.pdf", "/docs/file.pdf")) // wildcard run
    assert(Robots.pathMatches("/*.pdf", "/docs/file.pdfx")) // unanchored: prefix semantics
    assert(Robots.pathMatches("/*.pdf$", "/docs/file.pdf"))
    assert(!Robots.pathMatches("/*.pdf$", "/docs/file.pdfx"))
    assert(Robots.pathMatches("/a*c*e", "/abcde"))
    assert(!Robots.pathMatches("/a*c*e$", "/abcdef"))
  }

  test("verdict: longest rule wins, Allow beats Disallow on ties, no match allows") {
    val rules = Vector(
      Robots.Rule(allow = false, "/private"),
      Robots.Rule(allow = true, "/private/ok"))
    assert(Robots.verdict(rules, "/private/x") == (false, "Disallow:/private"))
    assert(Robots.verdict(rules, "/private/ok/y") == (true, "Allow:/private/ok"))
    assert(Robots.verdict(rules, "/public") == (true, ""))
    // equal length: allow wins
    val tied = Vector(Robots.Rule(allow = false, "/p"), Robots.Rule(allow = true, "/p"))
    assert(Robots.verdict(tied, "/p/x")._1)
  }

  test("evaluate: synth corpus — each domain blocks page d, 9d+8 re-allowed on conflict") {
    import spark.implicits._
    val urls = LinkGraph.synthCorpus(spark, 40).toDF().select("url")
    val out = Robots.evaluate(Robots.synthRobots(spark), urls, "graftbot")
      .orderBy("url").as[(String, Boolean, String)].collect()
    assert(out.length == 40)
    val blocked = out.filter(!_._2).map(_._1).toVector
    assert(blocked == (0 until 8).map(d => s"https://site$d.example/a/p$d").sorted.toVector)
    // p=17 on site1 matched Disallow:/a/p1 but the longer Allow:/a/p17 won
    val p17 = out.find(_._1 == "https://site1.example/a/p17").get
    assert(p17._2 && p17._3 == "Allow:/a/p17")
    // unmatched url: allowed with empty rule
    val p9 = out.find(_._1 == "https://site1.example/a/p9").get
    assert(p9._2 && p9._3 == "")
  }

  test("plan: rules broadcast; the only Exchange is the per-url argmax") {
    val urls = LinkGraph.synthCorpus(spark, 40).toDF().select("url")
    val plan = Robots.evaluate(Robots.synthRobots(spark), urls, "graftbot")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan.take(900))
  }
}
