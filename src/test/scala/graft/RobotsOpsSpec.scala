package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RobotsMatchKernel
import graft.operators.{RobotsOps, WebOps}

/** robots.txt compliance (RFC 9309): the parse grammar's decisions,
  * the glob kernel against an independent regex formulation of the
  * LIKE translation the oracle uses, the longest-match / allow-tie
  * decision semantics, and the plan shape (no corpus-side windows).
  */
class RobotsOpsSpec extends SparkSpec {
  import spark.implicits._

  private val bodies = Seq(
    "a.com" -> ("# c\r\nUser-Agent: *\r\nDisallow: /all/\r\n\r\n" +
      "User-agent: GraftBot\r\nUser-agent: otherbot\r\n" +
      "Disallow: /g/*/x$\r\nAllow: /g/\r\nCrawl-delay: 9\r\n" +
      "nonsense\r\nDisallow:\r\n"),
    "b.com" -> "User-agent: MegaBot\nDisallow: /\n",
    "c.com" -> ("Disallow: /orphan\nUser-agent: GRAFTBOT\n" +
      "Disallow: /t_a/\nAllow: /t_a/ok$ # tail\n"),
    "d.com" -> ("User-agent: *\nDisallow: /x/\n\n" +
      "User-agent: *\nDisallow: /y/\nAllow: /y/\n"))

  private def rules(agent: String = "graftbot") =
    RobotsOps.parseRobots(bodies.toDF("host", "body"), agent)

  test("parseRobots: group selection, casing, grammar edges") {
    val r = rules("GrAfTbOt").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSet
    assert(r === Set(
      // a.com: GraftBot's group beats '*' — /all/ EXCLUDED; unknown
      // keys / noise / empty Disallow dropped
      ("a.com", "disallow", "/g/*/x$"),
      ("a.com", "allow", "/g/"),
      // b.com: no matching group at all -> no rows
      // c.com: orphan rule (before any group) dropped; inline
      // comment stripped from the allow value
      ("c.com", "disallow", "/t_a/"),
      ("c.com", "allow", "/t_a/ok$"),
      // d.com: two '*' groups union
      ("d.com", "disallow", "/x/"),
      ("d.com", "disallow", "/y/"),
      ("d.com", "allow", "/y/")))
  }

  test("parseRobots: star groups apply only when no exact group") {
    val star = rules("unknownbot").collect()
      .map(x => (x.getString(0), x.getString(2))).toSet
    assert(star === Set(("a.com", "/all/"), ("d.com", "/x/"),
      ("d.com", "/y/")))
  }

  // ---- kernel ≡ LIKE-translation (the oracle's formulation),
  // property-pinned so the two can never drift ----

  private def likeRegex(pat: String): String = {
    val anchored = pat.nonEmpty && pat.last == '$'
    val body = if (anchored) pat.dropRight(1) else pat
    val rx = body.split("\\*", -1).map(java.util.regex.Pattern.quote)
      .mkString(".*")
    // (?s): LIKE's '%' and the kernel's '*' both cross newlines —
    // without DOTALL this pin would disagree with a CORRECT kernel
    // on the control-char class the pathQueryOf fix is about
    "(?s)^" + rx + (if (anchored) "$" else ".*")
  }

  private def kmatch(path: String, pat: String): Boolean =
    RobotsMatchKernel.matches(UTF8String.fromString(path),
      UTF8String.fromString(pat))

  test("robots_match: glob kernel ≡ translated-pattern semantics") {
    // directed edges first: anchors, star runs, literal specials
    val cases = Seq(
      ("/a/b", "/a/", true), ("/a/b", "/a/b$", true),
      ("/a/bc", "/a/b$", false), ("/a/x/y/z", "/a/*/z$", true),
      ("/a/z", "/a/*/z$", false), ("/t_a/f", "/t_a/", true),
      ("/tXa/f", "/t_a/", false), // '_' is literal, never a wildcard
      ("/p%7E", "/p%7E", true), ("/pX7E", "/p%7E", false), // '%' too
      ("/a*b", "/a*b", true), // literal '*' in the PATH
      ("/a$b", "/a$b$", true), // '$' mid-pattern is literal
      ("/", "/", true), ("/x", "", true), // empty pattern: prefix of all
      ("/ab", "/a**b$", true), ("/a/b/c", "***", true))
    for ((path, pat, want) <- cases) {
      assert(kmatch(path, pat) === want, s"'$pat' vs '$path'")
      assert(path.matches(likeRegex(pat)) === want,
        s"translation diverges on '$pat' vs '$path'")
    }
    // property: random paths/patterns over an alphabet dense in
    // specials AND multi-byte UTF-8 (2-, 3-, 4-byte sequences) — the
    // kernel matches BYTES, so this also empirically pins the
    // byte-glob ≡ char-glob argument on its scaladoc: a '*' can
    // never "half-swallow" a multi-byte char into a false positive
    val rnd = new Random(13)
    val alpha: IndexedSeq[String] =
      "ab/*$%_!.\n".map(_.toString) ++
        Seq("é", "ü", "日", "本", new String(Character.toChars(0x10348)))
    def randStr(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 4000) {
      val path = "/" + randStr(rnd.nextInt(8))
      val pat = randStr(rnd.nextInt(6))
      assert(kmatch(path, pat) === path.matches(likeRegex(pat)),
        s"property: '$pat' vs '$path'")
    }
  }

  // ---- decision semantics ----

  private def decide(urls: Seq[(Long, String)]) = {
    val docs = urls.toDF("doc_id", "url")
    RobotsOps.decisionBy(WebOps.urlParts(docs), rules())
      .select("doc_id", "allowed", "win_kind", "win_len")
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getInt(3).asInstanceOf[Any])))
      .toMap
  }

  test("decisionBy: longest match, allow ties, defaults") {
    val d = decide(Seq(
      1L -> "https://a.com/all/x", // GraftBot group has no /all rule
      2L -> "https://a.com/g/q/x", // disallow /g/*/x$ (7) > allow (3)
      3L -> "https://a.com/g/q/x2", // anchor misses -> allow /g/
      4L -> "https://b.com/anything", // no applicable group
      5L -> "https://nothing.example/x", // host without robots row
      6L -> "https://d.com/y/z", // equal-length tie -> allow
      7L -> "https://c.com/t_a/ok", // allow /t_a/ok$ (8) > disallow (5)
      8L -> "https://c.com/t_a/ok?x=1")) // query breaks the $ anchor
    assert(d(1L) === ((true, null, null)))
    assert(d(2L) === ((false, "disallow", 7)))
    assert(d(3L) === ((true, "allow", 3)))
    assert(d(4L) === ((true, null, null)))
    assert(d(5L) === ((true, null, null)))
    assert(d(6L) === ((true, "allow", 3)))
    assert(d(7L) === ((true, "allow", 8)))
    // query is part of the match target: '/t_a/ok?x=1' misses the
    // anchored allow but still hits the shorter disallow prefix
    assert(d(8L) === ((false, "disallow", 5)))
  }

  test("decisionBy: a control char in the path cannot bypass rules") {
    // the canonicalizer preserves raw bytes it has no rule for; the
    // path extract must still produce the match target (a non-DOTALL
    // regex returned '' here, and the crafted URL sailed past every
    // disallow — review finding)
    val d = decide(Seq(9L -> "https://c.com/t_a/\nsecret"))
    assert(d(9L) === ((false, "disallow", 5)))
  }

  test("decisionBy rejects a frame already carrying a verdict") {
    val docs = Seq((1L, "https://a.com/g/ok")).toDF("doc_id", "url")
    intercept[IllegalArgumentException] {
      RobotsOps.decisionBy(
        WebOps.urlParts(docs).withColumn("allowed", lit(true)), rules())
    }
  }

  test("robotsFilter end-to-end keeps original columns only") {
    val docs = Seq(
      (1L, "https://a.com/g/q/x", "keep?"),
      (2L, "https://a.com/g/ok", "kept"))
      .toDF("doc_id", "url", "payload")
    val out = RobotsOps.robotsFilter(docs, bodies.toDF("host", "body"),
      "graftbot")
    assert(out.columns.toSet ===
      Set("doc_id", "url", "payload", "canon_url", "host", "domain"))
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("decision plan: hash aggregate, no corpus-side window") {
    val docs = Seq((1L, "https://a.com/g/ok")).toDF("doc_id", "url")
    val plan = RobotsOps.decisionBy(WebOps.urlParts(docs), rules())
      .queryExecution.optimizedPlan.toString
    // the per-URL winner is a max(struct) hash aggregate — a Window
    // over a mega-host's stratum would be the non-scalable shape.
    // parseRobots DOES window, but only over the dimension-sized
    // rule side, whose plan is materialized before this check
    val corpusSide = plan.split("Join").head
    assert(!corpusSide.contains("Window"),
      s"corpus side of the decision plan grew a Window:\n$plan")
  }

  test("robots_match is SQL-registered") {
    assert(spark.sql("SELECT robots_match('/a/b', '/a/')").head
      .getBoolean(0))
  }

  test("parseRobots rejects a non-token agent") {
    intercept[IllegalArgumentException] {
      RobotsOps.parseRobots(bodies.toDF("host", "body"), "bad\nbot")
    }
  }

  test("parseSitemaps: host-scoped, group-independent") {
    val b = Seq(
      // before any group AND inside a group that does NOT bind the
      // agent — sitemaps are host metadata, both must surface
      "s.com" -> ("Sitemap: https://s.com/a.xml\n" +
        "User-agent: MegaBot\nDisallow: /\n" +
        "Sitemap: https://s.com/b.xml\nSitemap:\n")).toDF("host", "body")
    val sm = RobotsOps.parseSitemaps(b).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sm === Set(("s.com", "https://s.com/a.xml"),
      ("s.com", "https://s.com/b.xml")))
  }

  test("parseCrawlDelay: group-scoped, min across groups, " +
    "non-numeric and orphan delays drop") {
    val b = Seq(
      "m.com" -> ("Crawl-delay: 1\n" + // before any group: dropped
        "User-agent: MegaBot\nCrawl-delay: 99\nDisallow: /\n" + // not ours
        "User-agent: graftbot\nDisallow: /a\nCrawl-delay: 7\n" +
        "User-agent: graftbot\nCrawl-delay: 3.5\n" + // second group: min
        // hostile spellings: each must drop, never win the min or
        // poison the offsets (negative would INVERT the schedule;
        // 'inf' is where Spark try_cast and DuckDB TRY_CAST part)
        "User-agent: graftbot\nCrawl-delay: soon\n" +
        "User-agent: graftbot\nCrawl-delay: -10\n" +
        "User-agent: graftbot\nCrawl-delay: inf\n" +
        "User-agent: graftbot\nCrawl-delay: 1e2\n"))
      .toDF("host", "body")
    val d = RobotsOps.parseCrawlDelay(b, "GraftBot").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(d.toSeq === Seq(("m.com", 3.5)))
    // a host with no applicable numeric delay emits NO row
    val none = RobotsOps.parseCrawlDelay(
      Seq("n.com" -> "User-agent: other\nCrawl-delay: 4\n")
        .toDF("host", "body"), "graftbot")
    assert(none.count() === 0)
  }

  test("crawlSchedule: ranks by md5 priority, offsets by delay, " +
    "default for unpublished hosts") {
    val docs = Seq(
      (1L, "slow.com"), (2L, "slow.com"), (3L, "slow.com"),
      (4L, "fast.com"), (5L, "fast.com")).toDF("doc_id", "host")
    val delays = Seq(("slow.com", 10.0)).toDF("host", "crawl_delay")
    val out = RobotsOps.crawlSchedule(docs, delays, seed = "s")
      .select("doc_id", "host", "crawl_delay", "rn", "offset_s")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getInt(3), r.getDouble(4))))
      .toMap
    // ranks are the md5 order, portable and replayable
    def pri(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"s:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val slowOrder = Seq(1L, 2L, 3L).sortBy(id => (pri(id), id.toString))
    slowOrder.zipWithIndex.foreach { case (id, k) =>
      assert(out(id) === (("slow.com", 10.0, k + 1, k * 10.0)), s"id $id")
    }
    val fastOrder = Seq(4L, 5L).sortBy(id => (pri(id), id.toString))
    fastOrder.zipWithIndex.foreach { case (id, k) =>
      assert(out(id) === (("fast.com", 1.0, k + 1, k * 1.0)), s"id $id")
    }
    // a frame already scheduled rejects loudly
    intercept[IllegalArgumentException] {
      RobotsOps.crawlSchedule(
        docs.withColumn("rn", lit(1)), delays, seed = "s")
    }
  }

  test("parseSitemapXml: kinds, trim, entity decode, hostile input") {
    val b = Seq(
      ("i.com", "<sitemapindex><sitemap><loc> https://i.com/a.xml " +
        "</loc></sitemap></sitemapindex>"),
      ("u.com", "<urlset><url><loc>https://u.com/p?a=1&amp;b=2</loc>" +
        "</url><url><loc>\n https://u.com/q \n</loc></url>" +
        "<url><loc></loc></url></urlset>"),
      // &amp;lt; decodes to the LITERAL &lt; — the &-last order
      ("e.com", "<urlset><url><loc>https://e.com/&amp;lt;x</loc>" +
        "</url></urlset>"),
      // hostile: no XML at all — total, zero rows
      ("h.com", "not xml <loc"),
      // a urlset MENTIONING '<sitemapindex' in a comment keeps its
      // urlset kind (the decision is by whichever root tag OPENS)
      ("m.com", "<!-- was a <sitemapindex> --><urlset><url><loc>" +
        "https://m.com/p</loc></url></urlset>"),
      // many unclosed openers: the split formulation stays linear
      // and binds the one real loc to its nearest opener
      ("q.com", "<urlset>" + ("<loc>" * 2000) +
        "https://q.com/deep</loc></urlset>"),
      // a commented-out loc is NOT a URL (comment strip runs first)
      ("c2.com", "<urlset><!-- <url><loc>https://c2.com/ghost" +
        "</loc></url> --><url><loc>https://c2.com/real</loc></url>" +
        "</urlset>")).toDF("host", "body")
    val out = RobotsOps.parseSitemapXml(b).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out === Set(
      ("i.com", "index", "https://i.com/a.xml"),
      ("u.com", "urlset", "https://u.com/p?a=1&b=2"),
      ("u.com", "urlset", "https://u.com/q"),
      ("e.com", "urlset", "https://e.com/&lt;x"),
      ("m.com", "urlset", "https://m.com/p"),
      ("q.com", "urlset", "https://q.com/deep"),
      ("c2.com", "urlset", "https://c2.com/real")))
  }

  test("frontierFromSitemaps: the composed discovery path") {
    val sm = Seq(("a.com", "<urlset>" +
      "<url><loc>https://a.com/g/q/x</loc></url>" + // anchored disallow
      "<url><loc>https://a.com/g/ok</loc></url>" +
      "<url><loc>ftp://a.com/skip</loc></url>" +
      "<url><loc>https://quiet.example/p</loc></url>" + // no robots
      "</urlset>")).toDF("host", "body")
    val out = RobotsOps.frontierFromSitemaps(sm,
      bodies.toDF("host", "body"), "graftbot", seed = "fs")
      .select("url", "host", "rn", "offset_s").collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getDouble(3)))).toMap
    // blocked and non-http locs never reach the schedule
    assert(out.keySet === Set("https://a.com/g/ok",
      "https://quiet.example/p"))
    assert(out("https://a.com/g/ok") === (("a.com", 1, 0.0)))
    assert(out("https://quiet.example/p") ===
      (("quiet.example", 1, 0.0)))
  }

  test("robotsStream end-to-end: per-trigger compliant landing") {
    val d = (0 until 40).map(i => (i.toLong,
      if (i % 2 == 0) s"https://a.com/g/q$i/x" // anchored disallow
      else s"https://a.com/g/ok$i")).toDF("doc_id", "url")
      .localCheckpoint()
    val src = tmpDir("rbs-src")
    Seq(d.filter(col("doc_id") < 20), d.filter(col("doc_id") >= 20))
      .foreach(_.coalesce(1).write.mode("append").parquet(src))
    val out = tmpDir("rbs-out")
    graft.streaming.StreamingPipeline.robotsStream(
      spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      rules(), out, tmpDir("rbs-ckpt"))
      .awaitTermination()
    val landed = spark.read.parquet(s"$out/b_*")
    assert(landed.count() === 20) // the /g/q*/x$ half is disallowed
    assert(landed.filter(col("url").contains("/x")).count() === 0)
  }
}
