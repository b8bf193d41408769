package graft

import graft.operators.UrlOps

/** URL curation invariants at sf0.001 (500^W 50 docs — planted-generator
  * truths are checkable in closed form against doc_id arithmetic).
  */
class UrlOpsSpec extends SparkSpecBase {

  private def q(name: String) = UrlOps.queries(name)(spark, sfDir)

  test("url_parse: components reassemble to the url; planted truths hold") {
    val rows = q("url_parse").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (url, scheme, host) = (r.getString(1), r.getString(2), r.getString(3))
      val port = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val (path, query, frag) = (r.getString(5), r.getString(6), r.getString(7))
      val (reg, tld) = (r.getString(8), r.getString(9))
      if (id % 19 == 0) {
        // malformed (relative) slice: every extractor degrades cleanly
        assert(url.startsWith("/relative/doc"))
        assert(scheme == "" && host == "" && port.isEmpty && path == "" &&
          query == "" && frag == "" && reg == "" && tld == "")
      } else {
        // planted-generator truths
        assert(scheme == (if (id % 11 == 0) "http" else "https"))
        assert(port == (if (id % 7 == 0) Some(8080) else None))
        assert((frag == "sec2") == (id % 6 == 0))
        assert((query == "") == (id % 3 == 0))
        // registrable domain: 2-level suffix keeps three labels
        if (host.endsWith(".co.uk") || host.endsWith(".ac.uk"))
          assert(reg.count(_ == '.') == 2, s"$host -> $reg")
        else {
          assert(reg.count(_ == '.') == 1)
          assert(host.endsWith(reg), s"$host must end with $reg")
        }
        assert(host.endsWith("." + tld) || tld == "uk")
        // components reassemble to the original url
        val rebuilt = scheme + "://" + host + port.map(":" + _).getOrElse("") +
          path + (if (query.nonEmpty) "?" + query else "") +
          (if (frag.nonEmpty) "#" + frag else "")
        assert(rebuilt == url, s"$rebuilt != $url")
      }
    }
  }

  test("url_domain_caps: per-domain kept counts honor the cap; subset is deterministic") {
    val kept = q("url_domain_caps").collect().map(r => (r.getLong(0), r.getString(1)))
    val byDom = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom.values.forall(_ <= UrlOps.DomainCap))
    // stats view reconciles with the kept set exactly
    val stats = q("url_domain_cap_stats").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    stats.foreach { case (dom, (n, nKept, nDropped)) =>
      assert(nKept + nDropped == n)
      assert(byDom.getOrElse(dom, 0) == nKept, s"$dom kept mismatch")
    }
    // determinism: a second run keeps the identical subset
    val again = q("url_domain_caps").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.sameElements(again))
  }

  test("url_normalize_dedup: every canonical group collapses exactly its planted pair") {
    val groups = q("url_normalize_dedup").collect()
    assert(groups.nonEmpty)
    groups.foreach { r =>
      val (canon, n, a, b) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n == 2, s"planted pairs only: $canon had $n variants")
      assert(b == a + 1 && a % 2 == 0, "the pair is (2k, 2k+1)")
      // canonical form carries no tracking params, port, fragment or
      // trailing slash, and the host is lowercase
      assert(!canon.contains("utm_"), canon)
      assert(!canon.contains(":443"), canon)
      assert(!canon.contains("#"), canon)
      assert(canon == canon.toLowerCase, canon)
    }
    // every even doc with an odd twin in the fixture forms one group
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(groups.length == nDocs / 2)
  }

  test("url_domain_caps executes through the GroupTopK bounded-heap path") {
    val plan = q("url_domain_caps").queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"),
      "row_number<=cap over the domain partition must ride GroupTopK")
  }

  test("canonicalUrl: unparseable inputs canonicalize to themselves, never one shared key") {
    val s2 = spark
    import s2.implicits._
    val ins = Seq("/relative/doc19", "/relative/doc38", "not a url at all",
      "HTTP://Host.Example.com:443/a/?utm_x=1&id=2#frag")
    val out = ins.toDF("url")
      .select(graft.operators.UrlOps.canonicalUrl(org.apache.spark.sql.functions.col("url")))
      .collect().map(_.getString(0))
    assert(out(0) == ins(0) && out(1) == ins(1) && out(2) == ins(2),
      "malformed inputs must be identity-canonical (distinct keys)")
    // uppercase scheme is not recognized by the lowercase-scheme grammar
    // either -> identity; a parseable lowercase equivalent normalizes
    val norm = Seq("http://host.example.com:443/a/?utm_x=1&id=2#frag").toDF("url")
      .select(graft.operators.UrlOps.canonicalUrl(org.apache.spark.sql.functions.col("url")))
      .head().getString(0)
    assert(norm == "https://host.example.com/a?id=2", s"got $norm")
  }

  test("canonicalUrl is idempotent and leaves no tracking residue") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions.col
    // generated mix: well-formed with every feature combination + malformed
    val urls = (0 until 200).map { i =>
      if (i % 9 == 0) s"relative/or/garbage-$i"
      else {
        val scheme = Seq("http", "https", "ftp")(i % 3)
        val host = Seq("A.Example.COM", "www.data.org", "x.co.uk")(i % 3)
        val port = Seq("", ":443", ":8080")(i % 3)
        // includes multi-slash tails: "/p//" must canonicalize in ONE
        // pass (the "/+$" strip), or idempotence breaks
        val path = Seq("", "/p", "/p/q/", "/p//", "/p/q///")(i % 5)
        val q = Seq("", "?utm_a=1", "?utm_a=1&id=2&utm_b=3", s"?id=$i")(i % 4)
        val f = Seq("", "#top")(i % 2)
        s"$scheme://$host$port$path$q$f"
      }
    }
    val canon = urls.toDF("url")
      .select(graft.operators.UrlOps.canonicalUrl(col("url")).as("c"))
    val once = canon.collect().map(_.getString(0))
    val twice = canon.select(graft.operators.UrlOps.canonicalUrl(col("c")))
      .collect().map(_.getString(0))
    assert(once.sameElements(twice), "canonicalization must be idempotent")
    once.zip(urls).foreach { case (c, u) =>
      if (u.contains("://")) {
        assert(!c.contains("utm_"), s"$u -> $c keeps tracking params")
        assert(!c.contains("#"), s"$u -> $c keeps a fragment")
        assert(!c.contains(":443"), s"$u -> $c keeps the default port")
        val host = c.stripPrefix("https://").takeWhile(ch => ch != '/' && ch != '?')
        assert(host == host.toLowerCase, s"$u -> $c host not lowercased")
      } else assert(c == u, "malformed stays identity")
    }
  }
}
