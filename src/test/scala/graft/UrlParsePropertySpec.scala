package graft

import java.util.regex.Pattern

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.UrlOps

/** Property tests for the URL component regexes (no SparkSession — the
  * queries execute these exact pattern strings through `regexp_extract`,
  * whose semantics are java.util.regex `find` + group, "" on no match;
  * `ex` below reproduces that contract bit-for-bit).
  */
object UrlParsePropertySpec extends Properties("UrlParse") {

  /** Spark regexp_extract semantics: first match's group 1, "" on none. */
  private def ex(s: String, re: String): String = {
    val m = Pattern.compile(re).matcher(s)
    if (m.find()) Option(m.group(1)).getOrElse("") else ""
  }

  private val label: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.frequency(8 -> Gen.alphaLowerChar,
      2 -> Gen.numChar)).map(_.mkString)
  } yield s"$h$t"

  private case class Parts(scheme: String, host: String, port: Option[Int],
                           path: String, query: String, frag: String) {
    def url: String = scheme + "://" + host + port.map(":" + _).getOrElse("") +
      path + (if (query.nonEmpty) "?" + query else "") +
      (if (frag.nonEmpty) "#" + frag else "")
  }

  private val genParts: Gen[Parts] = for {
    scheme <- Gen.oneOf("http", "https", "ftp", "s3")
    sub <- Gen.oneOf("", "www.", "cdn.")
    dom <- label
    suffix <- Gen.oneOf("com", "org", "io", "co.uk", "ac.uk")
    port <- Gen.option(Gen.chooseNum(1, 65535))
    nPath <- Gen.chooseNum(0, 3)
    segs <- Gen.listOfN(nPath, label)
    query <- Gen.oneOf(Gen.const(""),
      label.map(k => s"$k=1"), label.map(k => s"utm_$k=x&$k=2"))
    frag <- Gen.oneOf(Gen.const(""), label)
  } yield Parts(scheme, s"$sub$dom.$suffix", port,
    segs.map("/" + _).mkString match { case "" => "/"; case p => p },
    query, frag)

  property("well-formed URLs round-trip through the component extractors") =
    forAll(genParts) { p =>
      val u = p.url
      val hp = ex(u, UrlOps.HostPortRe)
      val host = ex(hp, "^([^:]*)")
      val portS = ex(hp, ":([0-9]+)$")
      val rebuilt = ex(u, UrlOps.SchemeRe) + "://" + host +
        (if (portS.nonEmpty) ":" + portS else "") +
        ex(u, UrlOps.PathRe) +
        { val q = ex(u, UrlOps.QueryRe); if (q.nonEmpty) "?" + q else "" } +
        { val f = ex(u, UrlOps.FragRe); if (f.nonEmpty) "#" + f else "" }
      rebuilt == u &&
        ex(u, UrlOps.SchemeRe) == p.scheme &&
        host == p.host &&
        portS == p.port.map(_.toString).getOrElse("")
    }

  property("registrable domain is a host suffix; 2-level public suffixes keep 3 labels") =
    forAll(genParts) { p =>
      val host = ex(ex(p.url, UrlOps.HostPortRe), "^([^:]*)")
      val r3 = ex(host, UrlOps.Reg3Re)
      val reg = if (r3.nonEmpty) r3 else ex(host, UrlOps.Reg2Re)
      host.endsWith(reg) && {
        if (host.endsWith(".co.uk") || host.endsWith(".ac.uk"))
          reg.count(_ == '.') == 2
        else reg.count(_ == '.') == 1
      }
    }

  property("scheme-less garbage degrades: no scheme/host/path ever extracted") =
    forAll(Gen.listOf(Gen.frequency(8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('/', '.', '?', '#', '-'))).map(_.mkString)) { s0 =>
      val s = s0.replace("://", "")
      ex(s, UrlOps.SchemeRe) == "" && ex(s, UrlOps.HostPortRe) == "" &&
        ex(s, UrlOps.PathRe) == ""
    }

  property("extractors never throw on arbitrary printable input") =
    forAll(Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)) { s =>
      Seq(UrlOps.SchemeRe, UrlOps.HostPortRe, UrlOps.PathRe, UrlOps.QueryRe,
        UrlOps.FragRe, UrlOps.Reg3Re, UrlOps.Reg2Re, UrlOps.TldRe)
        .forall { re => ex(s, re); true }
    }
}
