package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlSpec extends AnyFunSuite with SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlQueries.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("canonicalization collapses case, default port, fragment, slash, param order") {
    val variants = Seq(
      "HTTPS://WWW.Host.Example.COM:443/a/b/?z=1&a=2#frag",
      "https://www.host.example.com/a/b?a=2&z=1",
      "https://www.host.example.com:443/a/b/#other",
      "https://WWW.HOST.example.com/a/b/?z=1&a=2")
    // variants 0, 1, 3 carry the same params in different order/case;
    // variant 2 has no query string and must NOT collapse with them
    val c = canon(variants(0), variants(1), variants(3))
    assert(canon(variants(2)).head !== c.head)
    assert(c.distinct.size === 1, c.mkString("\n"))
    assert(c.head === "https://www.host.example.com/a/b?a=2&z=1")
  }

  test("non-default ports, distinct hosts, and distinct params stay distinct") {
    val c = canon(
      "https://h.com:8443/x", "https://h.com/x",
      "http://h.com:80/x", "http://h.com:8080/x",
      "https://other.com/x", "https://h.com/x?a=1", "https://h.com/x?a=2")
    assert(c.distinct.size === c.size, c.mkString("\n"))
    assert(c(1) === "https://h.com/x")
    assert(c(2) === "http://h.com/x")
    assert(c(0) === "https://h.com:8443/x")
  }

  test("canonicalization is idempotent; empty path becomes root") {
    val once = canon(
      "HTTP://A.B:80/p/?b=2&a=1#f", "https://no.path.com", "https://q.com?x=1")
    val twice = canon(once: _*)
    assert(once === twice, s"$once vs $twice")
    assert(once(1) === "https://no.path.com/")
    assert(once(2) === "https://q.com/?x=1")
  }

  test("q_url_dedup collapses documents; q_domain_stats shares sum to 1") {
    val d = "/root/testdata/sf0.001"
    val nDocs = graft.ops.Tables.documents(spark, d).count()
    val dedup = graft.SparkEntry.queries("q_url_dedup")(spark, d).collect()
    assert(dedup.map(_.getLong(2)).sum === nDocs)
    assert(dedup.length < nDocs, "no URL duplicates collapsed")
    val stats = graft.SparkEntry.queries("q_domain_stats")(spark, d).collect()
    val shareSum = stats.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
  }
}
