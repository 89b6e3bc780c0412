package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Wave 68: typosquat detection, forecast backtest. */
class Wave68Spec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("typosquat: edit-1 shapes hit, edit-2 and equal-traffic don't") {
    import spark.implicits._
    // domains via pre-normalized rows: (doc_id, url_canon, host, domain)
    def rows(domain: String, n: Int) =
      (1 to n).map(i => (domain.hashCode.toLong * 1000 + i,
        s"https://$domain/p/$i", domain, domain))
    val df = (rows("example.com", 50) ++      // legit top domain
      rows("examp1e.com", 2) ++               // substitution
      rows("exampleе.com", 2) ++              // addition (cyrillic е!)
      rows("exmple.com", 2) ++                // deletion
      rows("totally-other.org", 40) ++        // unrelated
      rows("exannple.com", 2))                // distance 2 — must NOT hit
      .toDF("doc_id", "url_canon", "host", "domain")
    val out = UrlOps.typosquats(df, topK = 2).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(out == Set(
      ("examp1e.com", "example.com"),
      ("exampleе.com", "example.com"),
      ("exmple.com", "example.com")))
  }

  test("forecast eval: constant series has zero error for both, holt never NaNs") {
    val q = graft.SparkEntry.queries("events_forecast_eval")(spark, "/root/testdata/sf0.001")
    val rs = q.collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= 0 && r.getLong(3) >= 0)
      assert(r.getBoolean(4) == (r.getLong(2) < r.getLong(3)))
    }
  }
}
