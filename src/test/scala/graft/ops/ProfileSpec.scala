package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture

/** Exact-decile semantics vs a brute-force sorted reference. */
class ProfileSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark

  test("deciles match the brute-force sorted definition, incl. duplicates and tiny strata") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val src = s"s${i % 3}"
      val v = src match {
        case "s0" => rng.nextInt(20).toLong        // heavy duplicates
        case "s1" => (i / 3).toLong                // near-unique
        case _    => 5L                            // constant stratum
      }
      (i.toLong, src, v)
    }
    val df = rows.toDF("doc_id", "source", "n_chars")
    val got = Profile.deciles(df).orderBy("source", "decile")
      .as[(String, Long, Long)].collect().toSeq
    // reference: sort each stratum, decile k = value at rank ceil(k*n/10)
    val ref = rows.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (src, rs) =>
      val sorted = rs.map(_._3).sorted
      (1 to 9).map { k =>
        val rank = (k * sorted.length + 9) / 10 // ceil
        (src, k.toLong, sorted(rank - 1))
      }
    }
    assert(got == ref)
  }

  test("single-row stratum: every decile is that value") {
    import spark.implicits._
    val df = Seq((1L, "only", 42L)).toDF("doc_id", "source", "n_chars")
    val got = Profile.deciles(df).orderBy("decile")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == (1L to 9L).map(k => ("only", k, 42L)))
  }

  test("plan: histogram agg is the only corpus-sized shuffle") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"s${i % 4}", i % 100)).toDF("doc_id", "source", "n_chars")
    val plan = Profile.deciles(df).queryExecution.executedPlan.toString
    // two hash exchanges total: the (stratum, v) histogram agg and the
    // stratum re-key for the windows — the latter moves histogram rows only
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, plan.take(800))
  }
}
