package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSessionFixture

/** KMV distinct sketch, two-pass exact heavy hitters, BFS hop distance,
  * and the leakage-safe holdout split. */
class SketchSpec extends AnyFunSuite {

  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def urls(n: Int, domains: Int) =
    (0 until n).map(i => (s"d${i % domains}.com", s"https://d${i % domains}.com/p/$i"))
      .toDF("domain", "url_canon")

  test("kmv: exact below k, estimate within 40% above k, k is the state bound") {
    val small = urls(60, 12) // 5 distinct urls per domain < k=8
    val rs = Sketches.kmvDistinct(small, k = 8).collect()
    assert(rs.length == 12)
    rs.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 5L)
      assert(r.getAs[Long]("est_distinct") == 5L, "below k the sketch is exact")
      assert(r.getAs[Long]("n_sketch") == 5L)
    }
    val big = urls(3000, 2) // 1500 distinct per domain >> k
    val rb = Sketches.kmvDistinct(big, k = 64).collect()
    rb.foreach { r =>
      val est = r.getAs[Long]("est_distinct").toDouble
      val exact = r.getAs[Long]("n_exact").toDouble
      assert(r.getAs[Long]("n_sketch") == 64L, "buffer capped at k")
      assert(math.abs(est - exact) / exact < 0.40, s"est=$est exact=$exact")
    }
  }

  test("kmv: duplicate urls do not inflate the sketch") {
    val dup = urls(40, 4).union(urls(40, 4)) // every url twice
    val once = Sketches.kmvDistinct(urls(40, 4), k = 8).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    Sketches.kmvDistinct(dup, k = 8).collect().foreach { r =>
      assert(r.toSeq.tail == once(r.getString(0)))
    }
  }

  test("misra-gries: guaranteed superset of items above n/k") {
    // 100 'hot' + 90 singletons, one partition, k=8: hot freq 100 > 190/8
    val stream = Seq.fill(100)("hot") ++ (0 until 90).map(i => s"cold$i")
    val surv = Sketches.misraGries(stream.iterator, 8).toSet
    assert(surv.contains("hot"))
    // adversarial order: hot interleaved last
    val inter = (0 until 90).map(i => s"cold$i") ++ Seq.fill(100)("hot")
    assert(Sketches.misraGries(inter.iterator, 8).toSet.contains("hot"))
  }

  test("heavy hitters: exact counts, only freq > n/k survive") {
    val vals = (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      (0 until 30).map(i => s"tail$i")).toDF("v").repartition(7)
    val hh = Sketches.heavyHitters(vals, k = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=100, n/k=25: alpha (50) qualifies, beta (20) and tails do not
    assert(hh == Map("alpha" -> 50L))
  }

  test("hop distance: hand-checked bfs, unreached is -1") {
    val nodes = Seq((0L, true), (1L, false), (2L, false), (3L, false), (4L, false))
      .toDF("id", "is_seed")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val d = Graph.hopDistance(nodes, edges, maxHops = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> -1L))
  }

  test("hop distance: maxHops bounds the reach") {
    val nodes = (0L to 5L).map(i => (i, i == 0L)).toDF("id", "is_seed")
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val d = Graph.hopDistance(nodes, chain, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(3L) == 3L && d(4L) == -1L && d(5L) == -1L)
  }

  test("hll: zero registers tracked, estimate within rel-err bound at 2000 distinct") {
    val norm = (0 until 2000).map(i => ("big.com", s"https://big.com/p/$i"))
      .toDF("domain", "url_canon")
    val r = Sketches.hllDistinct(norm).collect().head
    assert(r.getAs[Long]("v_zero") == 0L, "2000 urls fill all 64 registers")
    val est = r.getAs[Long]("est_raw").toDouble
    // m=64 → typical rel err 1.04/√64 = 13%; allow 3σ
    assert(math.abs(est - 2000) / 2000 < 0.4, s"est=$est")
  }

  test("hll: duplicate urls do not move the registers") {
    val once = (0 until 50).map(i => ("d.com", s"https://d.com/$i"))
      .toDF("domain", "url_canon")
    val twice = once.union(once)
    assert(Sketches.hllDistinct(once).collect().toSeq.map(_.toSeq) ==
      Sketches.hllDistinct(twice).collect().toSeq.map(_.toSeq))
  }

  test("rarity: ubiquitous tokens score 0 bits, rare tokens score high") {
    // 8 docs all contain 'the'; only doc 0 contains 'zyzzyva'
    val corpus = (0 until 8).map { i =>
      (i.toLong, if (i == 0) "the zyzzyva" else "the the")
    }.toDF("doc_id", "text")
    val m = TextStats.rarity(corpus).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("rarity_milli"))).toMap
    // 'the': df=8, N/df=1 → 0 bits. 'zyzzyva': df=1, N/df=8 → 3 bits.
    // doc0: (0+3)*1000 div 2 = 1500; others: 0
    assert(m(0L) == ((2L, 1500L)))
    assert(m(1L) == ((2L, 0L)))
  }

  test("budget: Hamilton apportionment sums to the budget, remainders break ties deterministically") {
    // weights 5,3,2 over budget 10 → exact shares 5,3,2 (no leftover)
    val w1 = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("domain", "weight")
    val r1 = Frontier.budget(w1, budget = 10L, cap = 100L).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(r1 == Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    // weights 1,1,1 over budget 10: base 3 each, leftover 1 → first domain
    // by (rem desc, domain asc) tie-break gets it
    val w2 = Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("domain", "weight")
    val r2 = Frontier.budget(w2, budget = 10L, cap = 100L).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(r2 == Map("x" -> 4L, "y" -> 3L, "z" -> 3L))
    assert(r2.values.sum == 10L)
  }

  test("budget: politeness cap trims and flags without redistribution") {
    val w = Seq(("hot", 90L), ("cold", 10L)).toDF("domain", "weight")
    val m = Frontier.budget(w, budget = 100L, cap = 50L).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("alloc"), r.getAs[Boolean]("capped"))).toMap
    assert(m("hot") == ((50L, true)))
    assert(m("cold") == ((10L, false)))
  }

  test("reciprocity: mutual pairs counted, one-way links are not") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val r = Graph.reciprocity(edges).collect().head
    assert(r.getAs[Long]("n_edges") == 5L)
    assert(r.getAs[Long]("n_reciprocal") == 4L) // both directions of both pairs
    assert(r.getAs[Long]("reciprocity_permille") == 800L)
  }

  test("transitions: lead pairs per user, permille within from-type") {
    val ts = (i: Int) => new java.sql.Timestamp(1704067200000L + i * 1000L)
    val ev = Seq(
      (1L, ts(0), 0L, "view"), (1L, ts(1), 1L, "click"), (1L, ts(2), 2L, "view"),
      (2L, ts(0), 3L, "view"), (2L, ts(1), 4L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val m = Relational.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("share_permille"))).toMap
    assert(m(("view", "click")) == ((2L, 1000L)))
    assert(m(("click", "view")) == ((1L, 1000L)))
    assert(m.size == 2)
  }

  test("hll merge: union estimate equals sketching the union directly") {
    val a = (0 until 300).map(i => ("a", "d.com", s"https://d.com/$i"))
    val b = (150 until 450).map(i => ("b", "d.com", s"https://d.com/$i"))
    val snaps = (a ++ b).toDF("snap", "domain", "url_canon")
    val merged = Sketches.hllMerge(snaps).collect().head
    // direct sketch of the union (450 distinct urls)
    val direct = Sketches.hllDistinct(
      (0 until 450).map(i => ("d.com", s"https://d.com/$i"))
        .toDF("domain", "url_canon")).collect().head
    assert(merged.getAs[Long]("est_union") == direct.getAs[Long]("est_raw"),
      "register max-merge must be bit-identical to sketching the union")
    // per-snapshot estimates are plain 300-distinct sketches — sane range
    for (c <- Seq("est_snap_a", "est_snap_b")) {
      val e = merged.getAs[Long](c).toDouble
      assert(math.abs(e - 300) / 300 < 0.4, s"$c=$e")
    }
  }

  test("bot detect: metronomic planted bots flagged, irregular humans pass") {
    val spark2 = spark
    import spark2.implicits._
    // humans: 60 events with irregular growing gaps over ~days
    val humans = (0 until 3).flatMap { u =>
      var t = 1704067200000L + u * 999L
      (0 until 60).map { i => t += 3600000L + i * 7919L + u * 13L; (u.toLong, new java.sql.Timestamp(t)) }
    }.toDF("user_id", "ts")
    val all = humans.unionByName(Relational.synthBots(spark, nBots = 2, perBot = 100))
    val out = Relational.botDetect(all).collect().map(_.getAs[Long]("user_id")).toSet
    assert(out == Set(9000L, 9001L))
  }

  test("semantic dedup: keeps lowest id, all drops above threshold, partition-invariant") {
    // deterministic synthetic embeddings + exact ×1.0 copies (same cell
    // guaranteed — identical vectors route identically)
    val base = (0L until 40L).map { i =>
      (i, Seq.tabulate(64)(t => (((i * 13 + t * 7) % 19).toFloat - 9f) / 9f))
    }
    val copies = base.take(10).map { case (i, e) => (i + 1000L, e) }
    val emb = (base ++ copies).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Quantize.semanticDedup(emb).collect()
    val drops = out.map(_.getAs[Long]("drop_id")).toSet
    // every exact copy must be dropped, with its base as keeper
    assert((1000L until 1010L).forall(drops.contains))
    out.foreach { r =>
      assert(r.getAs[Double]("cos") >= 0.95)
      assert(r.getAs[Long]("keep_id") < r.getAs[Long]("drop_id"))
    }
    // order-independence: a different partitioning yields the same rows
    val out2 = Quantize.semanticDedup(emb.repartition(13)).collect()
    assert(out.map(_.toSeq).toSet == out2.map(_.toSeq).toSet)
  }

  test("split holdout: a domain never straddles splits and totals add up") {
    val norm = (0 until 200).map(i => (i.toLong, s"site${i % 37}.com"))
      .toDF("doc_id", "domain")
    val agg = Sampling.splitHoldout(norm).collect()
    assert(agg.map(_.getAs[Long]("n_docs")).sum == 200L)
    // domain-keyed: distinct-domain counts across splits sum to the corpus
    // domain count (a doc-keyed split would overcount)
    assert(agg.map(_.getAs[Long]("n_domains")).sum == 37L)
  }

  test("count-min: est >= exact for every key; narrow width must overcount somewhere") {
    import spark.implicits._
    val keys = (0 until 400).map(i => s"key${i % 40}").toDF("key")
    val out = Sketches.countMin(keys).collect()
    assert(out.length == 40)
    assert(out.forall(r => r.getAs[Long]("est") >= r.getAs[Long]("exact")))
    assert(out.forall(r => r.getAs[Long]("exact") == 10L))
    // width 4 forces collisions among 40 keys → some overcount is certain
    val tight = Sketches.countMin(keys, depth = 2, width = 4L).collect()
    assert(tight.exists(_.getAs[Long]("overcount") > 0L))
  }

  test("count-min: shard cell tables merge by addition into the corpus cell table") {
    import spark.implicits._
    val a = (0 until 150).map(i => s"k${i % 13}").toDF("key")
    val b = (0 until 250).map(i => s"k${(i % 17) + 5}").toDF("key")
    def cellMap(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMinCells(df).as[(Int, Long, Long)].collect()
        .map { case (j, cell, c) => (j, cell) -> c }.toMap
    val merged = (cellMap(a).toSeq ++ cellMap(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == cellMap(a.union(b)))
  }

  test("ccnet line dedup: drop-all on the normalized key, survivors rebuild") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "Home | About | Contact\nunique alpha line\nCopyright 2024 Acme"),
      (2L, "HOME | ABOUT | CONTACT!\nunique beta line\ncopyright 1999 acme"),
      (3L, "something else entirely\nunique gamma line")).toDF("doc_id", "text")
    val out = Dedup.dedupLinesNormalized(corpus)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // nav + copyright lines normalize equal across docs 1/2 → all 4 dropped
    assert(out(0) == ((1L, 2L, 1L, Dedup.md5Hex("unique alpha line"))))
    assert(out(1) == ((2L, 2L, 1L, Dedup.md5Hex("unique beta line"))))
    assert(out(2) == ((3L, 0L, 2L,
      Dedup.md5Hex("something else entirely\nunique gamma line"))))
  }

  test("ccnet line key: casing, digits, punctuation, whitespace jitter collapse") {
    assert(Dedup.ccnetLineKey("  Home | About,  2024!!") == "home about")
    assert(Dedup.ccnetLineKey("home about") == "home about")
    assert(Dedup.ccnetLineKey("42 !?") == "")
    assert(Dedup.ccnetLineKey("a1b2c3") == "abc")
  }
}
