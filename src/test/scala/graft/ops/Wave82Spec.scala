package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionFixture
import org.apache.spark.sql.functions._

/** Wave 82: physical-layout planning (sort-order eval, partition skew). */
class Wave82Spec extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("zValue: Morton interleave bit positions") {
    val out = Seq((3L, 0L), (0L, 3L), (1L, 1L), (255L, 255L))
      .toDF("a", "b")
      .select(Storage.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // a bits land on odd positions, b bits on even
    assert(out(0) == 2 + 8)       // a=0b11 → bits 1,3
    assert(out(1) == 1 + 4)       // b=0b11 → bits 0,2
    assert(out(2) == 3)           // (1,1) → bits 1,0
    assert(out(3) == 65535)       // full 8+8 bits interleave densely
  }

  test("sortLayoutEval: clustered layouts prune, insertion does not") {
    val base = spark.range(400).select(
      col("id").as("row_key"),
      (col("id") % 20).as("domain_idx"),
      ((col("id") * 7) % 100).as("ts_bucket"))
    val out = Storage.sortLayoutEval(base, fileRows = 40).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set("insertion", "domain_major", "zorder"))
    assert(out.values.forall(_._1 == 10))
    // insertion order: modular keys spray every file → zero pruning
    assert(out("insertion")._2 == 1000 && out("insertion")._3 == 1000)
    // domain-major: point queries on domain touch few files...
    assert(out("domain_major")._2 < 300)
    // ...while z-order must beat insertion on BOTH dimensions
    assert(out("zorder")._2 < 1000 && out("zorder")._3 < 1000)
  }

  test("partitionSkewPlan: planted hot key vs uniform key") {
    val base = spark.range(300).select(
      when(col("id") % 3 === 0, lit("hot"))
        .otherwise(concat(lit("k"), (col("id") % 50).cast("string")))
        .as("domain"),
      (col("id") % 10).cast("string").as("shard"))
    val out = Storage.partitionSkewPlan(base,
        Seq(("domain", col("domain")), ("shard", col("shard"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getString(4), r.getLong(6),
          r.getLong(7), r.getBoolean(8))).toMap
    val (nk, mx, hot, skew, salt, needs) = out("domain")
    assert(nk == 51 && mx == 100 && hot == "hot")
    assert(skew == 100L * 1000L / (300L / 51L) && salt > 1 && needs)
    val (_, mxS, _, skewS, saltS, needsS) = out("shard")
    assert(mxS == 30 && skewS == 1000 && saltS == 1 && !needsS)
  }
}
