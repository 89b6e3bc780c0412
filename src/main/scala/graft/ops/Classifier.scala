package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed quality-classifier training — the step after hand-written
  * quality RULES (gopherRules, lmScore): fit a linear model on labeled
  * examples so the filter generalizes. The classic pipeline trains a
  * fastText/LR model on "good vs junk" labels; the distributed fit below is
  * the batch PERCEPTRON, chosen because its update rule is pure integer
  * arithmetic — which makes an iterative, multi-round distributed ML fit
  * bit-exactly reproducible in the DuckDB oracle (a recursive CTE), where
  * float gradients would drift across engines.
  *
  * Fit shape (the MLlib pattern): each round is ONE aggregation over the
  * corpus — sum of y·x over currently-misclassified rows (margin y·(w·x) ≤
  * 0), map-side combined, so per-round driver traffic is exactly five
  * int64s regardless of corpus size. Weights live on the driver (4 longs)
  * and enter the next round's expression as literals — zero joins, zero
  * broadcasts, K scans for K rounds. Features are cached across rounds
  * (they are K-reused); at 10^12 rows the cache spills or the scan re-runs —
  * either is correct.
  *
  * Integer bounds: |x_j| ≤ 1000, so |Δw_j| ≤ 1000·n_docs per round and
  * |margin| ≤ 4·1000·|w|_max — int64-safe for any corpus below ~10^12 docs
  * per fit round (shard or rescale beyond that). */
object Classifier {

  /** Labeled corpus for the oracle-checked fit: every 5th document is
    * corrupted with a 200-token repeated-junk suffix (y = −1), the rest are
    * clean (y = +1) — the repetition features then carry the signal. The
    * suffix is `repeat(' zq', 200)` so DuckDB regenerates it verbatim. */
  def corpusWithLabels(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(" zq" * 200)))
        .otherwise(col("text")).as("text"),
      when(col("doc_id") % 5 === 0, lit(-1L)).otherwise(lit(1L)).as("y"))

  /** Integer features per labeled row, one typed-map pass (same per-row
    * histogram fold as TextStats.repetition, carrying y through):
    * x1 = min(n_tokens, 1000), x2 = top-unigram share ×1000,
    * x3 = repeated-token share ×1000, x4 = 1000 (bias). */
  def features(labeled: DataFrame): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    labeled.select(col("doc_id"), col("y"), col("text")).as[(Long, Long, String)]
      .map { case (id, y, t) =>
        val toks = if (t.trim.isEmpty) Array.empty[String] else t.split(" ", -1)
        val n = toks.length
        val uni = new scala.collection.mutable.HashMap[String, Long]()
        toks.foreach(w => uni.update(w, uni.getOrElse(w, 0L) + 1L))
        val topUni = if (uni.isEmpty) 0L else uni.values.max
        val dupToks = uni.values.filter(_ > 1L).sum
        def frac(num: Long, den: Long): Long =
          if (den == 0L) 0L else math.floor(num.toDouble * 1000.0 / den.toDouble).toLong
        (id, y, math.min(n, 1000).toLong, frac(topUni, n), frac(dupToks, n), 1000L)
      }
      .toDF("doc_id", "y", "x1", "x2", "x3", "x4")
  }

  /** Batch perceptron over (doc_id, y, x1..x4): returns the fit TRACE —
    * one row per round r = 0..rounds with the weights entering that round
    * and the misclassified count at those weights; rows r < rounds then
    * apply the update w += Σ_misclassified y·x. Deterministic: the batch
    * sum is order-independent integer addition. */
  def perceptronFit(feats: DataFrame, rounds: Int = 6): DataFrame = {
    val spark = feats.sparkSession
    val f = feats.cache()
    val w = Array(0L, 0L, 0L, 0L)
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long)]
    for (r <- 0 to rounds) {
      val margin = col("y") *
        (col("x1") * w(0) + col("x2") * w(1) + col("x3") * w(2) + col("x4") * w(3))
      val mis = margin <= 0
      val row: Row = f.select(
        coalesce(sum(when(mis, col("y") * col("x1")).otherwise(0L)), lit(0L)),
        coalesce(sum(when(mis, col("y") * col("x2")).otherwise(0L)), lit(0L)),
        coalesce(sum(when(mis, col("y") * col("x3")).otherwise(0L)), lit(0L)),
        coalesce(sum(when(mis, col("y") * col("x4")).otherwise(0L)), lit(0L)),
        coalesce(sum(when(mis, 1L).otherwise(0L)), lit(0L))).collect()(0)
      trace += ((r.toLong, w(0), w(1), w(2), w(3), row.getLong(4)))
      if (r < rounds) (0 to 3).foreach(j => w(j) += row.getLong(j))
    }
    f.unpersist()
    import spark.implicits._
    trace.toSeq.toDF("round", "w1", "w2", "w3", "w4", "n_mis")
  }

  /** Uncertainty sampling (Lewis & Gale 1994 — the active-learning
    * baseline every labeling budget starts with): the k corpus rows the
    * frozen classifier is LEAST sure about (smallest |margin|), i.e.
    * where one human label buys the most decision-boundary information.
    * Deterministic ties by doc_id.
    *
    * Scale shape: scoring is the same codegen'd projection as inference;
    * the selection is orderBy+limit = TakeOrderedAndProject — k rows per
    * task cross the wire, never a corpus sort. */
  def uncertaintySample(feats: DataFrame, w: (Long, Long, Long, Long),
                        k: Int): DataFrame = {
    val score = col("x1") * w._1 + col("x2") * w._2 +
      col("x3") * w._3 + col("x4") * w._4
    feats.select(col("doc_id"), col("y"), score.as("margin"))
      .orderBy(abs(col("margin")).asc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("y"), col("margin"),
        abs(col("margin")).as("abs_margin"))
  }

  /** Calibration audit of the frozen classifier — the reliability-diagram
    * table every deployed gate needs next to P/R: margins squash to a
    * permille pseudo-probability (clamped linear map, scale = the
    * corpus-max |margin| so bins spread by construction), fall into ten
    * FIXED-WIDTH bins (never a corpus-wide quantile sort), and each bin
    * reports mean predicted vs observed positive rate and their gap.
    * |gap| summed n-weighted is ECE; the per-bin rows keep the full
    * diagram. The numerator is shifted non-negative BEFORE the integer
    * division so Spark's truncating `div` and DuckDB's flooring `//`
    * agree — divisions on possibly-negative values never happen.
    *
    * Scale shape: one codegen'd scoring projection, one 2-long max
    * aggregate for the scale, one 10-row group-by. */
  def calibrationBins(feats: DataFrame, w: (Long, Long, Long, Long),
                      nBins: Int = 10): DataFrame = {
    val score = col("x1") * w._1 + col("x2") * w._2 +
      col("x3") * w._3 + col("x4") * w._4
    val scored = feats.select(col("y"), score.as("s")).localCheckpoint(false)
    val sMax = scored.agg(coalesce(max(abs(col("s"))), lit(0L)))
      .head().getLong(0)
    val scale = math.max(1L, sMax / 500L)
    val half = 500L * scale
    val out = scored
      .select(col("y"),
        expr(s"(greatest(${-half}L, least(${half}L, s)) + ${half}L) div ${scale}L")
          .as("p_pm"))
      .select(col("y"), col("p_pm"),
        least(expr("p_pm div 100"), lit((nBins - 1).toLong)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("p_pm")).as("sp"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("npos"))
      .select(col("bin"), col("n"),
        expr("sp div n").as("mean_pred_pm"),
        expr("npos * 1000 div n").as("obs_pos_pm"),
        expr("abs(sp div n - npos * 1000 div n)").as("gap_pm"))
      .localCheckpoint(false)
    scored.unpersist(false)
    out
  }

  /** Classifier EVALUATION — the confusion matrix + integer
    * precision/recall a quality-filter ships with (nobody deploys a
    * corpus gate on training loss alone). Inference is one codegen'd
    * projection with the weights as literals (a deployed classifier is a
    * frozen artifact riding the scan — zero joins); the confusion rollup
    * is a single algebraic aggregate. pred = sign(x·w) with 0 → −1,
    * matching the fit's margin ≤ 0 misclassification convention. */
  def evalConfusion(feats: DataFrame, w: (Long, Long, Long, Long)): DataFrame = {
    val score = col("x1") * w._1 + col("x2") * w._2 +
      col("x3") * w._3 + col("x4") * w._4
    feats
      .select(col("y"), when(score > 0, 1L).otherwise(-1L).as("pred"))
      .agg(sum(when(col("y") === 1L && col("pred") === 1L, 1L).otherwise(0L)).as("tp"),
           sum(when(col("y") === -1L && col("pred") === 1L, 1L).otherwise(0L)).as("fp"),
           sum(when(col("y") === 1L && col("pred") === -1L, 1L).otherwise(0L)).as("fn"),
           sum(when(col("y") === -1L && col("pred") === -1L, 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000 div (tp + fp) END")
          .as("precision_permille"),
        expr("CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000 div (tp + fn) END")
          .as("recall_permille"))
  }

  /** Two-fold cross-fit disagreement — the Confident-Learning-style
    * label-noise audit (Northcutt, Jiang & Chuang, JAIR 2021, reduced to
    * its deterministic core): fit the gate on each half of the corpus
    * (doc_id parity folds), score each half with the OTHER half's frozen
    * weights, and tabulate (fold, label, prediction) counts — the
    * off-diagonal mass is the out-of-sample disagreement that flags
    * candidate label errors, uncontaminated by memorization because no
    * document is scored by a model that saw it. Rates in integer
    * permille of the fold.
    *
    * Scale shape: two [[perceptronFit]] runs (each a per-round 5-long
    * driver fold over half the corpus) + one codegen'd scoring pass +
    * an ≤8-row rollup. Output: (fold, y, pred, n, fold_n, rate_pm). */
  def crossFitDisagreement(feats: DataFrame, rounds: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = feats.localCheckpoint(false) // first round's aggregate materializes
    // Both folds' fits are independent, so each round runs ONE fused
    // aggregate computing the parity-conditional update sums for fold 0
    // AND fold 1 together — `rounds` driver round-trips instead of the
    // former 2×(rounds+1) separate perceptronFit collects. The per-fold
    // sums are exactly perceptronFit's batch sums (integer, conditional
    // on doc_id parity), so the resulting weights are bit-identical to
    // fitting each fold separately; only the final weights are needed
    // here (the trace row the old code read was the post-update one).
    val wa = Array(0L, 0L, 0L, 0L)
    val wb = Array(0L, 0L, 0L, 0L)
    for (_ <- 1 to rounds) {
      def mis(w: Array[Long]) = (col("y") *
        (col("x1") * w(0) + col("x2") * w(1) + col("x3") * w(2) + col("x4") * w(3))) <= 0
      val even = col("doc_id") % 2 === 0L
      val sums = Seq( // fold 0 (even ids) under wa, fold 1 under wb
        ("x1", wa, even), ("x2", wa, even), ("x3", wa, even), ("x4", wa, even),
        ("x1", wb, !even), ("x2", wb, !even), ("x3", wb, !even), ("x4", wb, !even))
        .map { case (c, w, side) =>
          coalesce(sum(when(side && mis(w), col("y") * col(c)).otherwise(0L)), lit(0L))
        }
      val row = f.select(sums: _*).collect()(0)
      (0 to 3).foreach { j =>
        wa(j) += row.getLong(j)
        wb(j) += row.getLong(4 + j)
      }
    }
    val w0 = (wa(0), wa(1), wa(2), wa(3))
    val w1 = (wb(0), wb(1), wb(2), wb(3))
    def evalFold(fold: Long, w: (Long, Long, Long, Long)): DataFrame = {
      val score = col("x1") * w._1 + col("x2") * w._2 +
        col("x3") * w._3 + col("x4") * w._4
      f.where(col("doc_id") % 2 === fold)
        .select(lit(fold).as("fold"), col("y"),
          when(score > 0, 1L).otherwise(-1L).as("pred"))
    }
    val out = evalFold(0L, w1).unionByName(evalFold(1L, w0))
      .groupBy("fold", "y", "pred").agg(count(lit(1)).as("n"))
      .withColumn("fold_n", sum(col("n")).over(Window.partitionBy("fold")))
      .withColumn("rate_pm", expr("n * 1000 div fold_n"))
      .localCheckpoint(false)
    f.unpersist(false)
    out
  }

  /** Binned ROC curve + exact trapezoid AUC of the deployed gate — the
    * threshold-choice companion to [[calibrationBins]]: scores quantize
    * to the same clamped permille scale and ten fixed bins (no corpus
    * sort — an exact rank-based AUC would need a global order; the
    * documented deviation is 10-bin resolution), each bin-boundary
    * threshold "predict positive if bin ≥ t" yields a cumulative
    * (tp, fp) point, and AUC is the trapezoid sum over those points in
    * micro-units, halved once at the end so every step stays integer.
    * Empty bins simply skip a point — the lag-based trapezoid spans the
    * gap exactly.
    *
    * Scale shape: one map-side-combined 10-row bin aggregate; the
    * cumsum/lag/total windows run on ≤ 10 rows. Output per non-empty
    * bin: (thr_bin, n, npos, tp, fp, tpr_pm, fpr_pm, auc_micro). */
  def rocBins(feats: DataFrame, w: (Long, Long, Long, Long),
              nBins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val score = col("x1") * w._1 + col("x2") * w._2 +
      col("x3") * w._3 + col("x4") * w._4
    val scored = feats.select(col("y"), score.as("s")).localCheckpoint(true)
    val sMax = scored.agg(coalesce(max(abs(col("s"))), lit(0L)))
      .head().getLong(0)
    val scale = math.max(1L, sMax / 500L)
    val half = 500L * scale
    val bins = scored
      .select(col("y"),
        expr(s"(greatest(${-half}L, least(${half}L, s)) + ${half}L) div ${scale}L")
          .as("p_pm"))
      .select(col("y"), least(expr("p_pm div 100"), lit((nBins - 1).toLong)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("npos"))
      .withColumn("nneg", col("n") - col("npos"))
    val desc = Window.orderBy(col("bin").desc)
    val cum = desc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val out = bins
      .withColumn("tp", sum(col("npos")).over(cum))
      .withColumn("fp", sum(col("nneg")).over(cum))
      .withColumn("p", sum(col("npos")).over(all))
      .withColumn("nn", sum(col("nneg")).over(all))
      .select(col("bin").as("thr_bin"), col("n"), col("npos"),
        col("tp"), col("fp"),
        expr("CASE WHEN p = 0 THEN 0 ELSE tp * 1000 div p END").as("tpr_pm"),
        expr("CASE WHEN nn = 0 THEN 0 ELSE fp * 1000 div nn END").as("fpr_pm"))
      .withColumn("trap", {
        val descThr = Window.orderBy(col("thr_bin").desc)
        (col("fpr_pm") - coalesce(lag(col("fpr_pm"), 1).over(descThr), lit(0L))) *
          (col("tpr_pm") + coalesce(lag(col("tpr_pm"), 1).over(descThr), lit(0L)))
      })
      .withColumn("auc_micro", expr("sum(trap) OVER () div 2"))
      .drop("trap")
      .localCheckpoint(true)
    scored.unpersist(false)
    out
  }
}
