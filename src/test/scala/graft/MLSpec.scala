package graft

import graft.core.DDFManager
import graft.ml.MLSupport
import org.apache.spark.sql.functions._

/** ML capability parity (SURVEY §2.12): train/applyModel/yPredict,
  * kmeans, linear models, ALS, CV splits, confusion matrix, metrics.
  */
class MLSpec extends SparkTestBase {

  private lazy val m = DDFManager(spark)

  test("kmeans: k clusters, applyModel appends yPredict") {
    import spark.implicits._
    val pts = (1 to 60).map { i =>
      val c = i % 3
      (i.toLong, c * 10.0 + (i % 5) * 0.1, c * 10.0 - (i % 7) * 0.1)
    }
    val ddf = m.register(pts.toDF("id", "x", "y"))
    val model = MLSupport.train(ddf, "kmeans", Seq("x", "y"), params = Map("k" -> 3))
    val scored = MLSupport.applyModel(ddf, model)
    assert(scored.columnNames.contains("yPredict"))
    val clusters = scored.df.select("yPredict").distinct().count()
    assert(clusters == 3)
    // points from one generator cluster land together
    val purity = scored.df.groupBy((col("id") % 3).as("truth"), col("yPredict"))
      .count().groupBy("truth").agg(max("count").as("m"))
      .agg(sum("m")).first().getLong(0)
    assert(purity == 60)
  }

  test("linear regression recovers a linear relationship; r2/rmse") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i.toDouble, 3.0 * i + 7.0))
    val ddf = m.register(rows.toDF("x", "y"))
    val model = MLSupport.train(ddf, "mlr", Seq("x"), "y")
    val scored = MLSupport.applyModel(ddf, model)
    val r2 = MLSupport.r2Score(scored.df, "y")
    assert(r2 > 0.999)
    assert(MLSupport.rmse(scored.df, "y") < 1.0)
    // reference 3-arg applyModel(hasLabels, includeFeatures): flag is a
    // contract check — true requires the label column to be present
    val s2 = MLSupport.applyModel(ddf, model, hasLabels = true, includeFeatures = false)
    assert(s2.df.columns.contains("yPredict") && !s2.df.columns.contains("x"))
    val noLabel = m.register(ddf.df.drop("y"))
    intercept[IllegalArgumentException] {
      MLSupport.applyModel(noLabel, model, hasLabels = true, includeFeatures = true)
    }
  }

  test("svm separates linearly separable classes; confusion matrix") {
    import spark.implicits._
    val rows = (1 to 100).map { i =>
      val label = if (i % 2 == 0) 1.0 else 0.0
      (label, label * 10 + (i % 5) * 0.1, label * 8 - (i % 3) * 0.1)
    }
    val ddf = m.register(rows.toDF("label", "f1", "f2"))
    val model = MLSupport.train(ddf, "svm", Seq("f1", "f2"), "label")
    val scored = MLSupport.applyModel(ddf, model)
    val cm = MLSupport.confusionMatrix(scored.df, "label", "yPredict", 0.5)
    assert(cm.getOrElse((true, true), 0L) == 50L)
    assert(cm.getOrElse((false, false), 0L) == 50L)
    assert(!cm.contains((true, false)) && !cm.contains((false, true)))
  }

  test("quality classifier loop: hashed text features -> svm separates junk from clean") {
    import spark.implicits._
    // 20 junk docs (repetitive spam tokens) vs 20 clean docs (varied
    // vocabulary) — the model-based quality-filtering shape: featurize
    // with the hashing trick, train, score the corpus
    val docs = ((1 to 20).map(i => (i.toLong, "buy now spam " * 8 + s"offer$i", 1.0)) ++
      (21 to 40).map(i => (i.toLong,
        s"the quick report n$i covers results from experiment e$i in detail " +
          s"with methods m$i and findings f$i", 0.0))).toDF("id", "text", "label")
    val dim = 16
    val feats = graft.pipeline.TextAnalysis.hashedTokenFeatures(
      docs, "text", "id", dim, dense = true)
    val fcols = (0 until dim).map(i => s"f$i")
    val wide = feats.select(col("id") +: (0 until dim)
      .map(i => col("features")(i).as(s"f$i")): _*)
      .join(docs.select("id", "label"), "id")
    val ddf = m.register(wide)
    val model = MLSupport.train(ddf, "svm", fcols, "label")
    val scored = MLSupport.applyModel(ddf, model)
    val cm = MLSupport.confusionMatrix(scored.df, "label", "yPredict", 0.5)
    val correct = cm.getOrElse((true, true), 0L) + cm.getOrElse((false, false), 0L)
    assert(correct >= 38, s"quality classifier should separate, got $cm")
    // dense and sparse featurizations agree
    val sparse = graft.pipeline.TextAnalysis.hashedTokenFeatures(
        docs, "text", "id", dim)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1) zip r.getSeq[Double](2)).toMap).toMap
    val dense = feats.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, vec) <- dense; i <- 0 until dim)
      assert(vec(i) == sparse(id).getOrElse(i, 0.0), s"id=$id bucket=$i")
  }

  test("ridgeClosedForm2 recovers a planted integer-linear relation exactly") {
    import spark.implicits._
    // y = 3·x1 − 2·x2 + 5 with zero noise: at λ→0 the normal equations
    // return the planted weights, and milli-rounding lands exactly
    val df = (for (a <- 0 to 20; b <- 0 to 20)
      yield (a.toLong, b.toLong, (3 * a - 2 * b + 5).toLong)).toDF("x1", "x2", "y")
    val w = MLSupport.ridgeClosedForm2(df, "x1", "x2", "y", lambda = 1e-9)
    assert(w == MLSupport.RidgeWeights(3000L, -2000L, 5000L), s"got $w")
    // determinism: a second run over a reshuffled frame returns identical
    // weights (exact integer sums are order-independent)
    val w2 = MLSupport.ridgeClosedForm2(df.repartition(7), "x1", "x2", "y", lambda = 1e-9)
    assert(w2 == w)
  }

  test("als fits and predicts ratings") {
    import spark.implicits._
    val ratings = for (u <- 0 until 8; i <- 0 until 8 if (u + i) % 2 == 0)
      yield (u, i, ((u * i) % 5 + 1).toFloat)
    val ddf = m.register(ratings.toDF("user", "item", "rating"))
    val model = MLSupport.train(ddf, "als", Nil,
      params = Map("userCol" -> "user", "itemCol" -> "item", "ratingCol" -> "rating", "rank" -> 4))
    val scored = MLSupport.applyModel(ddf, model)
    assert(scored.df.filter(col("yPredict").isNotNull).count() > 0)
  }

  test("cv splits: kfold bands are disjoint, cover, and reproduce exactly") {
    import spark.implicits._
    val ddf = m.register((1 to 200).toDF("v"))
    val folds = MLSupport.cvKFold(ddf, 4, "v", seed = 11)
    assert(folds.size == 4)
    val testTotal = folds.map(_._2.count()).sum
    assert(testTotal == 200) // bands partition the data
    folds.foreach { case (tr, te) => assert(tr.count() + te.count() == 200) }
    // every band is populated (hash uniformity sanity)
    folds.foreach { case (_, te) => assert(te.count() > 20) }
    // hash membership (not RNG): a re-run selects the SAME test rows
    val te0a = folds.head._2.select("v").collect().map(_.getInt(0)).toSet
    val te0b = MLSupport.cvKFold(ddf, 4, "v", seed = 11)
      .head._2.select("v").collect().map(_.getInt(0)).toSet
    assert(te0a == te0b)
    val (tr, te) = MLSupport.cvRandom(ddf, 2, 0.75, "v", seed = 5).head
    assert(tr.count() + te.count() == 200)
    val frac = tr.count().toDouble / 200
    assert(frac > 0.6 && frac < 0.9, s"train fraction $frac far from 0.75")
    // string id refuses loudly
    val bad = m.register(Seq("a", "b").toDF("id"))
    intercept[IllegalArgumentException] { MLSupport.cvKFold(bad, 2, "id", 1) }
  }

  test("aucByGroup: hand-checked values, ties, degenerate and bad-label paths") {
    import spark.implicits._
    // perfect separation: pos scores all above neg → AUC 1
    val perfect = Seq(("a", 0.9, 1), ("a", 0.8, 1), ("a", 0.2, 0), ("a", 0.1, 0),
      // reversed group: AUC 0
      ("b", 0.1, 1), ("b", 0.9, 0),
      // all-tied group: AUC 0.5 by the tie rule
      ("c", 0.5, 1), ("c", 0.5, 0), ("c", 0.5, 0))
      .toDF("g", "score", "label")
    val out = MLSupport.aucByGroup(perfect, "score", "label", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 1.0 && out("b") == 0.0 && out("c") == 0.5)
    // matches MLlib's evaluator on a non-trivial mixed set (exact: every
    // contribution is a multiple of 0.5, both sides compute rank-sums)
    val mixed = (1 to 200).map { i =>
      val label = if ((i * 13) % 7 < 3) 1.0 else 0.0
      val score = ((i * 31) % 17) / 17.0 + label * 0.15
      (score, label)
    }.toDF("score", "label")
    val ours = MLSupport.aucByGroup(mixed, "score", "label", Nil)
      .collect()(0).getDouble(0)
    val mllib = {
      import org.apache.spark.ml.linalg.Vectors
      val scored = mixed.select(col("label"),
        org.apache.spark.ml.functions.array_to_vector(
          array(lit(0.0) - col("score"), col("score"))).as("raw"))
      MLSupport.rocAuc(scored, "label", "raw")
    }
    assert(math.abs(ours - mllib) < 1e-9, s"ours $ours vs mllib $mllib")
    // single-class group → NULL auc, counts still reported
    val deg = MLSupport.aucByGroup(
      Seq(("d", 0.3, 1), ("d", 0.7, 1)).toDF("g", "score", "label"),
      "score", "label", Seq("g")).collect()(0)
    assert(deg.isNullAt(1) && deg.getLong(2) == 2 && deg.getLong(3) == 0)
    // non-0/1 labels fail the job rather than skewing the statistic
    val err = intercept[Exception] {
      MLSupport.aucByGroup(Seq(("e", 0.5, 2)).toDF("g", "score", "label"),
        "score", "label", Seq("g")).collect()
    }
    assert(err.getMessage != null)
    // quantized path: bucketing at 1e4 on 1e-?-grid scores reproduces exact
    val q = MLSupport.aucByGroup(mixed, "score", "label", Nil, scoreBuckets = 100000)
      .collect()(0).getDouble(0)
    assert(math.abs(q - ours) < 2e-3, s"bucketed $q vs exact $ours")
    // NULL/NaN scores fail loudly — they'd silently bias the rank sum
    intercept[Exception] {
      MLSupport.aucByGroup(
        Seq((Some(0.5), 1), (None, 0)).toDF("score", "label"),
        "score", "label", Nil).collect()
    }
    intercept[Exception] {
      MLSupport.aucByGroup(
        Seq((Double.NaN, 1), (0.5, 0)).toDF("score", "label"),
        "score", "label", Nil).collect()
    }
  }

  test("calibrationBuckets: bin math, perfect calibration, range guard") {
    import spark.implicits._
    // scores on an exact binary grid; label drawn so bin accuracy == bin
    // confidence for a perfectly calibrated column of 0/1 at rate k/8
    val rows = for (k <- 0 until 8; j <- 0 until 8) yield
      ((k + 0.5) / 8.0, if (j < k) 1.0 else 0.0)
    val df = rows.toDF("score", "label")
    val b = MLSupport.calibrationBuckets(df, "score", "label", 8)
      .orderBy("bin").collect()
    assert(b.length == 8)
    b.zipWithIndex.foreach { case (r, k) =>
      assert(r.getLong(0) == k && r.getLong(1) == 8)
      assert(math.abs(r.getDouble(2) - (k + 0.5) / 8.0) < 1e-12)
      assert(math.abs(r.getDouble(3) - k / 8.0) < 1e-12)
      assert(math.abs(r.getDouble(4) - 0.5 / 8.0) < 1e-12) // gap = 1/16
    }
    // score exactly 1.0 lands in the last (closed) bin
    val top = MLSupport.calibrationBuckets(
      Seq((1.0, 1.0)).toDF("score", "label"), "score", "label", 8).collect()(0)
    assert(top.getLong(0) == 7)
    // out-of-range score fails the job
    intercept[Exception] {
      MLSupport.calibrationBuckets(
        Seq((1.5, 1.0)).toDF("score", "label"), "score", "label", 8).collect()
    }
    // NULL score fails the job too — 3VL would slip it past the range
    // guard into a junk NULL bin that NULLs any downstream ECE sum
    intercept[Exception] {
      MLSupport.calibrationBuckets(
        Seq((Some(0.5), 1.0), (None, 0.0)).toDF("score", "label"),
        "score", "label", 8).collect()
    }
    // labels get the same loud guard (r14 review): a NULL or non-0/1
    // label silently counted as 'incorrect' would skew accuracy/ECE
    intercept[Exception] {
      MLSupport.calibrationBuckets(
        Seq((0.5, Some(1.0)), (0.5, None)).toDF("score", "label"),
        "score", "label", 8).collect()
    }
    intercept[Exception] {
      MLSupport.calibrationBuckets(
        Seq((0.5, 2.0)).toDF("score", "label"), "score", "label", 8).collect()
    }
  }
}
