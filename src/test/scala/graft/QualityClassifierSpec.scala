package graft

import org.apache.spark.sql.functions._
import graft.pipelines.QualityClassifier
import graft.queries.Tables

/** The LR quality distillation must separate its own weak labels (that
  * is what distillation means), score every tokenizable doc, and keep
  * the sampled-fit path (the 100 TB posture) consistent with the
  * full-fit path. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")

  test("scores cover every tokenizable doc; probabilities are calibrated-range") {
    val model = QualityClassifier.fit(docs)
    val scored = QualityClassifier.score(docs, model).cache()
    val nFeatures = QualityClassifier.featurize(docs).count()
    assert(scored.count() == nFeatures)
    val (pmin, pmax) = scored.agg(min($"prob"), max($"prob"))
      .as[(Double, Double)].head()
    assert(pmin >= 0.0 && pmax <= 1.0)
    // both classes must actually occur in the fixture for AUC to mean anything
    val nPos = scored.filter($"label" === 1.0).count()
    assert(nPos > 0 && nPos < nFeatures, s"degenerate labels: $nPos of $nFeatures")
  }

  test("AUC >= 0.9 against the weak labels; agreement >= 0.85") {
    val model = QualityClassifier.fit(docs)
    val scored = QualityClassifier.scoreWithRaw(docs, model).cache()
    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("probability")
      .setMetricName("areaUnderROC").evaluate(scored)
    assert(auc >= 0.9, s"AUC $auc")
    val agree = scored.agg(avg(when($"pred" === $"label", 1.0).otherwise(0.0)))
      .as[Double].head()
    assert(agree >= 0.85, s"agreement $agree")
  }

  test("model save/load round trip scores identically (deploy-time persistence)") {
    // the production shape: fit once on the training cluster, persist,
    // load on every scoring cluster — the loaded model must be the
    // same function, bit-for-bit on probabilities
    val model = QualityClassifier.fit(docs)
    val dir = java.nio.file.Files.createTempDirectory("quality_model").toString
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.classification.LogisticRegressionModel.load(dir)
    assert(loaded.coefficients == model.coefficients)
    assert(loaded.intercept == model.intercept)
    val a = QualityClassifier.score(docs, model)
      .select($"doc_id", $"prob").as[(Long, Double)].collect().toMap
    val b = QualityClassifier.score(docs, loaded)
      .select($"doc_id", $"prob").as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("hash-gated sampled fit scores the FULL corpus and stays useful") {
    val model = QualityClassifier.fit(docs, fitSampleBp = 3000)
    val scored = QualityClassifier.scoreWithRaw(docs, model).cache()
    assert(scored.count() == QualityClassifier.featurize(docs).count())
    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("probability")
      .setMetricName("areaUnderROC").evaluate(scored)
    assert(auc >= 0.85, s"sampled-fit AUC $auc")
  }

  test("calibration: Brier + reliability table over the model's scored frame") {
    // the q232 machinery applied to the REAL model probabilities (float
    // output, so spec-checked here rather than oracle-hashed): the
    // table must partition the scored frame exactly, rates must be
    // probabilities, and the proper-score sanity bounds must hold
    import graft.ops.Calibration
    val model = QualityClassifier.fit(docs)
    val scored = QualityClassifier.score(docs, model).cache()
    val n = scored.count()
    val rel = Calibration.reliability(scored, $"prob", $"label")
      .orderBy($"bin")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    // exact partition: bins 0..9, every row in exactly one bin
    assert(rel.map(_._2).sum == n)
    assert(rel.forall(r => r._1 >= 0 && r._1 <= 9))
    assert(rel.map(_._1).distinct.length == rel.length)
    rel.foreach { case (bin, nb, npos, meanP, obsRate) =>
      assert(npos >= 0 && npos <= nb)
      assert(meanP >= 0.0 && meanP <= 1.0 && obsRate >= 0.0 && obsRate <= 1.0)
      // mean predicted p must lie inside its own bin (top edge clamped)
      val (lo, hi) = (bin / 10.0, if (bin == 9) 1.0 else (bin + 1) / 10.0)
      assert(meanP >= lo - 1e-6 && meanP <= hi + 1e-6,
        s"bin $bin mean_p $meanP outside [$lo, $hi]")
      assert(math.abs(obsRate - npos.toDouble / nb) < 1e-6)
    }
    val (bn, brier) = Calibration.brier(scored, $"prob", $"label")
      .as[(Long, Double)].head()
    assert(bn == n)
    // a distilled model that separates its own labels must beat the
    // 0.25 chance floor comfortably
    assert(brier >= 0.0 && brier < 0.25, s"brier $brier")
  }

  test("isotonic: hand-computed pooling, monotone identity, mass preservation") {
    import graft.ops.Calibration
    // violator at bins 1-2 (rates .2, .5, .3, equal weights): PAV pools
    // the last two -> (.2, .4, .4); minimax must reproduce it exactly
    val rel = Seq((0, 10L, 2L), (1, 10L, 5L), (2, 10L, 3L))
      .toDF("bin", "n", "n_pos")
    val got = Calibration.isotonic(rel).orderBy($"bin")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._5) == Seq(0.2, 0.4, 0.4), got.toString)
    // already-monotone input is a fixed point
    val mono = Seq((0, 10L, 1L), (1, 10L, 5L), (2, 10L, 9L))
      .toDF("bin", "n", "n_pos")
    val fix = Calibration.isotonic(mono).orderBy($"bin")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(fix.forall(r => r._4 == r._5), fix.toString)
    // on the real model's reliability table: monotone non-decreasing
    // and total positive mass preserved (the PAV invariant)
    val model = QualityClassifier.fit(docs)
    val scored = QualityClassifier.score(docs, model)
    val iso = Calibration.isotonic(
        Calibration.reliability(scored, $"prob", $"label"))
      .orderBy($"bin")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(iso.nonEmpty)
    iso.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 <= b._5 + 1e-12, s"$a !<= $b")
      case _ => ()
    }
    val massIn = iso.map(_._3).sum.toDouble
    val massOut = iso.map(r => r._2 * r._5).sum
    assert(math.abs(massOut - massIn) < 1e-6, s"$massOut vs $massIn")
  }
}
