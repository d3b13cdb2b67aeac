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
}
