package graft

import org.apache.spark.sql.SparkSession

/** Session hygiene for long-lived sessions running graft operators.
  *
  * Several builders `cache()` intermediates that their RETURNED (lazy)
  * frame still references (`UserSimilarity.featurize`'s tokenized
  * corpus, the relational TF-IDF weight matrix, `DedupQueries`'
  * shingle/signature frames) — they cannot unpersist before returning
  * because the caller hasn't executed the plan yet. The iterative
  * operators (`Dedup.connectedComponents`, `ops.Graph`) additionally
  * leave `localCheckpoint` blocks, which live OUTSIDE the SQL cache
  * manager: `spark.catalog.clearCache()` never touches them, and they
  * otherwise linger until a GC happens to run the ContextCleaner —
  * measured as the prime suspect for 5-12× late-suite inflation in this
  * repo's own bench history (Bench.scala's per-query hygiene notes).
  *
  * [[sweep]] is that hygiene as API: call it after MATERIALIZING a
  * result you are done with (collect/write), not between building and
  * executing a plan — sweeping a cache a still-lazy frame references
  * just forfeits the reuse the builder paid for. One-shot jobs can skip
  * it; the caches die with the session.
  */
object Sessions {

  /** Drop every SQL-cached plan AND every persistent RDD block
    * (including `localCheckpoint` blocks) of the session. Non-blocking:
    * block deletion is queued to the BlockManager; the storage memory is
    * reclaimable immediately for new allocations. */
  def sweep(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = false))
  }
}
