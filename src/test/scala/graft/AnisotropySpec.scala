package graft

import org.apache.spark.sql.functions._

/** ops.Anisotropy invariants beyond the q338/q342 oracle rows: the
  * GramAggregator's buffer semantics against a brute-force
  * recomputation, its merge/partition-count independence (the property
  * the streaming fold relies on), and the ragged-input guard. */
class AnisotropySpec extends SparkSpec {
  import spark.implicits._

  private def brute(vs: Seq[Array[Long]]): (Long, Array[Long], Array[Long]) = {
    val d = vs.head.length
    val sums = Array.fill(d)(0L)
    val gram = Array.fill(d * (d + 1) / 2)(0L)
    vs.foreach { a =>
      var i = 0; var idx = 0
      while (i < d) {
        sums(i) += a(i)
        var j = i
        while (j < d) { gram(idx) += a(i) * a(j); idx += 1; j += 1 }
        i += 1
      }
    }
    (vs.length.toLong, sums, gram)
  }

  test("GramAggregator buffer == brute-force sums/Gram, any partitioning") {
    val vs = Seq(
      Array(3L, -1L, 4L), Array(1L, 5L, -9L),
      Array(2L, 6L, 5L), Array(-3L, 5L, 8L), Array(9L, 7L, 9L))
    val (n, sums, gram) = brute(vs)
    for (parts <- Seq(1, 2, 5)) {
      val buf = spark.createDataset(vs).repartition(parts)
        .select(new ops.Anisotropy.GramAggregator().toColumn.name("b"))
        .head()
      assert(buf(0) == 3L && buf(1) == n)
      assert(buf.slice(2, 5).sameElements(sums), s"parts=$parts sums")
      assert(buf.drop(5).sameElements(gram), s"parts=$parts gram")
    }
  }

  test("gramState rows == decoded buffer; state merge == concatenation") {
    val emb = queries.Tables(spark, sf, "embeddings")
    val whole = ops.Anisotropy.gramState(emb, col("embedding"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val parts = Seq(0, 1, 2).map(i => ops.Anisotropy.gramState(
      emb.filter(pmod(col("vec_id"), lit(3)) === i), col("embedding")))
    val merged = ops.Anisotropy.mergeGramState(parts)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("ragged embedding dims are a hard error, not silent misalignment") {
    val bad = Seq(Array(1L, 2L, 3L), Array(1L, 2L))
    val ex = intercept[Exception] {
      spark.createDataset(bad).coalesce(1)
        .select(new ops.Anisotropy.GramAggregator().toColumn.name("b"))
        .head()
    }
    assert(ex.getMessage.contains("ragged"))
  }

  test("empty state reads as an empty result, not a missing-key crash") {
    // gramState of an empty embeddings frame returns an empty state
    // DF; the read layer must short-circuit (a stream's first read can
    // land before any micro-batch) instead of throwing on rows((-1,-1))
    val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("emb",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)))))
    val state = ops.Anisotropy.gramState(empty, col("emb"))
    assert(state.count() == 0L)
    val read = ops.Anisotropy.anisotropyFromState(state)
    assert(read.columns.toSeq ==
      Seq("dim", "loading", "lambda1", "trace", "anisotropy"))
    assert(read.count() == 0L)
  }
}
