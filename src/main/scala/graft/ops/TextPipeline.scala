package graft.ops

import java.util.zip.Deflater

import org.apache.spark.ml.feature.{NGram, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** The generalized M1-family text chain (SURVEY §7.4 "text analysis:
  * M1-M5 generalized — all built-in ml.feature"): regex tokenize →
  * stopword removal → word n-grams. All three are stateless transformers
  * (pure projections — no fit pass, no shuffle). */
object TextPipeline {

  /** tokens → filtered tokens → n-grams, as added columns
    * (`toks`, `toks_clean`, `ngrams`). */
  def tokensAndNGrams(docs: DataFrame, textCol: String = "text", n: Int = 3,
      stopWords: Array[String] = StopWordsRemover.loadDefaultStopWords("english")): DataFrame = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("toks")
      .setPattern("\\s+").setToLowercase(true)
    val stop = new StopWordsRemover()
      .setInputCol("toks").setOutputCol("toks_clean")
      .setStopWords(stopWords)
    val ngram = new NGram().setN(n).setInputCol("toks").setOutputCol("ngrams")
    ngram.transform(stop.transform(tok.transform(docs)))
  }

  /** Deflate compression ratio of the text (compressed/raw bytes) — a
    * standard LLM-data quality signal: highly repetitive or templated
    * documents compress far below prose (ratio << 1) and get filtered
    * before training. Deterministic (fixed level, no dictionary), but
    * zlib output is not SQL-expressible -> rows-only at the driver,
    * behavior pinned in OpsSpec. */
  val compressionRatio: Column => Column = {
    val f = udf { (text: String) =>
      if (text == null || text.isEmpty) 1.0
      else {
        val raw = text.getBytes("UTF-8")
        val d = new Deflater(Deflater.BEST_SPEED, false)
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length + 64)
        var n = 0
        while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
        d.end()
        math.round(n.toDouble / raw.length * 1e6) / 1e6
      }
    }
    c => f(c)
  }
}
