package graft.ops

import org.apache.spark.ml.feature.{NGram, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.DataFrame

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
}
