package graft.ext

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.CountVectorizer
import org.apache.spark.ml.linalg.{SparseVector, Vector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trains the fastText-style document quality classifier whose
  * INFERENCE side is [[TextAnalysis.linearScore]] (the CCNet/GPT-3
  * "looks like the reference corpus" gate): logistic regression over
  * mean bag-of-token features, exported as a plain (token, weight)
  * DataFrame + bias so scoring at 100 TB stays a broadcast join — no
  * model object, no MLlib dependency, no UDF in the hot path.
  *
  * Training runs on the LABELED set (positives like Wikipedia,
  * negatives sampled from the raw crawl) — millions of rows, not the
  * corpus — so the per-row vector UDF here is off the big-data path by
  * construction. The feature for token t is cnt_d(t) / n_toks(d),
  * matching linearScore's mean-of-weights formulation exactly: the
  * trained margin  intercept + Σ coef·x  IS  bias + Σ w/n_toks, so
  * exported weights replay bit-for-bit through the broadcast scorer.
  */
object QualityClassifier {

  /** Exported model: `weights` is (token: string, weight: double) —
    * feed straight into [[TextAnalysis.linearScore]] with `bias`.
    */
  final case class Model(weights: DataFrame, bias: Double)

  /** Fit on positive/negative example frames. `vocabSize` caps the
    * CountVectorizer vocabulary (most-frequent-first, like the
    * inference path's broadcast table); `regParam` is L2 strength.
    * Tokens outside the vocabulary still count toward n_toks (exactly
    * as linearScore's denominator does), they just carry no weight.
    */
  def train(pos: DataFrame, neg: DataFrame, textCol: String = "text",
            vocabSize: Int = 65536, regParam: Double = 0.0,
            maxIter: Int = 100): Model = {
    require(vocabSize > 0, s"train: vocabSize must be positive, got $vocabSize")
    val labeled = pos.select(col(textCol).as("__text__"), lit(1.0).as("label"))
      .unionByName(neg.select(col(textCol).as("__text__"), lit(0.0).as("label")))
    val toks = labeled
      .withColumn("__toks__", TextDedup.tokens(col("__text__")))
      .filter(size(col("__toks__")) > 0)
    val cv = new CountVectorizer()
      .setInputCol("__toks__").setOutputCol("__tf__")
      .setVocabSize(vocabSize)
      .fit(toks)
    val meanScale = udf((v: Vector, n: Int) => {
      val s = v.toSparse
      new SparseVector(s.size, s.indices, s.values.map(_ / n)): Vector
    })
    val featured = cv.transform(toks)
      .withColumn("features",
        meanScale(col("__tf__"), size(col("__toks__"))))
      .select("features", "label")
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setFitIntercept(true)
      .fit(featured)
    val spark = pos.sparkSession
    import spark.implicits._
    val coef = lr.coefficients
    val weights = cv.vocabulary.toIndexedSeq.zipWithIndex
      .map { case (t, i) => (t, coef(i)) }
      .toDF("token", "weight")
    Model(weights, lr.intercept)
  }

  /** Convenience: train on labeled frames, score a target corpus with
    * the broadcast inference path, one call.
    */
  def trainAndScore(pos: DataFrame, neg: DataFrame, target: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    vocabSize: Int = 65536, regParam: Double = 0.0,
                    threshold: Double = 0.5): DataFrame = {
    val m = train(pos, neg, textCol, vocabSize, regParam)
    TextAnalysis.linearScore(target, m.weights, idCol, textCol, m.bias, threshold)
  }
}
