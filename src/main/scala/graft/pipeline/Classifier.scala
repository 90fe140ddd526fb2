package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Hashed-n-gram logistic-regression document classifier — the
  * "fasttext-style quality filter" primitive (GPT-3/LLaMA-lineage
  * pipelines score every crawl page with exactly this shape: bag of
  * hashed word n-grams → linear model → sigmoid → keep/drop). Training
  * is full-batch gradient descent run AS SPARK JOBS:
  *
  *   per iteration: broadcast the B-bucket weight vector, one narrow join
  *   scores every doc (margin = Σ w_b·x_b), one map-side-combinable
  *   aggregation produces the B-sized gradient, the driver updates w.
  *
  * Driver state is the model only (B doubles — bounded, like the k-means
  * codebooks in [[Similarity]]); per-doc features are hashed
  * unigram+bigram PRESENCE indicators ([[Sampling.hashBucket]]), computed
  * once and reused across iterations via one pinned frame.
  *
  * Determinism: weights are 6dp-quantized after every update and all
  * dot-product/gradient sums run in DECIMAL over 6dp-rounded terms, so
  * margins, losses, and predictions are partitioning-invariant —
  * `trainLogistic` on a repartitioned corpus yields the SAME model. */
object Classifier {

  final case class Model(bias: Double, weights: Map[Int, Double], buckets: Int)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** (doc_id, bucket, x) with x = 1.0 — hashed-BoW PRESENCE features (the
    * hashing-trick standard for linear text classifiers: count scaling
    * only shrinks gradients on short docs, presence keeps every feature
    * O(1) and the margin well-conditioned). One distinct per doc. */
  private[pipeline] def features(docs: DataFrame, buckets: Int,
                                 idCol: String, textCol: String): DataFrame = {
    val ts = filter(split(lower(trim(col(textCol))), "[^a-z0-9]+"),
      t => length(t) > 0)
    docs.select(col(idCol).as("doc_id"), ts.as("__t"))
      .select(col("doc_id"), explode(concat(col("__t"),
        zip_with(
          slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
          slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b)))).as("g"))
      .select(col("doc_id"), Sampling.hashBucket(col("g"), buckets).as("bucket"))
      .distinct()
      .withColumn("x", lit(1.0))
  }

  /** Margin + sigmoid for one weight snapshot: (doc_id, p). The decimal
    * dot product makes p partitioning-invariant. */
  private def scores(feats: DataFrame, model: Model): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val w = model.weights.toSeq.toDF("bucket", "w")
    feats.join(broadcast(w), Seq("bucket"), "left")
      .select(col("doc_id"),
        (round(coalesce(col("w"), lit(0.0)), 6) * col("x"))
          .cast(DecimalType(24, 12)).as("t"))
      .groupBy("doc_id")
      .agg((sum(col("t")).cast("double") + model.bias).as("m"))
      .select(col("doc_id"), (lit(1.0) / (exp(-col("m")) + 1.0)).as("p"))
  }

  /** Mean log-loss of one weight snapshot (decimal-summed 6dp terms). */
  private def lossOf(feats: DataFrame, labels: DataFrame, model: Model,
                     nDocs: Double): Double = {
    val l = scores(feats, model).join(labels, "doc_id")
      .select(round(-(col("y") * log(greatest(col("p"), lit(1e-12))) +
        (lit(1.0) - col("y")) * log(greatest(lit(1.0) - col("p"), lit(1e-12)))), 6)
        .as("l"))
      .agg(sum(col("l").cast(DecimalType(18, 6))).cast("double"))
      .collect()(0).getDouble(0)
    round6(l / nDocs)
  }

  /** Train on `docs` with a 0/1 `labelCol`: full-batch gradient descent
    * with BACKTRACKING LINE SEARCH — each iteration halves the step until
    * the candidate's loss does not exceed the current loss, so the
    * returned loss sequence is non-increasing BY CONSTRUCTION (the
    * descent certificate is structural, not hoped-for) and training
    * remains fully deterministic. Each backtrack costs one extra scoring
    * pass; steps that succeed grow the next trial step back toward `lr`.
    * Returns the model and the loss after each accepted step. */
  def trainLogistic(docs: DataFrame, labelCol: Column, buckets: Int = 512,
                    iters: Int = 20, lr: Double = 16.0,
                    idCol: String = "doc_id", textCol: String = "text",
                    init: Option[Model] = None):
      (Model, Seq[Double]) = {
    require(iters >= 1 && buckets > 0, s"trainLogistic: iters=$iters buckets=$buckets")
    require(init.forall(_.buckets == buckets),
      "trainLogistic: warm-start model has a different bucket count")
    import graft.rel.Checkpoint.PinOps
    val labels = docs.select(col(idCol).as("doc_id"),
      labelCol.cast("double").as("y"))
    val featsOnly = features(docs, buckets, idCol, textCol).pin()
    val feats = featsOnly.join(labels, "doc_id")
    val nDocs = labels.count().toDouble

    // one synthetic bias row per doc (bucket −1, x = 1): the bias gradient
    // Σe falls out of the SAME per-bucket aggregation as the weight
    // gradients — one job per iteration instead of two
    val featsBias = feats.unionByName(
      labels.select(col("doc_id"), lit(-1).as("bucket"), lit(1.0).as("x"),
        col("y")))

    var model = init.getOrElse(Model(0.0, Map.empty, buckets))
    var curLoss = lossOf(featsOnly, labels, model, nDocs)
    var step = lr
    val losses = Seq.newBuilder[Double]
    var i = 0
    while (i < iters) {
      // gradient at the CURRENT model: one scoring pass + one B-sized agg
      val err = scores(featsOnly, model).join(labels, "doc_id")
        .select(col("doc_id"), round(col("p") - col("y"), 6).as("e"))
      val gAll = featsBias.join(err, "doc_id")
        .groupBy("bucket")
        .agg(sum((col("e") * col("x")).cast(DecimalType(24, 12)))
          .cast("double").as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val ge = gAll.getOrElse(-1, 0.0)
      val gb = gAll - (-1)

      def candidate(s: Double): Model = Model(
        round6(model.bias - s * ge / nDocs),
        (model.weights.keySet ++ gb.keySet).map { b =>
          b -> round6(model.weights.getOrElse(b, 0.0) -
            s * gb.getOrElse(b, 0.0) / nDocs)
        }.toMap, buckets)

      // backtrack: halve until the loss does not increase (≤ 12 trials)
      var tries = 0
      var accepted = false
      while (!accepted && tries < 12) {
        val cand = candidate(step)
        val l = lossOf(featsOnly, labels, cand, nDocs)
        if (l <= curLoss) {
          model = cand; curLoss = l; accepted = true
          step = math.min(step * 2.0, lr) // re-grow toward the ceiling
        } else { step = step / 2.0; tries += 1 }
      }
      losses += curLoss
      if (!accepted) i = iters // gradient no longer descends — stop
      i += 1
    }
    featsOnly.unpin()
    (model, losses.result())
  }

  /** Score docs with a trained model: (doc_id, p, pred). */
  def predict(docs: DataFrame, model: Model, threshold: Double = 0.5,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scores(features(docs, model.buckets, idCol, textCol), model)
      .select(col("doc_id"), round(col("p"), 6).as("p"),
        (col("p") >= threshold).as("pred"))
}
