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
  * The backtracking line search evaluates its halving ladder in LAZY
  * GEOMETRIC CHUNKS (1, 1, 2, 4, 4 trials per scoring pass): the
  * per-trial margin Σ_b round6(w_b − s·g_b/n) is one decimal column of a
  * shared pass over a broadcast (w, g) table, so an accepting iteration
  * is two cheap jobs and a k-halving search costs ≤ 5 jobs and ≤ 2k+2
  * trial columns — previously each halving re-ran a full scoring pass,
  * and a flat 12-wide fusion pays 12× when the first trial accepts.
  *
  * Documents whose text hashes to ZERO grams still count: their margin is
  * the bias alone, so they contribute sigmoid(bias) to the loss mean and
  * (sigmoid(bias) − y) to the bias gradient — the loss is normalized over
  * exactly the docs that feed the gradients.
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

  /** Margin + sigmoid for one weight snapshot: (doc_id, p) over docs WITH
    * features — callers left-join from the label frame and default absent
    * docs to sigmoid(bias). The decimal dot product makes p
    * partitioning-invariant. */
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

  /** Per-doc sigmoid probabilities of the candidate models w − s·g/n for
    * every trial step in `steps`, as ONE pinned (doc_id, y, p0…pk) frame:
    * the per-trial candidate weight round6(w_b − s·g_b/n) replicates
    * `candidate`'s driver arithmetic bit-for-bit from a broadcast
    * (bucket, w, g) table, each trial's margin is its own decimal column
    * of the same per-doc aggregation, and docs without features enter
    * through the labels left-join with margin = the trial's candidate
    * bias. The frame is nDocs × (2+k) doubles — pinned so the ACCEPTED
    * trial's column doubles as the next gradient's error input (the
    * margins of iteration i+1's model were already computed as iteration
    * i's winning trial; re-scoring them would be a wasted pass). With
    * `g = 0, steps = Seq(0.0)` this scores the CURRENT model. */
  private def trialProbs(featsOnly: DataFrame, labels: DataFrame,
                         model: Model, gw: Map[Int, Double], ge: Double,
                         steps: Seq[Double], nDocs: Double): DataFrame = {
    val spark = featsOnly.sparkSession
    import spark.implicits._
    import graft.rel.Checkpoint.PinOps
    val keys = (model.weights.keySet ++ gw.keySet).toSeq
    val wg = keys.map(b =>
      (b, model.weights.getOrElse(b, 0.0), gw.getOrElse(b, 0.0))).toDF("bucket", "w", "g")
    val candBias = steps.map(s => round6(model.bias - s * ge / nDocs))
    val termCols = steps.zipWithIndex.map { case (s, j) =>
      (round(coalesce(col("w"), lit(0.0)) -
          lit(s) * coalesce(col("g"), lit(0.0)) / lit(nDocs), 6) * col("x"))
        .cast(DecimalType(24, 12)).as(s"t$j")
    }
    val marginCols = steps.indices.map(j =>
      (sum(col(s"t$j")).cast("double") + lit(candBias(j))).as(s"m$j"))
    val margins = featsOnly.join(broadcast(wg), Seq("bucket"), "left")
      .select(col("doc_id") +: termCols: _*)
      .groupBy("doc_id")
      .agg(marginCols.head, marginCols.tail: _*)
    val pCols = steps.indices.map { j =>
      val m = coalesce(col(s"m$j"), lit(candBias(j)))
      (lit(1.0) / (exp(-m) + 1.0)).as(s"p$j")
    }
    labels.join(margins, Seq("doc_id"), "left")
      .select(col("doc_id") +: col("y") +: pCols: _*)
      .pin()
  }

  /** Mean log-losses of the trial columns of a [[trialProbs]] frame — a
    * tiny aggregation over the pinned per-doc probabilities. */
  private def lossesFrom(probs: DataFrame, k: Int, nDocs: Double): Seq[Double] = {
    val lossCols = (0 until k).map { j =>
      val p = col(s"p$j")
      sum(round(-(col("y") * log(greatest(p, lit(1e-12))) +
          (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(1e-12)))), 6)
        .cast(DecimalType(18, 6))).cast("double").as(s"l$j")
    }
    val row = probs.agg(lossCols.head, lossCols.tail: _*).collect()(0)
    (0 until k).map(j => round6(row.getDouble(j) / nDocs))
  }

  /** Train on `docs` with a 0/1 `labelCol`: full-batch gradient descent
    * with BACKTRACKING LINE SEARCH — each iteration evaluates the whole
    * halving ladder `step, step/2, …, step/2¹¹` in lazy geometric chunks
    * and accepts the first trial whose loss does not exceed the current loss,
    * so the returned loss sequence is non-increasing BY CONSTRUCTION (the
    * descent certificate is structural, not hoped-for) and training
    * remains fully deterministic. Steps that succeed grow the next trial
    * step back toward `lr`. Returns the model and the loss after each
    * accepted step. */
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
      labelCol.cast("double").as("y")).pin()
    val featsOnly = features(docs, buckets, idCol, textCol).pin()
    val nDocs = labels.count().toDouble

    // one synthetic bias row per doc (bucket −1, x = 1): the bias gradient
    // Σe falls out of the SAME per-bucket aggregation as the weight
    // gradients — one job per iteration instead of two. Sourced from
    // labels, so zero-gram docs feed the bias gradient too. Pinned: it is
    // scanned once per iteration and must not replay its build join.
    val featsBias = featsOnly.join(labels, "doc_id").unionByName(
      labels.select(col("doc_id"), lit(-1).as("bucket"), lit(1.0).as("x"),
        col("y"))).pin()

    var model = init.getOrElse(Model(0.0, Map.empty, buckets))
    // probs carries the CURRENT model's per-doc p in column `curP` — the
    // accepted trial of each iteration becomes the next one's scoring
    // pass for free
    var probs = trialProbs(featsOnly, labels, model, Map.empty, 0.0,
      Seq(0.0), nDocs)
    var curP = "p0"
    var curLoss = lossesFrom(probs, 1, nDocs).head
    var step = lr
    val losses = Seq.newBuilder[Double]
    var i = 0
    while (i < iters) {
      // gradient at the CURRENT model: e reads straight off the pinned
      // probs frame (zero scoring work), then one join onto the pinned
      // feature+bias rows and one B-sized map-side-combinable agg
      val err = probs.select(col("doc_id"),
        round(col(curP) - col("y"), 6).as("e"))
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

      // lazy GEOMETRIC backtrack: trial columns cost real per-row work
      // (a decimal margin sum each), so evaluating all 12 at once pays
      // 12x even when the first accepts, while one job per halving pays
      // a scheduling round-trip each. Chunks of 1,1,2,4,4 halvings give
      // the best of both: an accepting iteration is one scoring pass, a
      // k-halving search costs <= 5 passes and <= 2k+2 trial columns.
      val trialSteps = Seq.iterate(step, 12)(_ / 2.0)
      var accepted = -1   // ladder index of the accepted trial
      var acceptedInChunk = -1 // its column index within the winning chunk
      var acceptedLoss = 0.0
      var tried = 0
      var chunkProbs: DataFrame = null
      val chunkIt = Seq(1, 1, 2, 4, 4).iterator
      while (accepted < 0 && chunkIt.hasNext) {
        val chunk = chunkIt.next()
        if (chunkProbs != null) chunkProbs.unpin() // superseded reject
        val steps = trialSteps.slice(tried, tried + chunk)
        chunkProbs = trialProbs(featsOnly, labels, model, gb, ge, steps, nDocs)
        val ls = lossesFrom(chunkProbs, steps.size, nDocs)
        ls.zipWithIndex.find(_._1 <= curLoss).foreach { case (l, j) =>
          accepted = tried + j; acceptedInChunk = j; acceptedLoss = l
        }
        tried += chunk
      }
      if (accepted >= 0) {
        val s = trialSteps(accepted)
        model = candidate(s)
        curLoss = acceptedLoss
        step = math.min(s * 2.0, lr) // re-grow toward the ceiling
        probs.unpin()
        probs = chunkProbs // accepted trial's p column scores next round
        curP = s"p$acceptedInChunk"
      } else {
        if (chunkProbs != null) chunkProbs.unpin()
        i = iters // gradient no longer descends — stop
      }
      losses += curLoss
      i += 1
    }
    probs.unpin(); featsBias.unpin(); featsOnly.unpin(); labels.unpin()
    (model, losses.result())
  }

  /** Score docs with a trained model: (doc_id, p, pred). Zero-gram docs
    * score at sigmoid(bias) — every input doc gets a row. */
  def predict(docs: DataFrame, model: Model, threshold: Double = 0.5,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pDef = lit(1.0) / (exp(-lit(model.bias)) + 1.0)
    docs.select(col(idCol).as("doc_id"))
      .join(scores(features(docs, model.buckets, idCol, textCol), model),
        Seq("doc_id"), "left")
      .select(col("doc_id"), round(coalesce(col("p"), pDef), 6).as("p"),
        (coalesce(col("p"), pDef) >= threshold).as("pred"))
  }
}
