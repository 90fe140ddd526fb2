package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
/** Hashed-n-gram logistic-regression document classifier — the
  * "fasttext-style quality filter" primitive (GPT-3/LLaMA-lineage
  * pipelines score every crawl page with exactly this shape: bag of
  * hashed word n-grams → linear model → sigmoid → keep/drop). Training
  * is full-batch gradient descent run AS SPARK JOBS:
  *
  *   once per run: ONE corpus pass hashes each doc's unigram+bigram
  *   PRESENCE set ([[Sampling.hashBucket]]) into a sorted bucket ARRAY,
  *   pinned as an nDocs-row (doc_id, y, bs) frame;
  *
  *   per iteration: exactly TWO narrow jobs over that frame. The
  *   gradient job scores every doc by traversing its bucket array
  *   against the model's ×10⁶ fixed-point weight vector (the codegen'd
  *   [[graft.functions.BucketDotSums]] — no join, no corpus-sized
  *   shuffle), explodes buckets onto the 6dp error, and reduces to the
  *   B-sized gradient with a map-side-combinable long sum. The
  *   line-search job evaluates the ENTIRE 12-step backtracking ladder:
  *   one BucketDotSums call dots each doc against all candidate models
  *   w − s·g/n at once (an extra candidate costs one more in-row array
  *   traversal, not a pass), and a single aggregate returns every trial
  *   loss — the driver accepts the first non-increasing one.
  *
  * Driver state is the model only (B doubles — bounded, like the k-means
  * codebooks in [[Similarity]]).
  *
  * Documents whose text hashes to ZERO grams still count: their bucket
  * array is empty, so their margin is the bias alone — they contribute
  * sigmoid(bias) to the loss mean and (sigmoid(bias) − y) to the bias
  * gradient, and the loss is normalized over exactly the docs that feed
  * the gradients.
  *
  * Determinism: weights are 6dp-quantized after every update and every
  * dot-product/gradient/loss sum adds ×10⁶-scaled 6dp terms as exact
  * LONG integers (associative, so partitioning/order-invariant — and the
  * primitive-sum codegen fast path, where the earlier decimal sums
  * computed the identical totals several times slower); margins, losses,
  * and predictions are therefore order-free and `trainLogistic` on a
  * repartitioned corpus yields the SAME model. */
object Classifier {

  final case class Model(bias: Double, weights: Map[Int, Double], buckets: Int)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Each doc's sorted distinct hashed-feature bucket set as an IN-ROW
    * array<int> column — hashed-BoW PRESENCE features (the hashing-trick
    * standard for linear text classifiers: count scaling only shrinks
    * gradients on short docs, presence keeps every feature O(1) and the
    * margin well-conditioned). Entirely narrow: tokenize → unigram+bigram
    * grams → bucket hash → distinct → sort happen per row, so building
    * the feature frame costs ZERO shuffles (the previous exploded
    * (doc, bucket) layout paid a distinct shuffle plus a re-group, and
    * then a join + corpus-wide re-shuffle on every scoring pass).
    * Zero-gram docs get an empty array. */
  private[pipeline] def bucketSet(buckets: Int, textCol: String): Column = {
    val ts = filter(split(lower(trim(col(textCol))), "[^a-z0-9]+"),
      t => length(t) > 0)
    val grams = concat(ts,
      zip_with(
        slice(ts, lit(1), greatest(size(ts) - 1, lit(0))),
        slice(ts, lit(2), greatest(size(ts) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)))
    array_sort(array_distinct(transform(grams,
      g => Sampling.hashBucketMemo(g, buckets))))
  }

  /** A model's dense micro-unit weight vector: w6[b] = round6(w_b)·10⁶ as
    * an exact long (absent buckets are 0). The task-side representation
    * [[graft.functions.BucketDotSums]] dots each doc's bucket set against. */
  private def toW6(m: Model): Array[Long] = {
    val a = new Array[Long](m.buckets)
    m.weights.foreach { case (b, w) => a(b) = math.round(w * 1e6) }
    a
  }

  /** Mean log-loss of every candidate model in ONE narrow job over the
    * pinned (doc_id, y, bs) frame: a single [[BucketDotSums]] traversal
    * of each doc's bucket array yields all k candidate margins as exact
    * micro-unit longs, the per-trial sigmoid/log-loss are plain columns,
    * and one aggregate collects k losses. Zero-gram docs have empty
    * arrays, so their margin is the candidate bias — they enter every
    * loss at sigmoid(bias). */
  private def lossesOf(feats: DataFrame, cands: Seq[Model],
                       nDocs: Double): Seq[Double] = {
    import graft.functions.BucketDotSums
    val pCols = cands.zipWithIndex.map { case (c, j) =>
      val m = element_at(col("ms"), j + 1).cast("double") / 1e6 + lit(c.bias)
      (lit(1.0) / (exp(-m) + 1.0)).as(s"p$j")
    }
    val lossCols = cands.indices.map { j =>
      val p = col(s"p$j")
      sum(round(round(-(col("y") * log(greatest(p, lit(1e-12))) +
          (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(1e-12)))), 6) * 1e6)
        .cast("long")).cast("double").as(s"l$j")
    }
    // tracked broadcast: the ladder is k dense vectors (~k·B·8 bytes);
    // the job materializes right here, so destroy the blocks on exit
    // instead of parking them for the ContextCleaner
    val (ms, bc) = BucketDotSums.tracked(feats.sparkSession, col("bs"),
      cands.map(toW6).toArray)
    val row =
      try feats
        .select(col("y"), ms.as("ms"))
        .select(col("y") +: pCols: _*)
        .agg(lossCols.head, lossCols.tail: _*)
        .collect()(0)
      finally bc.destroy()
    cands.indices.map(j => round6(row.getDouble(j) / 1e6 / nDocs))
  }

  /** Full-batch gradient at `model` in ONE narrow job: the same
    * bucket-array traversal scores each doc (margin → p → 6dp error e6),
    * then [[graft.functions.BucketErrSumAgg]] scatter-adds e6 into a
    * dense long[B+1] partition accumulator — no explode, no
    * corpus-sized shuffle; the only moving data is numPartitions dense
    * vectors. Slot B is the bias gradient: every doc lands there, so
    * zero-gram docs drive the bias at sigmoid(bias). The returned map
    * keys the bias as −1 and keeps only touched buckets. */
  private def gradient(feats: DataFrame, model: Model,
                       nDocs: Double): Map[Int, Double] = {
    import graft.functions.{BucketDotSums, BucketErrSumAgg}
    val b = model.buckets
    val (ms, bc) = BucketDotSums.tracked(feats.sparkSession, col("bs"),
      Array(toW6(model)))
    val m = element_at(ms, 1).cast("double") / 1e6 + lit(model.bias)
    val p = lit(1.0) / (exp(-m) + 1.0)
    val e6 = round(round(p - col("y"), 6) * 1e6).cast("long")
    val g6 =
      try feats.select(col("bs"), e6.as("e6"))
        .agg(BucketErrSumAgg(col("bs"), col("e6"), b).as("g6"))
        .collect()(0).getSeq[Long](0)
      finally bc.destroy()
    val touched = (0 until b).iterator.filter(g6(_) != 0L)
      .map(bk => bk -> g6(bk) / 1e6).toMap
    touched + (-1 -> g6(b) / 1e6)
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
    import graft.rel.Checkpoint.PinOps
    val feats = prepare(docs, labelCol, buckets, idCol, textCol)
    try trainPrepared(feats, buckets, iters, lr, init)
    finally feats.unpin()
  }

  /** Build (and pin) the reusable (doc_id, y, bs) training frame — ONE
    * shuffle-free corpus pass: grams → buckets → each doc's sorted
    * distinct bucket ARRAY, computed IN-ROW next to the label (zero-gram
    * docs get an empty array). Reuse it across [[trainPrepared]] warm
    * restarts and [[predictOn]] sweeps; the caller unpins. */
  def prepare(docs: DataFrame, labelCol: Column, buckets: Int = 512,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.rel.Checkpoint.PinOps
    require(buckets > 0, s"prepare: buckets=$buckets")
    docs.select(col(idCol).as("doc_id"),
      labelCol.cast("double").as("y"),
      bucketSet(buckets, textCol).as("bs")).pin()
  }

  /** [[trainLogistic]] on an already-[[prepare]]d frame: every iteration
    * is a narrow scan of the pinned nDocs rows — margins come from
    * in-row array traversal (BucketDotSums), never from re-joining or
    * re-shuffling an exploded (doc, bucket) frame. Does NOT unpin. */
  def trainPrepared(feats: DataFrame, buckets: Int,
                    iters: Int = 20, lr: Double = 16.0,
                    init: Option[Model] = None):
      (Model, Seq[Double]) = {
    require(iters >= 1 && buckets > 0, s"trainLogistic: iters=$iters buckets=$buckets")
    // the line-search ladder builds 13 DENSE micro-unit vectors in the
    // driver and broadcasts them (13·B longs ≈ 218 MB at the 2^21
    // ceiling); fasttext's standard 2M-bucket models fit. Beyond it,
    // evaluate the ladder sparsely instead of densifying.
    require(buckets <= (1 << 21),
      s"trainLogistic: buckets=$buckets exceeds 2^21 — densifying the " +
        "candidate ladder would dominate driver memory; use a sparse ladder")
    require(init.forall(_.buckets == buckets),
      "trainLogistic: warm-start model has a different bucket count")
    val nDocs = feats.count().toDouble

    var model = init.getOrElse(Model(0.0, Map.empty, buckets))
    var curLoss = lossesOf(feats, Seq(model), nDocs).head
    var step = lr
    val losses = Seq.newBuilder[Double]
    var i = 0
    while (i < iters) {
      val gAll = gradient(feats, model, nDocs)
      val ge = gAll.getOrElse(-1, 0.0)
      val gb = gAll - (-1)

      def candidate(s: Double): Model = Model(
        round6(model.bias - s * ge / nDocs),
        (model.weights.keySet ++ gb.keySet).map { b =>
          b -> round6(model.weights.getOrElse(b, 0.0) -
            s * gb.getOrElse(b, 0.0) / nDocs)
        }.toMap, buckets)

      // the WHOLE halving ladder in one job: with in-row array margins a
      // trial costs one extra traversal of each doc's bucket array (~µs),
      // so 12 candidates in a single scan beat any chunked scheme whose
      // every chunk pays a full job round-trip
      val trialSteps = Seq.iterate(step, 12)(_ / 2.0)
      val cands = trialSteps.map(candidate)
      val ls = lossesOf(feats, cands, nDocs)
      ls.zipWithIndex.find(_._1 <= curLoss) match {
        case Some((l, j)) =>
          model = cands(j)
          curLoss = l
          step = math.min(trialSteps(j) * 2.0, lr) // re-grow toward the ceiling
        case None =>
          i = iters // gradient no longer descends — stop
      }
      losses += curLoss
      i += 1
    }
    (model, losses.result())
  }

  /** [[predict]] over an already-[[prepare]]d frame: (doc_id, p, pred)
    * from one narrow scan of the pinned rows — no re-tokenization. */
  def predictOn(feats: DataFrame, model: Model,
                threshold: Double = 0.5): DataFrame = {
    import graft.functions.BucketDotSums
    val m = element_at(
        BucketDotSums(feats.sparkSession, col("bs"), Array(toW6(model))), 1)
      .cast("double") / 1e6 + lit(model.bias)
    val p = lit(1.0) / (exp(-m) + 1.0)
    feats.select(col("doc_id"), round(p, 6).as("p"),
      (p >= threshold).as("pred"))
  }

  /** Training accuracy of `model` over a [[prepare]]d frame in ONE narrow
    * scan: the label `y` lives in the same row as the bucket set, so
    * hit-counting needs no join — the previous predictOn ⋈ feats shape
    * paid a shuffle join of the pinned frame against itself (r18: the
    * join was an identity self-join on doc_id). Same per-doc pred/label
    * pairs, same unrounded threshold compare as [[predictOn]]. */
  def accuracyOn(feats: DataFrame, model: Model,
                 threshold: Double = 0.5): Double = {
    import graft.functions.BucketDotSums
    val (ms, bc) = BucketDotSums.tracked(feats.sparkSession, col("bs"),
      Array(toW6(model)))
    val m = element_at(ms, 1).cast("double") / 1e6 + lit(model.bias)
    val p = lit(1.0) / (exp(-m) + 1.0)
    val row =
      try feats.select((p >= threshold).as("pred"), col("y"))
        .agg(sum(when(col("pred") === (col("y") >= 0.5), 1L).otherwise(0L))
          .as("hit"), count(lit(1)).as("n"))
        .collect()(0)
      finally bc.destroy()
    row.getLong(0).toDouble / math.max(row.getLong(1), 1L)
  }

  /** Score docs with a trained model: (doc_id, p, pred) — one narrow
    * pass (in-row bucket set → fixed-point dot → sigmoid), no join, no
    * shuffle. Zero-gram docs have an empty bucket set, so they score at
    * sigmoid(bias); every input doc gets a row. */
  def predict(docs: DataFrame, model: Model, threshold: Double = 0.5,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.BucketDotSums
    val m = element_at(
        BucketDotSums(docs.sparkSession, bucketSet(model.buckets, textCol),
          Array(toW6(model))), 1)
      .cast("double") / 1e6 + lit(model.bias)
    val p = lit(1.0) / (exp(-m) + 1.0)
    docs.select(col(idCol).as("doc_id"), round(p, 6).as("p"),
      (p >= threshold).as("pred"))
  }
}
