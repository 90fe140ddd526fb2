package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA whitening for embedding columns — the standard preprocessing in
  * front of IVF / PQ / SemDeDup (decorrelated, unit-variance dimensions
  * make k-means cells rounder and give every PQ subspace equal
  * information; cf. Jégou & Chum, "Negative evidences and co-occurrences
  * in image retrieval: the benefit of PCA and whitening", ECCV 2012).
  *
  * Fit is distributed and one-pass: per-dim means and the dim×dim
  * covariance tree-aggregate through mllib's `RowMatrix` (driver state is
  * dim², never n·dim), and the tiny symmetric eigenproblem solves on the
  * driver with breeze — the one place linear algebra belongs on the
  * driver, because its input no longer scales with the corpus. Apply is
  * pure Column math: k fused [[Similarity.dot]] projections against
  * broadcast literal component vectors — whole-stage codegen, no UDF, no
  * shuffle, so whitening 100 TB of vectors is a narrow map. */
object Whiten {

  /** Fitted whitening transform: y_j = (x − μ)·w_j / √(λ_j + eps). */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         eigenvalues: Array[Double], eps: Double) {
    require(components.length == eigenvalues.length)
    def k: Int = components.length
  }

  /** Fit the top-`k` whitening directions. */
  def fit(emb: DataFrame, k: Int, vecCol: String = "embedding",
          eps: Double = 1e-6): Model = {
    import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rows = emb.select(col(vecCol)).rdd.map { r =>
      OldVectors.dense(r.getSeq[Float](0).map(_.toDouble).toArray)
    }
    val mat = new RowMatrix(rows)
    val mean = mat.computeColumnSummaryStatistics().mean.toArray
    val cov = mat.computeCovariance()
    val dim = mean.length
    require(k >= 1 && k <= dim, s"whiten: k=$k out of range for dim=$dim")
    val bm = breeze.linalg.DenseMatrix.tabulate(dim, dim)((i, j) => cov(i, j))
    val es = breeze.linalg.eigSym(bm) // eigenvalues ascending
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i)).take(k)
    Model(
      mean,
      order.map(i => (0 until dim).map(j => es.eigenvectors(j, i)).toArray).toArray,
      order.map(es.eigenvalues(_)).toArray,
      eps)
  }

  /** Whitened projection column for one fitted model: an array<float> of
    * `k` entries, each a single fused dot against a literal component —
    * (x−μ)·w expands to x·w − μ·w with the constant μ·w folded at plan
    * time, so the hot loop is exactly k codegen'd dot products. */
  def projection(m: Model, vecCol: String = "embedding"): Column =
    array(m.components.zipWithIndex.map { case (w, j) =>
      val mdotw = m.mean.zip(w).map { case (a, b) => a * b }.sum
      ((Similarity.dot(col(vecCol), typedLit(w.map(_.toFloat))) - mdotw) /
        math.sqrt(m.eigenvalues(j) + m.eps)).cast("float")
    }: _*)

  /** Apply the transform, appending `outCol`. */
  def apply(emb: DataFrame, m: Model, vecCol: String = "embedding",
            outCol: String = "white"): DataFrame =
    emb.withColumn(outCol, projection(m, vecCol))
}
