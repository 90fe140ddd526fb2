package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.rel.Checkpoint.PinOps

/** Coreset / diversity selection over an embedding column: greedy k-center
  * (Gonzalez' farthest-point traversal) in cosine distance — the classic
  * "pick k maximally-spread exemplars" primitive behind diversity-aware
  * data curation (select representatives per cluster, seed diverse
  * eval sets, init IVF/k-means with well-separated centroids).
  *
  * Scale shape: the ONLY distributed state is one running double per row —
  * "distance to the nearest selected center so far" — updated by a narrow
  * codegen'd map against the latest center (broadcast as a literal), and
  * the ONLY per-round job is a distributed top-1 argmax (map-side top-1 per
  * partition, 32 rows to the driver). k rounds → k narrow passes + k
  * argmaxes; no shuffle of the points, no pairwise matrix, nothing
  * driver-side beyond k vectors. At 100 TB with k in the hundreds this is
  * k scans — the textbook trade; for k beyond that, compose with
  * [[Similarity.ivfCentroids]] and run k-center over cluster centroids.
  *
  * Guarantee: greedy k-center is a 2-approximation to the optimal covering
  * radius, and its run has checkable invariants ([[certificate]]):
  * selection distances are non-increasing, and the selected points are
  * pairwise separated by at least the final covering radius.
  */
object Coreset {

  /** One selected center: selection order (1-based), id, its distance to
    * the previously-selected set at selection time (0 for the seed). */
  final case class Center(rank: Int, id: Long, dist: Double, vec: Array[Float])

  private def cosDist(dotAB: Column, na: Column, nb: Column): Column =
    lit(1.0) - Similarity.cosinePre(dotAB, na, nb)

  /** Distance of `vec` (with precomputed norm `n`) to a literal center. */
  private def distToLit(vec: Column, n: Column, center: Array[Float]): Column = {
    val c = typedlit(center.toSeq)
    val cn = math.sqrt(center.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    cosDist(Similarity.dot(vec, c), n, lit(cn))
  }

  /** Greedy k-center. Seeds at the smallest id (deterministic), then k−1
    * rounds of farthest-point selection; ties broken by ascending id.
    * Returns the centers in selection order plus the covering radius (max
    * over all points of distance-to-selected after the last round). */
  def kCenter(points0: DataFrame, idCol: String, vecCol: String,
              k: Int): (Seq[Center], Double) = {
    require(k >= 1, "kCenter: k must be >= 1")
    val base = points0
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        Similarity.norm(col(vecCol)).as("n"))
      .where(col("n") > 0.0)

    val seedRow = base.orderBy(asc("id")).limit(1).collect()
    require(seedRow.nonEmpty, "kCenter: no non-zero vectors")
    def vecOf(r: Row): Array[Float] =
      r.getAs[scala.collection.Seq[Float]]("vec").toArray
    val seed = Center(1, seedRow.head.getAs[Long]("id"), 0.0, vecOf(seedRow.head))

    var centers = Vector(seed)
    var pts = base
      .withColumn("md", distToLit(col("vec"), col("n"), seed.vec))
      .localCheckpoint(true)
    var round = 2
    while (round <= k) {
      val far = pts.orderBy(desc("md"), asc("id")).limit(1).collect().head
      val c = Center(round, far.getAs[Long]("id"), far.getAs[Double]("md"),
        vecOf(far))
      centers :+= c
      val prev = pts
      pts = pts
        .withColumn("md", least(col("md"), distToLit(col("vec"), col("n"), c.vec)))
        .localCheckpoint(true)
      // the new checkpoint has materialized (eager) — release the
      // superseded round's blocks now instead of pinning k copies of the
      // per-point state until the ContextCleaner notices (unpin releases
      // the UNDERLYING checkpointed RDD; Dataset.unpersist is a no-op)
      prev.unpin()
      round += 1
    }
    val radius = pts.agg(max(col("md"))).collect().head.getDouble(0)
    pts.unpin()
    (centers, radius)
  }

  /** Falsifiable run certificate, computed with the SAME distance
    * arithmetic in a bounded (k+1)² Spark job:
    *
    *   - `monotone_ok`: selection distances never increase
    *     (d₂ ≥ d₃ ≥ … ≥ d_k ≥ radius) — breaks if the argmax or the
    *     running-min update is wrong;
    *   - `sep_ok`: every pair among {selected} ∪ {final farthest point} is
    *     at least `radius` apart (pairwise min δ ≥ radius − ε) — the
    *     pigeonhole witness that also lower-bounds the OPTIMAL radius by
    *     δ/2, certifying the 2-approximation.
    */
  def certificate(s: SparkSession, centers: Seq[Center], radius: Double,
                  points: DataFrame, idCol: String, vecCol: String,
                  eps: Double = 1e-9): (Boolean, Boolean) = {
    val monotone = centers.drop(1).map(_.dist)
      .sliding(2).forall(w => w.size < 2 || w(0) >= w(1) - eps) &&
      (centers.size < 2 || centers.last.dist >= radius - eps)

    // final farthest point = the (k+1)-th would-be selection
    val ids = centers.map(_.id)
    val base = points
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        Similarity.norm(col(vecCol)).as("n"))
      .where(col("n") > 0.0)
    val md = centers.map(c => distToLit(col("vec"), col("n"), c.vec))
      .reduce(least(_, _))
    val witness = base.where(!col("id").isInCollection(ids))
      .withColumn("md", md).orderBy(desc("md"), asc("id")).limit(1)
    val group = base.where(col("id").isInCollection(ids)).unionByName(
      witness.select(col("id"), col("vec"), col("n")))

    val a = group.select(col("id").as("ia"), col("vec").as("va"), col("n").as("na"))
    val b = group.select(col("id").as("ib"), col("vec").as("vb"), col("n").as("nb"))
    // (k+1)² rows — a bounded certificate, not a data-scale cross join
    val delta = a.crossJoin(b).where(col("ia") < col("ib"))
      .select(cosDist(Similarity.dot(col("va"), col("vb")), col("na"), col("nb"))
        .as("d"))
      .agg(min(col("d"))).collect().head.getDouble(0)
    (monotone, delta >= radius - eps)
  }
}
