package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and two scale paths —
  * random-hyperplane LSH bucketing and IVF (inverted-file) coarse
  * quantization — that turn the all-pairs crossJoin into a bucketed join.
  *
  * Dot products are `zip_with` + `aggregate` column expressions (codegen'd,
  * no UDF, vector never leaves Tungsten rows).
  */
object Similarity {

  /** Dot product of two float-array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector is all-zero (no NULLs). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Deterministic random hyperplanes: `planes` sign bits packed into a
    * long — the classic cosine-LSH signature (Charikar '02). Plane
    * components are seeded pseudo-randoms fixed at plan time. */
  def hyperplaneSig(vec: Column, planes: Int = 8, seed: Long = 7L): Column = {
    val rnd = new scala.util.Random(seed)
    val bits = (0 until planes).map { p =>
      // per-plane pseudo-random component for index i: hash(seed, p, i) → [-1,1]
      val a = rnd.nextLong()
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double") *
            (pmod(xxhash64(i, lit(a)), lit(2000001L)).cast("double") / 1000000.0 - 1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, per-query top-k via window. The right baseline — and at
    * cluster scale still the right plan when queries ≪ corpus, because the
    * corpus is scanned exactly once with no shuffle (broadcast join),
    * then one shuffle on query id for the top-k. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    qId: String = "q_id", qVec: String = "q_vec",
                    cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        round(cosine(col(qVec), col(cVec)), 6).as("cosine"))
    val w = Window.partitionBy(qId).orderBy(col("cosine").desc, col(cId))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: probe only corpus vectors whose
    * hyperplane signature matches the query's. Recall < 1 by construction;
    * multi-probe (flip one bit) raises it. At 100 TB the bucket join is a
    * shuffle on an 8-bit key instead of a full crossJoin. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             planes: Int = 8, multiProbe: Boolean = true,
             qId: String = "q_id", qVec: String = "q_vec",
             cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val cSig = corpus.withColumn("bucket", hyperplaneSig(col(cVec), planes))
    val qSig0 = queries.withColumn("bucket", hyperplaneSig(col(qVec), planes))
    val qSig = if (!multiProbe) qSig0 else {
      // probe own bucket + each 1-bit-flipped neighbour bucket
      val probes = array((lit(0L) +: (0 until planes).map(p => shiftleft(lit(1L), p))): _*)
      qSig0.withColumn("bucket", explode(transform(probes, m => col("bucket").bitwiseXOR(m))))
    }
    val scored = cSig.join(qSig, "bucket")
      .select(col(qId), col(cId), round(cosine(col(qVec), col(cVec)), 6).as("cosine"))
      .dropDuplicates(qId, cId)
    val w = Window.partitionBy(qId).orderBy(col("cosine").desc, col(cId))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF (inverted file) ANN: assign every corpus vector to its nearest of
    * `nlist` centroids (one broadcast join), then search only the
    * `nprobe` closest lists per query. Centroids here are sampled corpus
    * vectors (k-means init step) — good enough for a coarse quantizer and
    * fully deterministic. */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             nlist: Int = 16, nprobe: Int = 4,
             qId: String = "q_id", qVec: String = "q_vec",
             cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    // deterministic "centroids": nlist corpus vectors with the smallest ids
    val centroids = corpus.orderBy(col(cId)).limit(nlist)
      .select(col(cId).as("centroid_id"), col(cVec).as("centroid"))
    // assign corpus → nearest centroid (broadcast: nlist rows)
    val assigned = corpus.crossJoin(broadcast(centroids))
      .withColumn("cdist", cosine(col(cVec), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(cId).orderBy(col("cdist").desc, col("centroid_id"))))
      .filter(col("crank") === 1)
      .select(col(cId), col(cVec), col("centroid_id"))
    // per query: nprobe nearest centroids
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("qdist", cosine(col(qVec), col("centroid")))
      .withColumn("qrank", row_number().over(
        Window.partitionBy(qId).orderBy(col("qdist").desc, col("centroid_id"))))
      .filter(col("qrank") <= nprobe)
      .select(col(qId), col(qVec), col("centroid_id"))
    // search only the probed lists: shuffle on centroid_id, not all-pairs
    val scored = assigned.join(probed, "centroid_id")
      .select(col(qId), col(cId), round(cosine(col(qVec), col(cVec)), 6).as("cosine"))
    val w = Window.partitionBy(qId).orderBy(col("cosine").desc, col(cId))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
