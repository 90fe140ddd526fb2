package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** One-off tuning probe: PQ recall vs brute force per Lloyd-iteration
  * count, at a given SF dir — picks the cheapest training that keeps the
  * q_knn_pq_check contract's ≥1.8× slack. Not part of the driver surface. */
object PqTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceKnn(q, emb, k = 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (iters <- Seq(1, 2); of <- Seq(8, 16, 32)) {
      val t0 = System.nanoTime()
      val pq = Similarity.pqKnn(q, emb, k = 10, lloydIters = iters, overFetch = of)
        .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val perQ = (0L until 5L).map(i =>
        pq.count(p => p._1 == i && brute.contains(p)) / 10.0)
      println(f"iters=$iters of=$of sec=$sec%.1f recall_overall=${pq.count(brute.contains) / brute.size.toDouble}%.2f min_per_query=${perQ.min}%.2f")
    }
    spark.stop()
  }
}
