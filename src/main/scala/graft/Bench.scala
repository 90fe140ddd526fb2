package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. Failures are LOUD: a crashing query is reported in
  * an "errors" map (and to stderr) instead of masquerading as a fast
  * timing. The JSON line is printed to stdout AND written to
  * bench_out.json so a log-prefixing runner (sbt [info]) can't make it
  * unparseable. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query doesn't absorb startup
    // cost: one trivial shuffle, then a metadata-only count of each table
    // (parquet count() reads footers, not data — this warms the session's
    // shared FileStatusCache so queries measure compute, not first-touch
    // file listing; no table data is cached)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.benchQueries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
          errors(name) = msg
          System.err.println(s"[bench] FAILED $name: $msg")
      }
    }
    def jstr(s: String): String = graft.types.Json.str(s)
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_ok":${timings.size},"n_failed":${errors.size},"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    println(json)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
