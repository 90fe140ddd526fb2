package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Optimization-round evidence tool: writes `.explain("formatted")` for
  * declared queries to `<outDir>/<name>_<suffix>.txt` so plan claims in
  * OPTIMIZATION_r18.md are checkable without running Spark.
  *
  *   sbt "runMain graft.PlanDump plans/r18 [query ...]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PLAN_SUFFIX
  * (default "before"), SPARK_GRAFT_CPUS (default 32). Session configs
  * mirror Bench.scala so the captured plans are the plans the bench runs.
  *
  * NOTE: building a query's DataFrame executes any eager side work the
  * query performs (catalog mutations, streaming micro-batches), exactly
  * as Bench does before its timed count(); the dumped plan is the plan of
  * the RETURNED frame — for queries whose work happens eagerly the
  * interesting plans are internal and are captured separately where the
  * round touches them. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val outDir = args.headOption.getOrElse("plans/r18")
    val only: Set[String] = args.drop(1).toSet
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = ExplainMode.fromString("formatted")
    val names = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    names.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(mode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] $name ok (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
