package graft.lang

import org.apache.spark.sql.SparkSession

/** Dev harness: run the reference's own .andl test suites and print
  * per-file test_true totals. Usage: runMain graft.lang.LangSmoke [files…] */
object LangSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("lang-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("ANDL_TEST_DIR", "/root/reference/Test")
    val files = if (args.nonEmpty) args.toSeq else Seq("SuiteBasic.andl")
    try {
      val results = AndlScript.runSuites(spark, dir, files)
      results.foreach { r =>
        println(s"== ${r.file}: tests=${r.tests} errors=${r.errors}")
        if (r.output.nonEmpty) println(r.output)
      }
    } finally spark.stop()
  }
}
