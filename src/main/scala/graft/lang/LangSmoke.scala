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
      if (files.exists(_.contains("Sample"))) {
        // samples expect the setup.andl catalog (S/P/SP/J/SPJ CSVs live in
        // the Sample dir itself)
        val sdir = new java.io.File(s"$dir/../Sample").getCanonicalPath
        val interp = new AndlInterp(spark, sdir)
        interp.noisy = 1
        interp.runFile(s"$sdir/setup.andl")
        files.foreach { f =>
          println(s"== running $f")
          interp.runFile(s"$dir/$f")
          println(interp.output.toString)
          interp.output.clear()
        }
      } else {
        val results = AndlScript.runSuites(spark, dir, files)
        results.foreach { r =>
          println(s"== ${r.file}: tests=${r.tests} errors=${r.errors}")
          if (r.output.nonEmpty) println(r.output)
        }
      }
    } finally spark.stop()
  }
}
