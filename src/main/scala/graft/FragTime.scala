package graft

// SCRATCH fragment profiler for the r18 optimization round (guide §1.4:
// noop-sink timing of pipeline fragments so the fix targets the stage
// that actually costs). Not part of the library surface.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object FragTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(label: String)(df: => DataFrame): Unit = {
      // warm once, then median-of-3 noop writes
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val xs = Seq(once(), once(), once()).sorted
      println(f"[frag] $label%-40s ${xs(1)}%6.2f s")
    }

    import graft.pipeline.Decontaminate._
    val norm = docs.select(col("doc_id"), normText(col("text")).as("__n"))
    time("normText only")(norm)
    time("norm + char_ngram_hashes (array)")(
      norm.select(col("doc_id"),
        graft.functions.CharNgramHashes(col("__n"), 8).as("a")))
    val dg = norm.select(col("doc_id"),
      explode(graft.functions.CharNgramHashes(col("__n"), 8)).as("__h"))
    time("norm + hashes + explode")(dg)
    val snips = evalSnippets(docs)
      .select(col("eval_id"),
        concat(lit("z"), substring(col("snippet"), 2, 39)).as("snippet"))
    val eg = snips.select(col("eval_id"),
      graft.functions.CharNgramHashes(normText(col("snippet")), 8).as("__gs"))
      .select(col("eval_id"), size(col("__gs")).as("__nev"),
        explode(col("__gs")).as("__h"))
    time("explode + broadcast join")(dg.join(broadcast(eg), "__h"))
    time("full fuzzyContaminated")(
      fuzzyContaminated(docs, snips, n = 8, frac = 0.6))
    time("q_dedup_ngram charNgrams side")(
      docs.select(col("doc_id"),
        graft.pipeline.TextAnalysis.charNgrams(col("text"), 5).as("g")))

    // minhash path decomposition
    import graft.pipeline.{Dedup, TextAnalysis}
    val filt = docs.where(length(col("text")) >= 5)
    time("hashedShingles only")(
      filt.select(col("doc_id"), TextAnalysis.hashedShingles(col("text")).as("g")))
    time("shingles + minhashSignature")(
      filt.select(col("doc_id"), TextAnalysis.hashedShingles(col("text")).as("g"))
        .where(size(col("g")) > 0)
        .select(col("doc_id"), Dedup.minhashSignature(col("g"), 64).as("sig")))
    time("full minhashPairs")(Dedup.minhashPairs(filt, threshold = 0.5))
    spark.stop()
  }
}
