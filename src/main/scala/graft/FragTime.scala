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

    // r19: banded-candidate/verify decomposition (replicates the private
    // bandedCandidateIds + verifyJaccard pipeline verbatim, minus the
    // estimate filter / plus it / plus the exact verify) so the 1.6 s the
    // r18 FragTime lumped as "banding machinery" is attributed
    {
      import graft.rel.Checkpoint.PinOps
      val grams = filt.select(col("doc_id").as("id"),
          TextAnalysis.hashedShingles(col("text"), 3).as("g"))
        .filter(size(col("g")) > 0).pin()
      val sig = grams.select(col("id"),
        Dedup.minhashSignature(col("g"), 64).as("sig")).pin()
      val bands = 16; val rows = 4
      val banded = sig.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * lit(rows) + 1, lit(rows)), b)))
          .as(Seq("band", "bh")))
      time("banding explode only")(banded)
      val a = banded.select(col("band"), col("bh"), col("id").as("id_a"),
        col("sig").as("sig_a"))
      val bb = banded.select(col("band"), col("bh"), col("id").as("id_b"),
        col("sig").as("sig_b"))
      val coll = a.join(bb, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      time("+ band self-join (collisions)")(coll)
      val est = coll.filter((graft.functions.SigAgree(col("sig_a"), col("sig_b"))
        .cast("double") / 64) >= 0.5 - 0.15)
      time("+ sig_agree estimate filter")(est)
      val cands = est.select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      time("+ dropDuplicates")(cands)
      val ga = grams.select(col("id").as("id_a"), col("g").as("g_a"))
      val gb = grams.select(col("id").as("id_b"), col("g").as("g_b"))
      val ver = cands.join(ga, "id_a").join(gb, "id_b")
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
           size(array_union(col("g_a"), col("g_b"))).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      time("+ exact Jaccard verify")(ver)
      sig.unpin(); grams.unpin()
    }
    spark.stop()
  }
}
