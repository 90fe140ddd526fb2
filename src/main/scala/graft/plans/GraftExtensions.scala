package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DeflateRatio, FloatVecDot, MinHashSig, NfcNormalize, SimHash64}

/** Session extension (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * exposes the engine's native codegen expressions as SQL functions
  * (`vec_dot`, `simhash64`, `minhash_sig`) so `spark.sql(...)` users get
  * the fused fast paths too.
  *
  * Deliberately NO custom optimizer rule: redundant-dedup elimination —
  * the one candidate — is already covered twice over, by the Rel wrapper's
  * distinctness bit at the API layer and by Catalyst natively below it
  * (ReplaceDeduplicateWithAggregate + RemoveRedundantAggregates with
  * distinct-keys propagation; verified empirically on dedup-over-aggregate
  * and nested-dedup plans, which optimize to a single Aggregate with or
  * without any injected rule). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b)")
        FloatVecDot(args(0), args(1))
      }))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(hashes)")
        SimHash64(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "deflate_ratio(text)")
        DeflateRatio(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(text)")
        NfcNormalize(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(h) => MinHashSig(h, 64, 42L)
        case Seq(h, n) => MinHashSig(h, intArg(n, "numHashes"), 42L)
        case Seq(h, n, s) =>
          MinHashSig(h, intArg(n, "numHashes"), longArg(s, "seed"))
        case _ => throw new IllegalArgumentException(
          "minhash_sig(hashes[, numHashes[, seed]])")
      }))

    // the Column-combinator pipeline signals, composed into expression
    // trees at analysis time — spark.sql users get the same codegen'd
    // chains the DataFrame API builds
    import org.apache.spark.sql.graftbridge.GraftExprBridge.{column => col1, convert => ex}
    def inject1(name: String, f: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (args: Seq[Expression]) => {
          require(args.length == 1, s"$name(text)")
          ex(f(col1(args.head)))
        }))
    inject1("quality", graft.pipeline.TextAnalysis.qualityScore)
    inject1("lang_id", graft.pipeline.TextAnalysis.langId)
    inject1("scrub_all", graft.pipeline.TextAnalysis.scrubAll)
    inject1("html_text", graft.pipeline.TextAnalysis.htmlToText)
    inject1("url_canon", graft.pipeline.TextAnalysis.canonicalizeUrl)
    ext.injectFunction((FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "zorder_key"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "zorder_key(x, y[, bits])")
        val bits = if (args.length == 3) intArg(args(2), "bits") else 16
        ex(graft.sources.Layout.zorderKey(col1(args(0)), col1(args(1)), bits))
      }))
  }
}
