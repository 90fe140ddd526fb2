package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused md5-derived content-hash expressions. The Column-combinator
  * formulations (`conv(substring(md5(s), 1, 4), 16, 10).cast("int") % B`)
  * build a 32-char hex UTF8String, re-substring it, and PARSE the hex back
  * to a number for every evaluation — per gram occurrence in the DSIR /
  * classifier / embedding hot paths that is three string allocations per
  * hash. These evaluate the identical function (same md5 bytes, same
  * first-4-hex-chars arithmetic — differential-pinned in HashExprsSpec)
  * straight from the digest bytes, and MEMOIZE per distinct key: gram
  * streams are Zipf-distributed, so a bounded per-task cache turns the
  * md5 of the corpus's gram OCCURRENCES (~N·avg_len) into one md5 per
  * DISTINCT gram actually seen.
  *
  * CODEGEN (r19): these were CodegenFallback in r18, and a single
  * fallback expression demotes its whole operator out of whole-stage
  * codegen (CollapseCodegenStages bails on the Project/Filter/Generate
  * containing it), so every OTHER expression in the projection paid the
  * interpreted path too. Each now emits a one-line generated call to its
  * own (task-deserialized) instance via `ctx.addReferenceObj` — the loop
  * body and the memo are unchanged and instance-local exactly as before,
  * but the surrounding operator stays inside the codegen span. */
private[functions] object Md5Util {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** The calling thread's reusable digest, reset — one JCA provider
    * lookup per thread, never per row. */
  def digest(): java.security.MessageDigest = {
    val md = tl.get()
    md.reset()
    md
  }
  /** First two md5 bytes of `bytes` as an unsigned 16-bit int — exactly
    * the value `conv(substring(md5(s),1,4),16,10)` parses back out of the
    * hex rendering (4 hex chars = the first 2 digest bytes). */
  def first16(bytes: Array[Byte]): Int = {
    val md = digest()
    md.update(bytes)
    val d = md.digest()
    ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
  }
}

/** Bounded content-keyed memo (power-of-two direct-mapped slots; a
  * colliding key simply overwrites — no eviction bookkeeping, no growth).
  * Each slot holds one immutable (key, value) ENTRY behind a single
  * volatile reference, so a read is always self-consistent even if an
  * expression instance is ever shared across threads — the previous
  * two-array form could pair an old key with a new value under a
  * concurrent overwrite. Keys are cloned on store so no slot ever aliases
  * a transient row buffer. */
private[functions] final class Utf8Memo[V <: AnyRef](bits: Int) {
  private final class Entry(val key: UTF8String, val value: V)
  private final val mask = (1 << bits) - 1
  private val slots =
    new java.util.concurrent.atomic.AtomicReferenceArray[Entry](mask + 1)
  def get(k: UTF8String): V = {
    val e = slots.get(k.hashCode & mask)
    if (e != null && e.key.equals(k)) e.value else null.asInstanceOf[V]
  }
  def put(k: UTF8String, v: V): Unit =
    slots.set(k.hashCode & mask, new Entry(k.clone(), v))
}

/** `conv(substring(md5(cast(key as string)), 1, 4), 16, 10).cast("int")
  * % buckets`, fused and memoized — the [[graft.pipeline.Sampling
  * .hashBucket]] content-hash. Null in → null out. */
case class Md5Bucket(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, s"md5_bucket: buckets=$buckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_bucket needs string, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "md5_bucket"

  @transient private lazy val memo = new Utf8Memo[java.lang.Integer](16)

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def bucketOf(u: UTF8String): Int = {
    val hit = memo.get(u)
    if (hit != null) hit.intValue()
    else {
      val v = Md5Util.first16(u.getBytes) % buckets
      memo.put(u, java.lang.Integer.valueOf(v))
      v
    }
  }

  override def nullSafeEval(input: Any): Any =
    bucketOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Bucket", this, classOf[Md5Bucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bucketOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Bucket =
    copy(child = newChild)
}

object Md5Bucket {
  def apply(key: Column, buckets: Int): Column =
    GraftExprBridge.column(Md5Bucket(GraftExprBridge.expression(key), buckets))
}

/** The signed random-projection component sums of a gram bag in ONE pass:
  * out[d] = Σ_{g ∈ grams} sign(g, d) where sign(g, d) is ±1 from
  * `conv(substring(md5(concat_ws("|", g, d)), 1, 4), 16, 10) % 2 * 2 - 1`
  * — [[graft.pipeline.Embed]]'s per-(gram, dim) sign, evaluated over the
  * in-row gram array instead of a (doc × gram × dim) explode, with the
  * dims-wide sign vector memoized per distinct gram (one md5 per distinct
  * gram per dim, not per occurrence). Null array → null; null elements
  * cannot occur (the gram builder never yields them) but are skipped
  * defensively, matching an explode that drops nothing non-null. */
case class SignedGramSums(child: Expression, dims: Int)
    extends UnaryExpression {
  require(dims >= 1 && dims <= 256, s"signed_gram_sums: dims=$dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"signed_gram_sums needs array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "signed_gram_sums"

  @transient private lazy val memo = new Utf8Memo[Array[Byte]](16)
  @transient private lazy val dimSuffix: Array[Array[Byte]] =
    Array.tabulate(dims)(d => ("|" + d).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def signsOf(g: UTF8String): Array[Byte] = {
    val hit = memo.get(g)
    if (hit != null) hit
    else {
      val gb = g.getBytes
      val s = new Array[Byte](dims)
      var d = 0
      while (d < dims) {
        val suf = dimSuffix(d)
        val buf = java.util.Arrays.copyOf(gb, gb.length + suf.length)
        System.arraycopy(suf, 0, buf, gb.length, suf.length)
        s(d) = (((Md5Util.first16(buf) % 2) * 2) - 1).toByte
        d += 1
      }
      memo.put(g, s)
      s
    }
  }

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def sumsOf(grams: ArrayData): GenericArrayData = {
    val n = grams.numElements()
    val sums = new Array[Long](dims)
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val s = signsOf(grams.getUTF8String(i))
        var d = 0
        while (d < dims) { sums(d) += s(d); d += 1 }
      }
      i += 1
    }
    new GenericArrayData(sums)
  }

  override def nullSafeEval(input: Any): Any =
    sumsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sgs", this, classOf[SignedGramSums].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sumsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignedGramSums =
    copy(child = newChild)
}

object SignedGramSums {
  def apply(grams: Column, dims: Int): Column =
    GraftExprBridge.column(SignedGramSums(GraftExprBridge.expression(grams), dims))
}

/** All stride-1 `k`-token window md5 HEX fingerprints of a token array in
  * one pass: out[i] = md5(array_join(slice(toks, i+1, k), " ")) for
  * i+1 in 1..max(size-k+1, 1) — the span-dedup / winnowing fingerprint
  * shape (`transform(sequence(1, size-(k-1)), i => md5(array_join(
  * slice(...))))`), which allocates a sliced array, a joined string and a
  * hex UTF8String per window. This builds each window's joined bytes into
  * a reused buffer and hex-encodes the digest directly — same lowercase
  * hex values byte-for-byte (HashExprsSpec pins the differential), so
  * owner election, winnow minima and every oracle replay are unchanged.
  * Null tokens are skipped exactly like array_join. */
case class WindowMd5Hex(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"window_md5_hex: k=$k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_md5_hex needs array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "window_md5_hex"

  private val hexDigits = "0123456789abcdef".getBytes

  /** The per-row kernel, shared by interpreted eval and generated code.
    * Uses the thread's reusable digest (Md5Util) — the r18 form did a JCA
    * provider lookup + digest allocation per ROW on its own hot path. */
  def windowsOf(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    val last = math.max(n - k + 1, 1)
    val md = Md5Util.digest()
    val space = Array[Byte](' ')
    val out = new Array[UTF8String](last)
    var i = 0
    while (i < last) {
      md.reset()
      val end = math.min(i + k, n)
      var j = i
      var firstPart = true
      while (j < end) {
        if (!toks.isNullAt(j)) {
          if (!firstPart) md.update(space)
          val t = toks.getUTF8String(j)
          md.update(t.getBytes)
          firstPart = false
        }
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((d(b) >> 4) & 0xF)
        hex(2 * b + 1) = hexDigits(d(b) & 0xF)
        b += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  override def nullSafeEval(input: Any): Any =
    windowsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wmh", this, classOf[WindowMd5Hex].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.windowsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowMd5Hex =
    copy(child = newChild)
}

object WindowMd5Hex {
  def apply(tokens: Column, k: Int): Column =
    GraftExprBridge.column(WindowMd5Hex(GraftExprBridge.expression(tokens), k))
}
