package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle/n-gram hashers. The Column-combinator formulations
  * (`array_distinct(transform(sequence(...), i => xxhash64(array_join(
  * slice(...)))))`) evaluate four nested higher-order/collection expressions
  * PER SHINGLE, allocating an intermediate array each; these do one pass per
  * row. Hashes are bit-identical to `xxhash64` (XXH64, seed 42) so all
  * planted-pair tests and recall measurements are unchanged.
  *
  * CODEGEN (r19): formerly CodegenFallback — which demoted the WHOLE
  * containing operator (Project/Filter/Generate) out of whole-stage
  * codegen, making every sibling expression pay the interpreted path.
  * Each now emits a one-line generated call to its task-local instance
  * (`ctx.addReferenceObj`), keeping the codegen span intact; the per-row
  * loop is the same JVM method either way. */

/** Word k-shingles from a token array → distinct xxhash64 values, in first-
  * occurrence order. Matches: shingle_i = tokens[i..i+k-1] joined by " "
  * for i in 0..max(size-k, 0) (short arrays yield one whole-array shingle,
  * like slice's clamping). */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  private val space = UTF8String.fromString(" ")

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def shinglesOf(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    val last = math.max(n - k, 0)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= last) {
      val parts = new Array[UTF8String](math.min(k, n - i))
      var j = 0
      while (j < parts.length) {
        parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(space, parts: _*)
      out.add(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var m = 0
    while (it.hasNext) { arr(m) = it.next(); m += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    shinglesOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sh", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.shinglesOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(tokens: Column, k: Int): Column =
    GraftExprBridge.column(ShingleHashes(GraftExprBridge.expression(tokens), k))
}

/** Character n-grams of a string → distinct xxhash64 values, first-
  * occurrence order. Matches: gram_i = substr(s, i, n) (SQL 1-based,
  * clamped) for i in 1..max(len-n+1, 1) — one whole-string gram for short
  * strings. */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes needs string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def gramsOf(s: UTF8String): GenericArrayData = {
    // One forward pass records each char's start BYTE offset, then every
    // window hashes its byte range in place. The previous substringSQL
    // call re-scanned the string from byte 0 to find char i's position
    // and allocated a UTF8String per gram — O(len²) bytes touched per row
    // and one allocation per window (measured 1.8 s of q_decontam_fuzzy's
    // 3.8 s at sf0.1). Same bytes hashed → bit-identical xxhash64 values.
    val base = s.getBaseObject
    val baseOff = s.getBaseOffset
    val numBytes = s.numBytes
    // char start offsets; off(numChars) = numBytes
    val off = new Array[Int](numBytes + 1)
    var chars = 0
    var b = 0
    while (b < numBytes) {
      off(chars) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      chars += 1
    }
    off(chars) = numBytes
    val last = math.max(chars - n, 0) // 0-based: windows start at 0..last
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= last) {
      val startB = off(i)
      val endB = off(math.min(i + n, chars))
      out.add(XXH64.hashUnsafeBytes(base, baseOff + startB, endB - startB, 42L))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var m = 0
    while (it.hasNext) { arr(m) = it.next(); m += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    gramsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cnh", this, classOf[CharNgramHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.gramsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

object CharNgramHashes {
  def apply(s: Column, n: Int): Column =
    GraftExprBridge.column(CharNgramHashes(GraftExprBridge.expression(s), n))
}

/** Unicode NFC canonical composition (java.text.Normalizer): visually
  * identical strings — "e" + COMBINING ACUTE ACCENT vs precomposed "é" —
  * become byte-identical, so fingerprints, exact dedup and shingle hashes
  * stop treating encoding variants of the same document as distinct.
  * Per-row JVM library call no Column combinator expresses; the generated
  * code calls the instance directly (keeping the containing operator
  * inside whole-stage codegen — as a CodegenFallback it demoted the whole
  * projection). Fast path: already-normalized input (all-ASCII web text
  * is) returns the input UTF8String untouched — no decode, no
  * allocation. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs string, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(text: Column): Column =
    GraftExprBridge.column(NfcNormalize(GraftExprBridge.expression(text)))
}
