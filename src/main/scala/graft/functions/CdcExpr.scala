package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries by Gear rolling hash (the FastCDC
  * family — Xia et al., "FastCDC: a Fast and Efficient Content-Defined
  * Chunking Approach", USENIX ATC 2016): cut after character `i` when the
  * running chunk is ≥ `minLen` chars and the rolling hash's low `avgBits`
  * bits are zero (expected chunk length ≈ minLen + 2^avgBits), or
  * unconditionally at `maxLen`. The rolling state RESETS at every cut, so
  * a boundary depends only on content since the previous cut — after an
  * insertion the chunking re-synchronizes within about one chunk and
  * every later chunk hashes identically to the unedited copy. That is the
  * property fixed-size chunking lacks (one inserted word shifts every
  * subsequent fixed window) and why storage dedup and shift-robust corpus
  * dedup use CDC.
  *
  * Returns array<struct<pos:int, len:int, hash:bigint>> tiling the string
  * exactly (empty array for the empty string); `hash` is 64-bit FNV-1a
  * over the chunk's chars. Per-row byte crunching no Column combinator
  * expresses; the generated code calls the instance directly
  * (addReferenceObj) so the containing operator stays inside whole-stage
  * codegen — the r18 CodegenFallback form demoted the whole projection.
  * Gear table: SplitMix64 of the byte value — deterministic public
  * constants, no stored state. */
case class GearChunks(child: Expression, minLen: Int, avgBits: Int, maxLen: Int)
    extends UnaryExpression {
  require(minLen >= 1 && maxLen >= minLen && avgBits >= 1 && avgBits <= 32,
    s"gear_chunks: need 1 <= minLen <= maxLen and avgBits in [1,32]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gear_chunks needs string, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "gear_chunks"

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def chunksOf(u: UTF8String): GenericArrayData = {
    val s = u.toString
    val n = s.length
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    val mask = (1L << avgBits) - 1
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + GearChunks.Gear(s.charAt(i) & 0xff)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen || i == n - 1) {
        var fnv = 0xcbf29ce484222325L
        var j = start
        while (j <= i) { fnv ^= s.charAt(j); fnv *= 0x100000001b3L; j += 1 }
        rows += InternalRow(start, len, fnv)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    new GenericArrayData(rows.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    chunksOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gear", this, classOf[GearChunks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.chunksOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}

object GearChunks {
  /** 256-entry Gear table: SplitMix64 of the character's low byte —
    * reproducible on any JVM, nothing learned or stored. */
  private[functions] val Gear: Array[Long] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(256)(i => mix(i.toLong))
  }

  def apply(text: Column, minLen: Int, avgBits: Int, maxLen: Int): Column =
    GraftExprBridge.column(
      GearChunks(GraftExprBridge.expression(text), minLen, avgBits, maxLen))
}
