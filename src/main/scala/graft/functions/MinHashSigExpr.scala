package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd MinHash signature: all `numHashes` permutations
  * h_i(x) = (a_i·x + b_i) mod p folded over the input array in ONE pass,
  * inside whole-stage codegen (classic Broder '97 construction; p = 2^31-1
  * keeps h·a < 2^62, no overflow).
  *
  * This is the "(b) custom Catalyst Expression" tier: the Column-combinator
  * formulation (`array(coeffs.map(c => array_min(transform(...))))`) is
  * 64 separate higher-order-function evaluations per row — HOFs are
  * CodegenFallback, so each allocates an interpreted lambda pass plus an
  * intermediate array. Fused here: one generated Java loop, one long[64],
  * zero intermediates. Same coefficients (seeded), bit-identical output.
  *
  * Empty input arrays yield an all-p signature (p ≡ +∞ sentinel, outside
  * the mod-p value range) — callers filter empty shingle sets upstream.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  private val p = 2147483647L // 2^31 - 1, Mersenne prime

  // identical coefficient stream to the pre-fusion implementation — keeps
  // every persisted signature and test expectation stable
  @transient private lazy val coeffs: (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val ab = Array.fill(numHashes)((math.abs(rnd.nextLong()) % (p - 1) + 1,
                                    math.abs(rnd.nextLong()) % p))
    (ab.map(_._1), ab.map(_._2))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (as, bs) = coeffs
    val mins = Array.fill(numHashes)(p)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      var h = arr.getLong(i) % p
      if (h < 0) h += p
      var j = 0
      while (j < numHashes) {
        val v = (h * as(j) + bs(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coeffs._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coeffs._2, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, ${p}L);
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i) % ${p}L;
         |  if ($h < 0) $h += ${p}L;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(hashedShingles: Column, numHashes: Int, seed: Long): Column =
    GraftExprBridge.column(
      MinHashSig(GraftExprBridge.expression(hashedShingles), numHashes, seed))
}

/** Native codegen'd signature-agreement count: the number of positions
  * where two minhash signatures hold the same value — the banded-LSH
  * in-join Jaccard ESTIMATE evaluated once per banding collision.
  * Replaces `aggregate(zip_with(a, b, (x, y) => when(x === y, 1)
  * .otherwise(0)), 0, _+_)`: two interpreted higher-order passes plus an
  * intermediate array per collision, which also demoted the join's filter
  * out of whole-stage codegen. Semantics match the combinator exactly:
  * positions beyond the shorter signature (zip_with's null padding) and
  * null elements count 0; the result is an exact int. */
case class SigAgree(left: org.apache.spark.sql.catalyst.expressions.Expression,
                    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_agree needs two array<bigint>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sig_agree"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val agree = ctx.freshName("agree")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i) &&
         |      $x.getLong($i) == $y.getLong($i)) $agree++;
         |}
         |${ev.value} = $agree;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

object SigAgree {
  def apply(a: Column, b: Column): Column =
    GraftExprBridge.column(
      SigAgree(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
