package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.text.TextFunctions

/** MinHash signature from pre-hashed shingles in ONE pass: permutation
  * i is the universal hash `(a_i*h + b_i) mod (2^31-1)` over the same
  * deterministic (a, b) family as the declarative form
  * ([[graft.text.TextFunctions.minhashFromHashes]] — nPerm `transform`
  * + `array_min` passes, each allocating an intermediate array as long
  * as the shingle list). This expression keeps nPerm running minimums
  * while walking the input once, allocating only the nPerm-long output.
  *
  * Null semantics mirror the twin: null input array → all-null
  * signature (`array_min(null)` per slot), null ELEMENTS are skipped
  * (`array_min` ignores nulls), and an empty array (or all-null
  * elements) yields all-null slots.
  */
case class MinHashSig(child: Expression, nPerm: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  // (a, b) per permutation, flattened [a0, b0, a1, b1, ...]
  @transient private lazy val ab: Array[Long] = {
    val out = new Array[Long](nPerm * 2)
    var i = 0
    while (i < nPerm) {
      val (a, b) = TextFunctions.minhashAB(i)
      out(2 * i) = a
      out(2 * i + 1) = b
      i += 1
    }
    out
  }

  private val P = TextFunctions.MinhashP

  // full eval override (not nullSafeEval): a null input array yields
  // an all-null signature, not a null signature
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val mins = new Array[Long](nPerm)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          any = true
          val h = arr.getLong(j)
          var i = 0
          while (i < nPerm) {
            val x = (ab(2 * i) * h + ab(2 * i + 1)) % P
            if (x < mins(i)) mins(i) = x
            i += 1
          }
        }
        j += 1
      }
    }
    if (!any) new GenericArrayData(new Array[Any](nPerm)) // all nulls
    else new GenericArrayData(mins.map(Long.box))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val abRef = ctx.addReferenceObj("mhAB", ab, "long[]")
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val any = ctx.freshName("any")
    val mins = ctx.freshName("mins")
    val boxed = ctx.freshName("boxed")
    val h = ctx.freshName("h")
    val x = ctx.freshName("x")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val nPermS = nPerm.toString
    val pS = P.toString + "L"
    val javaCode =
      s"""
        |final long[] $mins = new long[$nPermS];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |boolean $any = false;
        |if (!${childGen.isNull}) {
        |  final org.apache.spark.sql.catalyst.util.ArrayData $arr =
        |    ${childGen.value};
        |  final int $n = $arr.numElements();
        |  for (int $j = 0; $j < $n; $j++) {
        |    if (!$arr.isNullAt($j)) {
        |      $any = true;
        |      final long $h = $arr.getLong($j);
        |      for (int $i = 0; $i < $nPermS; $i++) {
        |        final long $x = ($abRef[2 * $i] * $h + $abRef[2 * $i + 1]) % $pS;
        |        if ($x < $mins[$i]) $mins[$i] = $x;
        |      }
        |    }
        |  }
        |}
        |final Object[] $boxed = new Object[$nPermS];
        |if ($any) {
        |  for (int $i = 0; $i < $nPermS; $i++) $boxed[$i] = $mins[$i];
        |}
        |final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
      """.stripMargin
    ev.copy(code = childGen.code + code"$javaCode", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
