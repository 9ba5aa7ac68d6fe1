package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane LSH signature over an `array<float>` vector: one
  * '1'/'0' character per plane, '1' iff the projection onto that
  * plane's pseudo-random weight vector is ≥ 0.
  *
  * Bit-identical to the declarative twin
  * (`Similarity.hyperplaneSigFold`): weights are
  * `uint32(md5("hp:p:d")[0,8)) / 2^32 - 0.5` (exact in a double), the
  * projection is a strict left-to-right double fold of
  * `(double) vec[d] * w[p][d]`, and a NaN projection signs '0' (the
  * twin's `proj >= 0` predicate). The twin allocates `planes` weight
  * array literals + zipped arrays per ROW — this expression bakes the
  * weight matrix once per operator and loops, allocating only the
  * output bytes. It feeds both the LSH-bucket and IVF-cell ANN paths,
  * where it runs once per corpus row — the 100 TB hot loop.
  *
  * Degenerate inputs (null vector, length ≠ dim, null element) sign
  * all-zeros, exactly like the twin (null poisons each plane's fold
  * and `when(null >= 0, ...)` falls through to '0'), so the output is
  * never null.
  */
case class HyperplaneSig(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hyperplane_sig"

  /** planes × dim weight matrix, row-major; computed once per operator
    * instance (per executor after deserialization), never per row. */
  @transient private lazy val weights: Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < dim) {
        md.reset()
        val h = md.digest(s"hp:$p:$d".getBytes("UTF-8"))
        // first 8 hex chars = first 4 bytes, as an unsigned 32-bit int
        val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        out(p * dim + d) = u.toDouble / 4294967296.0 - 0.5
        d += 1
      }
      p += 1
    }
    out
  }

  // full eval override (not nullSafeEval): a null vector must produce
  // the all-zeros signature, not a null
  override def eval(input: InternalRow): Any = {
    val bytes = new Array[Byte](planes)
    val v = child.eval(input)
    var ok = v != null
    val arr = if (ok) v.asInstanceOf[ArrayData] else null
    if (ok && arr.numElements() == dim) {
      var i = 0
      while (ok && i < dim) { if (arr.isNullAt(i)) ok = false; i += 1 }
    } else ok = false
    if (!ok) java.util.Arrays.fill(bytes, '0'.toByte)
    else {
      var p = 0
      while (p < planes) {
        var s = 0.0
        var i = 0
        while (i < dim) {
          s += arr.getFloat(i).toDouble * weights(p * dim + i)
          i += 1
        }
        bytes(p) = if (s >= 0.0) '1'.toByte else '0'.toByte
        p += 1
      }
    }
    UTF8String.fromBytes(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val wRef = ctx.addReferenceObj("hpWeights", weights, "double[]")
    val arr = ctx.freshName("arr")
    val bytes = ctx.freshName("bytes")
    val ok = ctx.freshName("ok")
    val p = ctx.freshName("p")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val s = ctx.freshName("s")
    val dimS = dim.toString
    val planesS = planes.toString
    val javaCode =
      s"""
        |final byte[] $bytes = new byte[$planesS];
        |boolean $ok = false;
        |if (!${childGen.isNull}) {
        |  final org.apache.spark.sql.catalyst.util.ArrayData $arr =
        |    ${childGen.value};
        |  if ($arr.numElements() == $dimS) {
        |    $ok = true;
        |    for (int $i = 0; $i < $dimS; $i++) {
        |      if ($arr.isNullAt($i)) { $ok = false; break; }
        |    }
        |    if ($ok) {
        |      for (int $p = 0; $p < $planesS; $p++) {
        |        double $s = 0.0;
        |        for (int $j = 0; $j < $dimS; $j++) {
        |          $s += (double) $arr.getFloat($j) * $wRef[$p * $dimS + $j];
        |        }
        |        $bytes[$p] = ($s >= 0.0) ? (byte) '1' : (byte) '0';
        |      }
        |    }
        |  }
        |}
        |if (!$ok) { java.util.Arrays.fill($bytes, (byte) '0'); }
        |final UTF8String ${ev.value} = UTF8String.fromBytes($bytes);
      """.stripMargin
    ev.copy(
      code = childGen.code + code"$javaCode",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
