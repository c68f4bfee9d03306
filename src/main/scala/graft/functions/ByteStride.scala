package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** `graft_byte_stride(payload, stride)` — unsigned byte values of a
  * binary payload at positions 0, stride, 2·stride, … as `array<int>`.
  *
  * This is the linear-time decode kernel for the multimodal operators
  * ([[graft.mm.Multimodal]]). The round-2 formulation walked the payload
  * as a STRING with `substr(i, 1)` per index; `UTF8String.substring` is
  * O(position) (it re-walks UTF-8 boundaries from the start), making the
  * decode O(len²) per document. Byte indexing on `byte[]` is O(1), so
  * this expression is one O(len/stride) loop, fused into whole-stage
  * codegen like [[DotProduct]].
  *
  * `stride < 1` yields NULL (invalid argument surfaced visibly, not
  * clamped). Null payload/stride null-propagate via BinaryExpression.
  */
case class ByteStride(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_byte_stride expects (binary, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_byte_stride"
  // stride < 1 produces null even from non-nullable children
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    val stride = b.asInstanceOf[Int]
    if (stride < 1) null
    else {
      val m = (bytes.length + stride - 1) / stride
      val out = new Array[Int](m)
      var i = 0
      var j = 0
      while (j < m) { out(j) = bytes(i) & 0xff; i += stride; j += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val arr = ctx.freshName("arr")
      s"""
         |if ($b < 1) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $m = ($a.length + $b - 1) / $b;
         |  int[] $arr = new int[$m];
         |  for (int $i = 0, $j = 0; $j < $m; $i += $b, $j++) {
         |    $arr[$j] = $a[$i] & 0xFF;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteStride =
    copy(left = newLeft, right = newRight)
}

object ByteStrideFunctions {
  /** Column-API form of [[ByteStride]] (registered by [[GraftExtensions]]). */
  def graftByteStride(payload: Column, stride: Column): Column =
    call_function("graft_byte_stride", payload, stride)
}
