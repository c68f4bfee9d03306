package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native in-bucket pair verification for the similarity-join chains.
  *
  * The Column formulation enumerated every ordered member pair of a
  * posting bucket through nested `transform` lambdas — higher-order
  * functions run on Catalyst's INTERPRETED path, so a df-capped bucket
  * of 500 members paid ~μs-scale lambda/struct overhead on each of its
  * 125 k pairs; at sf10 the containment chain spent >100 s of wall
  * enumerating ~10⁸ pairs this way (measured r12). These kernels do
  * the same enumeration in one tight loop over the bucket's member
  * array — per-member fields and key sets are unpacked ONCE, pairs are
  * checked with the two-pointer sorted intersect, and only the
  * THRESHOLD-PASSING pairs materialize as output rows, so the stream
  * leaving the stage is final-result-sized.
  *
  * Both kernels sort members by doc_id internally (doc_a < doc_b by
  * construction), replacing the aggregate-side `array_sort` over
  * structs-with-arrays — `collect_list` feeds them directly.
  *
  * Output: array<struct<doc_a, doc_b, na, nb, ix>> — the division to
  * jaccard/containment doubles stays in Catalyst so the emitted values
  * (and their IEEE rounding) are bit-identical to the previous chain
  * and to the DuckDB oracle. The threshold FILTER, however, runs
  * in-kernel on the same `(double) ix / (double) …` arithmetic the SQL
  * forms use — identical operation order, identical verdicts.
  */
abstract class PairVerifyBase extends BinaryExpression {

  /** member struct: (doc_id long, n int|long, [pfx bool,] ks array<long>) */
  protected def memberFields: Int

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StructType(fs), _), DoubleType)
        if fs.length == memberFields => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<struct[$memberFields fields]>, double), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("na", IntegerType, nullable = false),
    StructField("nb", IntegerType, nullable = false),
    StructField("ix", IntegerType, nullable = false))),
    containsNull = false)
}

/** Jaccard in-bucket verify: all ordered pairs, keep
  * ix/(na+nb−ix) ≥ threshold. Member struct: (doc_id, n, ks).
  */
case class JaccardPairs(left: Expression, right: Expression)
    extends PairVerifyBase {
  override protected def memberFields: Int = 3
  override def prettyName: String = "graft_jaccard_pairs"

  override protected def nullSafeEval(arr: Any, t: Any): Any =
    PairVerify.jaccard(arr.asInstanceOf[ArrayData], t.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, t) => s"graft.functions.PairVerify.jaccard($a, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardPairs =
    copy(left = newLeft, right = newRight)
}

/** Containment in-bucket verify: ordered pairs with x.pfx || y.pfx,
  * keep ix/min(na,nb) ≥ threshold. Member struct: (doc_id, n, pfx, ks).
  */
case class ContainmentPairs(left: Expression, right: Expression)
    extends PairVerifyBase {
  override protected def memberFields: Int = 4
  override def prettyName: String = "graft_containment_pairs"

  override protected def nullSafeEval(arr: Any, t: Any): Any =
    PairVerify.containment(arr.asInstanceOf[ArrayData], t.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, t) => s"graft.functions.PairVerify.containment($a, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainmentPairs =
    copy(left = newLeft, right = newRight)
}

/** Flag-guarded candidate-pair emission WITHOUT verification:
  * `graft_candidate_pairs(arr)` over members (doc_id, pfx) emits the
  * ordered pairs where x.pfx || y.pfx — the containment chain's
  * candidate stage, where key sets deliberately do NOT ride the
  * postings (the ks-on-every-posting variant shuffled 46 GB at sf10,
  * measured r12); candidates join back to the per-doc sets for exact
  * verification.
  */
case class CandidatePairs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_candidate_pairs expects array<struct<doc_id, pfx>>, " +
          s"got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_candidate_pairs"

  override protected def nullSafeEval(arr: Any): Any =
    PairVerify.candidates(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PairVerify.candidates($a)")

  override protected def withNewChildInternal(newChild: Expression): CandidatePairs =
    copy(child = newChild)
}

object PairVerify {

  /** Called from generated code: ordered (doc_a < doc_b) pairs with
    * x.pfx || y.pfx, from members (doc_id, pfx).
    */
  def candidates(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val ids = new Array[Long](m)
    val pfx = new Array[Boolean](m)
    var i = 0
    while (i < m) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0)
      pfx(i) = s.getBoolean(1)
      i += 1
    }
    // insertion sort by doc_id
    i = 1
    while (i < m) {
      val id = ids(i); val p = pfx(i)
      var j = i - 1
      while (j >= 0 && ids(j) > id) {
        ids(j + 1) = ids(j); pfx(j + 1) = pfx(j); j -= 1
      }
      ids(j + 1) = id; pfx(j + 1) = p
      i += 1
    }
    val out = new java.util.ArrayList[InternalRow]()
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        if (pfx(i) || pfx(j))
          out.add(new GenericInternalRow(Array[Any](ids(i), ids(j))))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[InternalRow]))
  }

  /** Unpacked bucket members, sorted by doc_id ascending. */
  private final class Members(arr: ArrayData, withPfx: Boolean) {
    val m: Int = arr.numElements()
    val ids = new Array[Long](m)
    val ns = new Array[Int](m)
    val pfx = new Array[Boolean](m)
    val ks = new Array[Array[Long]](m)
    locally {
      val fields = if (withPfx) 4 else 3
      var i = 0
      while (i < m) {
        val s = arr.getStruct(i, fields)
        ids(i) = s.getLong(0)
        ns(i) = s.getInt(1)
        if (withPfx) {
          pfx(i) = s.getBoolean(2)
          ks(i) = s.getArray(3).toLongArray()
        } else {
          ks(i) = s.getArray(2).toLongArray()
        }
        i += 1
      }
      // insertion sort by doc_id (buckets are df-capped; members are
      // nearly unordered but small)
      i = 1
      while (i < m) {
        val id = ids(i); val n = ns(i); val p = pfx(i); val k = ks(i)
        var j = i - 1
        while (j >= 0 && ids(j) > id) {
          ids(j + 1) = ids(j); ns(j + 1) = ns(j); pfx(j + 1) = pfx(j)
          ks(j + 1) = ks(j); j -= 1
        }
        ids(j + 1) = id; ns(j + 1) = n; pfx(j + 1) = p; ks(j + 1) = k
        i += 1
      }
    }
  }

  private def ixOf(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  private def row(ms: Members, i: Int, j: Int, ix: Int): InternalRow =
    new GenericInternalRow(Array[Any](ms.ids(i), ms.ids(j), ms.ns(i),
      ms.ns(j), ix))

  /** Called from generated code. */
  def jaccard(arr: ArrayData, threshold: Double): ArrayData = {
    val ms = new Members(arr, withPfx = false)
    val out = new java.util.ArrayList[InternalRow]()
    var i = 0
    while (i < ms.m) {
      var j = i + 1
      while (j < ms.m) {
        val ix = ixOf(ms.ks(i), ms.ks(j))
        // same IEEE ops as the Column chain: int arithmetic, then
        // double division
        val jac = ix.toDouble / (ms.ns(i) + ms.ns(j) - ix).toDouble
        if (jac >= threshold) out.add(row(ms, i, j, ix))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[InternalRow]))
  }

  /** Called from generated code. */
  def containment(arr: ArrayData, threshold: Double): ArrayData = {
    val ms = new Members(arr, withPfx = true)
    val out = new java.util.ArrayList[InternalRow]()
    var i = 0
    while (i < ms.m) {
      var j = i + 1
      while (j < ms.m) {
        if (ms.pfx(i) || ms.pfx(j)) {
          val ix = ixOf(ms.ks(i), ms.ks(j))
          val cont = ix.toDouble / math.min(ms.ns(i), ms.ns(j)).toDouble
          if (cont >= threshold) out.add(row(ms, i, j, ix))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[InternalRow]))
  }
}
