package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Existential cosine screen: `graft_any_cosine_ge(v, evals, t)` =
  * does ANY eval vector have cosine(v, ev) ≥ t — the membership test
  * `sim_embedding_decontam` runs for every corpus vector.
  *
  * Why a kernel: the relational form is a broadcast nested-loop join
  * with `cosine(...) ≥ t` as the join condition, which pays the join
  * machinery per PAIR — ~3.6 G pairs at sf10 measured ~320 ns each
  * (36 s of wall), ~3× over the arithmetic (12.1 s measured). Here
  * the per-corpus-row cost is one call: the eval matrix is unpacked
  * from the broadcast row ONCE PER TASK (the ThreadLocal below — the
  * join's build-side wrapper objects are recreated per access, so the
  * cache keys on the underlying buffer identity, not the wrapper),
  * and the scan loops evals in-place with early exit on the first
  * hit. Clean rows — the overwhelming majority — still pay the full
  * |evals|·dim multiply, which is the exact screen's floor; the
  * documented scale path for an eval set too big to broadcast remains
  * IVF-cell probing (see `embDecontaminate`'s scaladoc).
  *
  * Semantics are pinned to the Column chain, decision for decision:
  *  - dot is the same in-order left fold [[DotProduct]] computes, and
  *    ‖v‖² is computed by the same fold (the chain's `dot(v, v)`);
  *  - cos = dot / (sqrt(‖v‖²) · sqrt(en)) in that operation order,
  *    with `en` precomputed per eval row in Catalyst exactly as the
  *    chain does;
  *  - zero-norm vectors make the chain's division ERROR under the
  *    session's ANSI mode (Spark 4 default; the fixture has none) —
  *    the kernel is a TOTAL extension that treats the undefined
  *    cosine as no-match (Java 0/0 = NaN, NaN ≥ t false), the only
  *    verdict a screen can justify for a vector that cannot be
  *    similar to anything; AnyCosineSpec pins both behaviors;
  *  - a null/absent eval entry, a null element, or a length mismatch
  *    makes the chain's cosine NULL (never a match): the kernel skips
  *    those entries, and a corpus vector with a null element returns
  *    false (the chain's NULL condition matches nothing).
  */
case class AnyCosineGe(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  private def v = first
  private def evals = second
  private def threshold = third

  override def checkInputDataTypes(): TypeCheckResult = {
    val evalsOk = evals.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 =>
        (fs(0).dataType, fs(1).dataType) match {
          case (ArrayType(DoubleType, _), DoubleType) => true
          case _ => false
        }
      case _ => false
    }
    if (v.dataType != ArrayType(DoubleType, containsNull = true) &&
      v.dataType != ArrayType(DoubleType, containsNull = false))
      TypeCheckResult.TypeCheckFailure(
        s"graft_any_cosine_ge expects array<double> v, got ${v.dataType.simpleString}")
    else if (!evalsOk)
      TypeCheckResult.TypeCheckFailure(
        s"graft_any_cosine_ge expects array<struct<ev: array<double>, en: double>> evals, " +
          s"got ${evals.dataType.simpleString}")
    else if (threshold.dataType != DoubleType || !threshold.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_any_cosine_ge threshold must be a double literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_any_cosine_ge"

  @transient private lazy val t: Double =
    threshold.eval(null).asInstanceOf[Double]

  /** The shared kernel (also called from generated code). */
  def anyGe(vd: ArrayData, ev: ArrayData): Boolean =
    AnyCosine.anyGe(vd, ev, t)

  override protected def nullSafeEval(vd: Any, ev: Any, th: Any): Any =
    anyGe(vd.asInstanceOf[ArrayData], ev.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("anyCosine", this,
      classOf[AnyCosineGe].getName)
    nullSafeCodeGen(ctx, ev, (vd, evs, _) =>
      s"${ev.value} = $self.anyGe($vd, $evs);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): AnyCosineGe =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object AnyCosine {

  /** Unpacked eval matrix: vectors (null = skip), sqrt of each norm. */
  private final class Mx(val evs: Array[Array[Double]],
    val sqEn: Array[Double])

  /** Per-task cache of the unpacked broadcast matrix, keyed on the
    * UNDERLYING buffer (base object identity + offset): the join's
    * build row hands out a fresh ArrayData wrapper on every access,
    * so wrapper identity never repeats, but the bytes it points into
    * are the one broadcast copy.
    */
  private val cache =
    new ThreadLocal[(AnyRef, Long, Mx)]()

  private def mxFor(evals: ArrayData): Mx = {
    val (bo: AnyRef, off: Long) = evals match {
      case u: UnsafeArrayData => (u.getBaseObject, u.getBaseOffset)
      case g => (g, 0L)
    }
    val c = cache.get()
    if (c != null && (c._1 eq bo) && c._2 == off) return c._3
    val m = evals.numElements()
    val evs = new Array[Array[Double]](m)
    val sqEn = new Array[Double](m)
    var j = 0
    while (j < m) {
      if (!evals.isNullAt(j)) {
        val s = evals.getStruct(j, 2)
        if (!s.isNullAt(0) && !s.isNullAt(1)) {
          val a = s.getArray(0)
          val n = a.numElements()
          var hasNull = false
          var i = 0
          while (i < n && !hasNull) {
            if (a.isNullAt(i)) hasNull = true
            i += 1
          }
          if (!hasNull) {
            evs(j) = a.toDoubleArray()
            sqEn(j) = math.sqrt(s.getDouble(1))
          }
        }
      }
      j += 1
    }
    val mx = new Mx(evs, sqEn)
    cache.set((bo, off, mx))
    mx
  }

  /** Called from generated code. */
  def anyGe(vd: ArrayData, evals: ArrayData, t: Double): Boolean = {
    val n = vd.numElements()
    val vv = new Array[Double](n)
    var i = 0
    while (i < n) {
      // a null element makes every chain cosine NULL — no match
      if (vd.isNullAt(i)) return false
      vv(i) = vd.getDouble(i)
      i += 1
    }
    var nrm = 0.0
    i = 0
    while (i < n) { nrm += vv(i) * vv(i); i += 1 }
    val sq = math.sqrt(nrm)
    val mx = mxFor(evals)
    var j = 0
    while (j < mx.evs.length) {
      val ev = mx.evs(j)
      if (ev != null && ev.length == n) {
        var acc = 0.0
        var k = 0
        while (k < n) { acc += vv(k) * ev(k); k += 1 }
        // zero norms give NaN here (the ANSI chain would error); NaN
        // >= t is false in Java — undefined cosine never matches
        val cos = acc / (sq * mx.sqEn(j))
        if (cos >= t) return true
      }
      j += 1
    }
    false
  }
}
