package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint straight off the shingle array:
  * `graft_winnow(shingles, k)` = the concatenation of the k SMALLEST
  * shingle md5 digests (lowercase hex, ascending) — bit-identical to
  * `concat_ws("", slice(array_sort(transform(shingles, md5)), 1, k))`
  * because lexicographic order on lowercase hex IS unsigned byte order
  * on the digest.
  *
  * The Column form md5-hashes every shingle through a non-codegen HOF
  * `transform`, materializes every 32-char hex string, fully sorts
  * them, then keeps k=4: O(n log n) string sort plus n hex
  * allocations for a 4-digest answer. This kernel keeps a bounded
  * k-array of raw digests in ONE pass (most elements exit on a single
  * compare against the current k-th), hex-encodes only the winners,
  * and stays inside whole-stage codegen. Null elements are skipped —
  * the Column chain's md5(null)=null sorts last and concat_ws drops
  * it, so the forms agree on any input (AnalysisSpec pins equality).
  */
case class Winnow(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow expects (array<string>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(arr: Any, k: Any): Any =
    Winnow.fp(arr.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, k) => s"graft.functions.Winnow.fp($a, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Winnow =
    copy(left = newLeft, right = newRight)
}

/** [[Winnow]] fused with the gram construction itself:
  * `graft_winnow_grams(toks, n, k)` ≡ `graft_winnow(shingleOfN(toks,
  * n), k)` — but no gram string, no shingle array, and no HOF
  * `transform` ever materialize. Each window's bytes stream straight
  * into the digest (token bytes + single-space separators, nulls
  * skipped — exactly `concat_ws(" ", slice(toks, i, n))`'s output
  * bytes), so the per-document cost is one token-bytes pass plus k
  * bounded compares per window. The same composition step GramStats
  * took for the repetition audit, applied to the fingerprint sketch.
  */
case class WinnowGrams(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow_grams expects (array<string>, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_winnow_grams"

  override protected def nullSafeEval(toks: Any, n: Any, k: Any): Any =
    Winnow.fpGrams(toks.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n, k) => s"graft.functions.Winnow.fpGrams($t, $n, $k)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): WinnowGrams =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Winnow {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".getBytes
  private val Space = Array(' '.toByte)

  /** Unsigned byte-wise digest compare (≡ lowercase-hex string order). */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** Bounded insertion of digest `d` into the ascending `best[0,cnt)`;
    * returns the new count. Strict < at the boundary: a digest tying
    * the current k-th is rejected — the same multiset sort-then-slice
    * keeps (equal values are interchangeable).
    */
  private def insert(best: Array[Array[Byte]], cnt: Int, k: Int,
      d: Array[Byte]): Int = {
    if (cnt < k) {
      best(cnt) = d
      var j = cnt
      while (j > 0 && cmp(best(j), best(j - 1)) < 0) {
        val t = best(j); best(j) = best(j - 1); best(j - 1) = t; j -= 1
      }
      cnt + 1
    } else if (cmp(d, best(k - 1)) < 0) {
      best(k - 1) = d
      var j = k - 1
      while (j > 0 && cmp(best(j), best(j - 1)) < 0) {
        val t = best(j); best(j) = best(j - 1); best(j - 1) = t; j -= 1
      }
      cnt
    } else cnt
  }

  private def encode(best: Array[Array[Byte]], cnt: Int): UTF8String = {
    val out = new Array[Byte](cnt * 32)
    var w = 0
    var bi = 0
    while (bi < cnt) {
      val d = best(bi)
      var p = 0
      while (p < 16) {
        out(w) = HexChars((d(p) >> 4) & 0xf); w += 1
        out(w) = HexChars(d(p) & 0xf); w += 1
        p += 1
      }
      bi += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Called from generated code. */
  def fp(arr: ArrayData, k: Int): UTF8String = {
    val n = arr.numElements()
    if (k <= 0 || n == 0) return UTF8String.EMPTY_UTF8
    val md = digest.get()
    val best = new Array[Array[Byte]](k)
    var cnt = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        md.reset()
        cnt = insert(best, cnt, k, md.digest(s.getBytes))
      }
      i += 1
    }
    encode(best, cnt)
  }

  /** Called from generated code. Digest of window w streams the bytes
    * `concat_ws(" ", slice(toks, w+1, n))` would produce: non-null
    * token bytes joined by single spaces, nulls skipped.
    */
  def fpGrams(arr: ArrayData, n: Int, k: Int): UTF8String = {
    val len = arr.numElements()
    val m = len - n + 1
    if (k <= 0 || n <= 0 || m <= 0) return UTF8String.EMPTY_UTF8
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      val s = arr.getUTF8String(i)
      toks(i) = if (s == null) null else s.getBytes
      i += 1
    }
    val md = digest.get()
    val best = new Array[Array[Byte]](k)
    var cnt = 0
    var w = 0
    while (w < m) {
      md.reset()
      var first = true
      var j = w
      while (j < w + n) {
        if (toks(j) != null) {
          if (!first) md.update(Space)
          md.update(toks(j))
          first = false
        }
        j += 1
      }
      cnt = insert(best, cnt, k, md.digest())
      w += 1
    }
    encode(best, cnt)
  }
}
