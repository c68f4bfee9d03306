package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Per-document DISTINCT hashed word-n-gram keys, fused:
  * `graft_gram_keys(toks, n, production)` ≡ the sorted distinct set of
  * `PortableHash.key64(concat_ws(" ", slice(toks, i, n)), production)`
  * over every window i — but no gram STRING, no shingle array, and no
  * HOF `transform` ever materialize. Each window's bytes stream
  * straight into the digest (token bytes + single-space separators,
  * nulls skipped — exactly `concat_ws(" ", …)`'s output bytes), the
  * same fusion [[WinnowGrams]] applies to the fingerprint sketch.
  *
  * This is the map-side head of every shingle-posting chain
  * (n-gram Jaccard, containment, decontamination, source overlap).
  * The Column form exploded ~20-char gram strings and md5'd them one
  * ROW at a time: the explode carried string payloads into the first
  * exchange, and duplicate in-doc grams rode along until the partial
  * aggregate collapsed them. Here the explode carries 8-byte longs,
  * in-doc repeats are gone BEFORE the explode (the downstream
  * `collect_set` aggregates are duplicate-insensitive, so dropping
  * repeats early is semantics-preserving — DedupSpec pins chain ≡
  * kernel), and the whole pass stays inside whole-stage codegen.
  *
  * Hash modes mirror [[graft.functions.PortableHash]] exactly:
  *  - production=false (oracle): top 60 bits of the md5 prefix —
  *    bit-identical to `graft_md5_bits(gram) >>> 4` and therefore to
  *    the DuckDB oracle's `conv(substring(md5(g),1,15),16,10)`;
  *  - production=true: `xxhash64(gram)` — Spark's seed-42 XXH64 over
  *    the same UTF-8 bytes.
  *
  * Fewer than n tokens (or n ≤ 0) → empty array, matching the chain's
  * `when(size(toks) < n, array())` guard.
  */
case class GramKeys(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, BooleanType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_keys expects (array<string>, int, boolean), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_keys"

  override protected def nullSafeEval(toks: Any, n: Any, prod: Any): Any =
    GramKeys.keys(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int],
      prod.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n, p) => s"graft.functions.GramKeys.keys($t, $n, $p)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): GramKeys =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Positional sibling of [[GramKeys]]:
  * `graft_gram_key_seq(toks, n, production)` = every window key IN
  * WINDOW ORDER (repeats kept). `posexplode` over it yields the
  * (pos, key) postings the substring-dedup verify stage aligns into
  * diagonal runs — positions matter there, so no dedupe/sort.
  */
case class GramKeySeq(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, BooleanType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_key_seq expects (array<string>, int, boolean), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_key_seq"

  override protected def nullSafeEval(toks: Any, n: Any, prod: Any): Any =
    GramKeys.keySeq(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int],
      prod.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n, p) => s"graft.functions.GramKeys.keySeq($t, $n, $p)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): GramKeySeq =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Winnowing anchor selection over an ordered key sequence:
  * `graft_winnow_select(ks, w)` = the sorted distinct minima of every
  * FULL window of w consecutive keys (< w keys → empty). The
  * winnowing guarantee (Schleimer/Wilkerson/Aiken, SIGMOD'03): two
  * docs sharing w consecutive equal keys — i.e. a verbatim token span
  * of ≥ n + w − 1 — share at least one selected VALUE, so matching on
  * selected values is a lossless candidate filter for spans ≥ that
  * bound.
  */
case class WinnowSelect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_winnow_select expects (array<long>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_select"

  override protected def nullSafeEval(ks: Any, w: Any): Any =
    GramKeys.winnowSelect(ks.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (k, w) => s"graft.functions.GramKeys.winnowSelect($k, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowSelect =
    copy(left = newLeft, right = newRight)
}

/** Both per-doc key views in one pass:
  * `graft_dfk_views(dfk)` over an (unordered, distinct) array of
  * (df int, shk long) structs returns
  * struct(ks array<long>, oks array<long>, n int) where `ks` is the
  * keys in numeric order (the [[SortedIntersect]] merge contract) and
  * `oks` the keys in (df, key) ascending — the PPJoin frequency order.
  * Replaces `array_sort(collect_set(struct))` + two HOF `transform`s
  * + a second `array_sort`, all of which run interpreted per doc.
  */
case class DfkViews(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 &&
        fs(0).dataType == IntegerType && fs(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_dfk_views expects array<struct<df int, shk long>>, " +
          s"got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("ks", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("oks", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n", IntegerType, nullable = false)))
  override def prettyName: String = "graft_dfk_views"

  override protected def nullSafeEval(arr: Any): Any =
    GramKeys.dfkViews(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.GramKeys.dfkViews($a)")

  override protected def withNewChildInternal(newChild: Expression): DfkViews =
    copy(child = newChild)
}

/** Intersection SIZE of two SORTED DISTINCT long arrays:
  * `graft_sorted_ix(a, b)` ≡ `size(array_intersect(a, b))` when both
  * inputs are ascending distinct (the [[GramKeys]] contract) — but a
  * two-pointer merge (~100 ns for two ~30-element sets) instead of
  * ArrayIntersect's per-evaluation hash-set build (~2.5 µs measured:
  * the in-bucket verification of the containment chain spent 90+ s of
  * its 131 s sf10 wall in array_intersect before this kernel).
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_ix expects (array<long>, array<long>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_ix"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GramKeys.sortedIx(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GramKeys.sortedIx($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

object GramKeys {

  /** Called from generated code: both key views + the set size from
    * an unordered distinct (df, shk) pair array.
    */
  def dfkViews(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val m = arr.numElements()
    val dfs = new Array[Int](m)
    val shks = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getStruct(i, 2)
      dfs(i) = s.getInt(0)
      shks(i) = s.getLong(1)
      i += 1
    }
    val ks = java.util.Arrays.copyOf(shks, m)
    java.util.Arrays.sort(ks)
    // (df, shk) order without an O(m²) permutation sort: each key's
    // rank in the ascending `ks` (binary search — keys are distinct)
    // preserves signed-long key order in 32 bits, so (df << 32 | rank)
    // sorts as one signed long: df asc (df ≥ 1, never sets the sign
    // bit), then key asc. O(m log m) — long docs carry thousands of
    // distinct shingles.
    val packed = new Array[Long](m)
    i = 0
    while (i < m) {
      val rank = java.util.Arrays.binarySearch(ks, shks(i))
      packed(i) = (dfs(i).toLong << 32) | (rank.toLong & 0xffffffffL)
      i += 1
    }
    java.util.Arrays.sort(packed)
    val oks = new Array[Long](m)
    i = 0
    while (i < m) { oks(i) = ks((packed(i) & 0xffffffffL).toInt); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UnsafeArrayData.fromPrimitiveArray(ks),
        UnsafeArrayData.fromPrimitiveArray(oks), m))
  }

  /** Called from generated code: two-pointer common-element count over
    * ascending distinct arrays.
    */
  def sortedIx(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Spark's `xxhash64(string)` seed. */
  private val XxSeed = 42L

  private val Space = Array(' '.toByte)

  /** Every window key IN WINDOW ORDER (the raw long[] both entry
    * points share). One window = the bytes `concat_ws(" ",
    * slice(toks, w+1, n))` produces (non-null token bytes joined by
    * single spaces, nulls skipped). Empty for n ≤ 0 or short arrays.
    */
  private[functions] def windowKeys(arr: ArrayData, n: Int,
      production: Boolean): Array[Long] = {
    val len = arr.numElements()
    val m = len - n + 1
    if (n <= 0 || m <= 0) return Array.emptyLongArray
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      val s = arr.getUTF8String(i)
      toks(i) = if (s == null) null else s.getBytes
      i += 1
    }
    val out = new Array[Long](m)
    if (production) {
      // xxhash64 needs contiguous bytes: one scratch buffer, reused
      // across windows, grown to the largest window seen.
      var buf = new Array[Byte](64)
      var w = 0
      while (w < m) {
        // a FLAG tracks "no token emitted yet", not p > 0: an EMPTY
        // first token must still force a separator before the next
        // one (concat_ws(" ", "", "a") = " a")
        var need = 0
        var firstTok = true
        var j = w
        while (j < w + n) {
          if (toks(j) != null) {
            if (!firstTok) need += 1
            need += toks(j).length
            firstTok = false
          }
          j += 1
        }
        if (buf.length < need) buf = new Array[Byte](need.max(buf.length * 2))
        var p = 0
        firstTok = true
        j = w
        while (j < w + n) {
          if (toks(j) != null) {
            if (!firstTok) { buf(p) = ' '.toByte; p += 1 }
            System.arraycopy(toks(j), 0, buf, p, toks(j).length)
            p += toks(j).length
            firstTok = false
          }
          j += 1
        }
        out(w) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, p, XxSeed)
        w += 1
      }
    } else {
      val md = digest.get()
      var w = 0
      while (w < m) {
        md.reset()
        var firstTok = true
        var j = w
        while (j < w + n) {
          if (toks(j) != null) {
            if (!firstTok) md.update(Space)
            md.update(toks(j))
            firstTok = false
          }
          j += 1
        }
        val d = md.digest()
        val bits = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        out(w) = bits >>> 4
        w += 1
      }
    }
    out
  }

  /** Sort + in-place dedupe of a scratch array the caller owns. */
  private def sortedDistinct(out: Array[Long]): ArrayData = {
    val m = out.length
    java.util.Arrays.sort(out)
    var uniq = 0
    var r = 0
    while (r < m) {
      if (r == 0 || out(r) != out(r - 1)) { out(uniq) = out(r); uniq += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (uniq == m) out else java.util.Arrays.copyOf(out, uniq))
  }

  /** Called from generated code: SORTED DISTINCT key set — the
    * ascending distinct contract callers rely on both as set semantics
    * and as the PPJoin global order.
    */
  def keys(arr: ArrayData, n: Int, production: Boolean): ArrayData =
    sortedDistinct(windowKeys(arr, n, production))

  /** Called from generated code: every window key in WINDOW ORDER
    * (positional, repeats kept) — the substring-dedup verify side
    * posexplodes this into (pos, key) postings.
    */
  def keySeq(arr: ArrayData, n: Int, production: Boolean): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(windowKeys(arr, n, production))

  /** Called from generated code: winnowing selection over an ORDERED
    * key sequence — the distinct set of minima of every FULL window of
    * `w` consecutive keys (fewer than w keys → empty: such a doc
    * cannot participate in any span the winnow guarantee covers).
    * O(m) via a monotonic deque. The selected VALUES (not positions)
    * are the anchor contract: any two docs sharing w consecutive equal
    * keys share at least one selected value.
    */
  def winnowSelect(arr: ArrayData, w: Int): ArrayData = {
    val m = arr.numElements()
    if (w <= 0 || m < w)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val ks = arr.toLongArray()
    val nOut = m - w + 1
    val out = new Array[Long](nOut)
    // deque of indices with ascending key values; front = window min
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < m) {
      while (tail > head && ks(dq(tail - 1)) >= ks(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = ks(dq(head))
      i += 1
    }
    sortedDistinct(out)
  }
}
