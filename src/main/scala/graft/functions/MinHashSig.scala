package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** MinHash signature straight off the token array:
  * `graft_minhash(toks, n, k, production)` = array of the k affine
  * minima h_i = min over word-n-grams of (a_i·base28(gram) + b_i) mod
  * P, or NULL when the doc has fewer than n tokens (the column chain
  * emits no signature row for those — callers filter the NULLs to keep
  * that contract).
  *
  * The column chain explodes one row per shingle and funnels 16 min
  * aggregates through a doc_id exchange; like [[Simhash]], this kernel
  * folds the minima per document in ONE narrow map — no explode, no
  * aggregate, no corpus shuffle in the signature stage. Gram bytes
  * assemble in a reused buffer exactly as `concat_ws(" ", window)`
  * would (nulls skipped, single-space joins, all-null windows hash the
  * empty string), so signatures are bit-identical to the chain in both
  * hash modes (DedupSpec pins it; StreamingNearDup.sigOf is the
  * per-string scalar twin of the same arithmetic).
  *
  * Hash modes ([[PortableHash]] scope): production=false → base28 =
  * top 28 bits of md5 ([[Md5Prefix64]]); true → xxhash64 (seed 42)
  * mod 2^28. Coefficients are the canonical md5-seeded family
  * ([[MinHashSig.coeffs]] — [[graft.dedup.Dedup.minHashCoeffs]]
  * delegates here).
  */
case class MinHashSig(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType, BooleanType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<string>, int, int, boolean), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString}, " +
          s"${d.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val toks = first.eval(input)
    val n = second.eval(input)
    val k = third.eval(input)
    val production = fourth.eval(input)
    if (toks == null || n == null || k == null || production == null) null
    else MinHashSig.sig(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int],
      k.asInstanceOf[Int], production.asInstanceOf[Boolean])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n, k, p) =>
      s"graft.functions.MinHashSig.sig($t, $n, $k, $p)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): MinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object MinHashSig {

  val P = 2147483647L
  private val XxSeed = 42L

  /** The canonical md5-seeded affine coefficient family: a_i ∈ [1, P−1],
    * b_i ∈ [0, P−1] from the first 4 digest bytes of "a$i"/"b$i". One
    * derivation, shared by the batch chain, this kernel, and the
    * streaming scalar twin.
    */
  def coeffs(k: Int): IndexedSeq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long =
      md.digest(s.getBytes("UTF-8")).take(4)
        .foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    (0 until k).map(i => (h(s"a$i") % (P - 1) + 1, h(s"b$i") % P))
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // per-thread reusable gram buffer (grams are short; grown on demand)
  private val buffer = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  /** Flattened (a0, b0, a1, b1, …) coefficient array for hash count k. */
  private def flatCoeffs(k: Int): Array[Long] =
    coeffCache.computeIfAbsent(k, kk => {
      val cs = coeffs(kk)
      val flat = new Array[Long](kk * 2)
      var i = 0
      while (i < kk) {
        flat(2 * i) = cs(i)._1; flat(2 * i + 1) = cs(i)._2; i += 1
      }
      flat
    })

  /** Called from generated code. */
  def sig(arr: ArrayData, n: Int, k: Int, production: Boolean): ArrayData = {
    val len = arr.numElements()
    val m = len - n + 1
    if (n <= 0 || k <= 0 || m <= 0) return null
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      val s = arr.getUTF8String(i)
      toks(i) = if (s == null) null else s.getBytes
      i += 1
    }
    val cs = flatCoeffs(k)
    val md = digest.get()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var buf = buffer.get()
    var w = 0
    while (w < m) {
      // assemble the gram bytes concat_ws-style into the reused buffer
      var blen = 0
      var first = true
      var j = w
      while (j < w + n) {
        val t = toks(j)
        if (t != null) {
          val need = blen + t.length + 1
          if (need > buf.length) {
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
            buffer.set(buf)
          }
          if (!first) { buf(blen) = ' '.toByte; blen += 1 }
          System.arraycopy(t, 0, buf, blen, t.length); blen += t.length
          first = false
        }
        j += 1
      }
      val base =
        if (production) {
          val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET,
            blen, XxSeed)
          ((h % (1L << 28)) + (1L << 28)) % (1L << 28)
        } else {
          md.reset()
          md.update(buf, 0, blen)
          val d = md.digest()
          (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 36
        }
      var c = 0
      while (c < k) {
        val h = (cs(2 * c) * base + cs(2 * c + 1)) % P
        if (h < mins(c)) mins(c) = h
        c += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}
