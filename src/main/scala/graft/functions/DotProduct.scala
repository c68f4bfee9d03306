package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, transform}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two double arrays, with codegen.
  *
  * This is the engine's one custom `Expression` (SURVEY §7.5 policy:
  * custom Catalyst only where it pays). The higher-order-function form —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — materializes the products
  * array per row and walks two lambda interpreters; this expression is a
  * single fused loop inside whole-stage codegen. Same IEEE-754 operation
  * order (in-order left fold from +0.0), so for EQUAL-LENGTH inputs the
  * result is bit-identical to the HOF form and to the DuckDB oracle's
  * list_transform/list_reduce. Mismatched lengths yield NULL — a
  * dimension mismatch is a data bug that must surface as a visible null
  * (as the HOF form's zip_with null-tail does), never as a silently
  * truncated score.
  *
  * Precondition: array elements are non-null (embedding vectors). Null
  * ARRAYS null-propagate normally via BinaryExpression.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // Length mismatch produces null even from non-nullable children.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column-API form of [[DotProduct]]: resolves through the function
    * registry (register via [[GraftExtensions]] at session build), so it
    * uses only public Spark API. Strictly typed: pass array<double>
    * (cast float embeddings first, as [[graft.sim.Similarity]] does).
    */
  def graftDot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Column-API form of [[PqEncode]]: codebook/norms must be literal
    * (foldable) columns — a trained codebook is a driver constant.
    */
  def graftPqEncode(vec: Column, codebook: Column, norms: Column): Column =
    call_function("graft_pq_encode", vec, codebook, norms)

  /** Column-API form of [[PqLut]]: codebook must be a literal. */
  def graftPqLut(vec: Column, codebook: Column): Column =
    call_function("graft_pq_lut", vec, codebook)

  /** Column-API form of [[Md5Prefix64]]. */
  def graftMd5Bits(c: Column): Column =
    call_function("graft_md5_bits", c)

  /** Column-API form of [[PortableLog2]]. */
  def graftLog2(c: Column): Column =
    call_function("graft_log2", c)

  /** Column-API form of [[RunStats]]. */
  def graftRunStats(c: Column): Column =
    call_function("graft_run_stats", c)

  /** Column-API form of [[GramStats]]. */
  def graftGramStats(toks: Column, n: Column): Column =
    call_function("graft_gram_stats", toks, n)

  /** Column-API form of [[Winnow]]. */
  def graftWinnow(shingles: Column, k: Column): Column =
    call_function("graft_winnow", shingles, k)

  /** Column-API form of [[WinnowGrams]]. */
  def graftWinnowGrams(toks: Column, n: Column, k: Column): Column =
    call_function("graft_winnow_grams", toks, n, k)

  /** Column-API form of [[PiiScan]]. */
  def graftPiiScan(text: Column): Column =
    call_function("graft_pii_scan", text)

  /** Column-API form of [[QualityStats]]. */
  def graftQualityStats(text: Column, stopwords: Column): Column =
    call_function("graft_quality_stats", text, stopwords)

  /** Column-API form of [[LangId]]. */
  def graftLangId(text: Column, markers: Column): Column =
    call_function("graft_lang_id", text, markers)

  /** Column-API form of [[RegexCount]]. */
  def graftRegexCount(text: Column, pattern: Column): Column =
    call_function("graft_regex_count", text, pattern)

  /** Column-API form of [[BpeishCount]]. */
  def graftBpeishCount(text: Column): Column =
    call_function("graft_bpeish_count", text)

  /** Column-API form of [[Simhash]]. */
  def graftSimhash(toks: Column, production: Column): Column =
    call_function("graft_simhash", toks, production)

  /** Column-API form of [[MinHashSig]]. */
  def graftMinhash(toks: Column, n: Column, k: Column,
      production: Column): Column =
    call_function("graft_minhash", toks, n, k, production)

  /** Spark's native `BloomFilterAggregate` (the engine behind runtime
    * join pruning), surfaced through the registry because core leaves
    * it SQL-unregistered: builds a bloom sketch (binary) over a LONG
    * key column. `est` bounds the expected distinct keys, `bits` the
    * sketch size — ~10 bits/key ≈ 1% false-positive rate.
    */
  def graftBloomAgg(key: Column, est: Column, bits: Column): Column =
    call_function("graft_bloom_agg", key, est, bits)

  /** Spark's native `BloomFilterMightContain` over a bloom sketch
    * (binary, must be foldable — a collected side input) and a LONG
    * key: false ⇒ definitely absent, true ⇒ verify exactly.
    */
  def graftMightContain(bloom: Column, key: Column): Column =
    call_function("graft_might_contain", bloom, key)
}

/** Function injection: add `.withExtensions(new GraftExtensions)` to the
  * session builder, or `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_byte_stride"),
        new ExpressionInfo(classOf[ByteStride].getName, "graft_byte_stride"),
        (children: Seq[Expression]) => ByteStride(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_pq_encode"),
        new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
        (children: Seq[Expression]) =>
          PqEncode(children(0), children(1), children(2))))
    ext.injectFunction(
      (FunctionIdentifier("graft_pq_lut"),
        new ExpressionInfo(classOf[PqLut].getName, "graft_pq_lut"),
        (children: Seq[Expression]) => PqLut(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_md5_bits"),
        new ExpressionInfo(classOf[Md5Prefix64].getName, "graft_md5_bits"),
        (children: Seq[Expression]) => Md5Prefix64(children.head)))
    ext.injectFunction(
      (FunctionIdentifier("graft_log2"),
        new ExpressionInfo(classOf[PortableLog2].getName, "graft_log2"),
        (children: Seq[Expression]) => PortableLog2(children.head)))
    ext.injectFunction(
      (FunctionIdentifier("graft_run_stats"),
        new ExpressionInfo(classOf[RunStats].getName, "graft_run_stats"),
        (children: Seq[Expression]) => RunStats(children.head)))
    ext.injectFunction(
      (FunctionIdentifier("graft_gram_stats"),
        new ExpressionInfo(classOf[GramStats].getName, "graft_gram_stats"),
        (children: Seq[Expression]) => GramStats(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_winnow"),
        new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
        (children: Seq[Expression]) => Winnow(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_winnow_grams"),
        new ExpressionInfo(classOf[WinnowGrams].getName, "graft_winnow_grams"),
        (children: Seq[Expression]) =>
          WinnowGrams(children(0), children(1), children(2))))
    ext.injectFunction(
      (FunctionIdentifier("graft_pii_scan"),
        new ExpressionInfo(classOf[PiiScan].getName, "graft_pii_scan"),
        (children: Seq[Expression]) => PiiScan(children.head)))
    ext.injectFunction(
      (FunctionIdentifier("graft_quality_stats"),
        new ExpressionInfo(classOf[QualityStats].getName, "graft_quality_stats"),
        (children: Seq[Expression]) =>
          QualityStats(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_lang_id"),
        new ExpressionInfo(classOf[LangId].getName, "graft_lang_id"),
        (children: Seq[Expression]) => LangId(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_regex_count"),
        new ExpressionInfo(classOf[RegexCount].getName, "graft_regex_count"),
        (children: Seq[Expression]) =>
          RegexCount(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_bpeish_count"),
        new ExpressionInfo(classOf[BpeishCount].getName, "graft_bpeish_count"),
        (children: Seq[Expression]) => BpeishCount(children.head)))
    ext.injectFunction(
      (FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(classOf[Simhash].getName, "graft_simhash"),
        (children: Seq[Expression]) => Simhash(children(0), children(1))))
    ext.injectFunction(
      (FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
        (children: Seq[Expression]) =>
          MinHashSig(children(0), children(1), children(2), children(3))))
    // Spark-native bloom expressions (used for runtime join pruning
    // internally) that core does not expose in the SQL registry.
    ext.injectFunction(
      (FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
          "graft_bloom_agg"),
        (children: Seq[Expression]) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            children(0), children(1), children(2))))
    ext.injectFunction(
      (FunctionIdentifier("graft_might_contain"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
          "graft_might_contain"),
        (children: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            children(0), children(1))))
  }
}
