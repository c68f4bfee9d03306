package graft.functions

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  test("native expression is bit-identical to the HOF formulation") {
    val both = vecs.select(
      Similarity.dot(col("v"), col("v")).as("native"),
      Similarity.dotHof(col("v"), col("v")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // and on cross pairs, not just self-dot
    val a = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("ai"), col("v").as("av"))
    val pairs = vecs.filter(col("vec_id") < 20).crossJoin(broadcast(a))
    assert(pairs.select(
      Similarity.dot(col("av"), col("v")).as("n"),
      Similarity.dotHof(col("av"), col("v")).as("h"))
      .filter(col("n") =!= col("h")).count() === 0)
  }

  test("SQL registration via extensions: graft_dot callable from SQL text") {
    vecs.createOrReplaceTempView("dot_vecs")
    val r = spark.sql(
      """SELECT vec_id, graft_dot(v, v) AS d FROM dot_vecs
        |ORDER BY vec_id LIMIT 3""".stripMargin).collect()
    val want = vecs.orderBy("vec_id").limit(3)
      .select(Similarity.dotHof(col("v"), col("v"))).collect()
    assert(r.map(_.getDouble(1)).toSeq === want.map(_.getDouble(0)).toSeq)
  }

  test("null array null-propagates; interpreted eval matches codegen") {
    val df = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS b""".stripMargin)
    val row = df.collect().head
    assert(row.isNullAt(0))
    assert(row.getDouble(1) === 11.0)
    // interpreted path (no codegen): direct eval of the expression
    val expr = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(expr.eval(null) === 11.0)
  }

  test("mismatched array lengths yield NULL, not a truncated score") {
    // codegen path
    val row = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d)) AS m,
        |       graft_dot(CAST(array() AS ARRAY<DOUBLE>),
        |                 CAST(array() AS ARRAY<DOUBLE>)) AS e""".stripMargin)
      .collect().head
    assert(row.isNullAt(0))
    assert(row.getDouble(1) === 0.0) // equal (empty) lengths are fine
    // interpreted path
    def lit(xs: Array[Double]) =
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        xs, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))
    assert(DotProduct(lit(Array(1.0, 2.0, 3.0)), lit(Array(1.0, 2.0)))
      .eval(null) == null)
  }

  test("similarity queries still oracle-shaped after the swap (spot check)") {
    val got = Similarity.queries("sim_cosine_topk")(spark, dir)
    assert(got.count() === Similarity.NumQueries.toLong * Similarity.TopK)
  }
}
