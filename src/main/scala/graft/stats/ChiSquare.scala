package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pearson χ² for a 2×2 contingency table, as pure column arithmetic
  * (SURVEY §2.5 A1–A2).
  *
  * Formula (reference /root/reference/chi_square.py:68–78):
  *   denom = (A+B)(A+C)(B+D)(C+D);  χ² = 0 if denom == 0
  *   else N·(AD−BC)² / denom
  *
  * All operands are cast to double FIRST: the reference's Python ints are
  * arbitrary-precision, but N·(AD−BC)² overflows int64 already around
  * N ≈ 10⁵ (SURVEY A2) — at 100 TB scale long arithmetic is simply wrong.
  * Double matches Python's float-division result.
  *
  * The expression shape `n * diff * diff / denom` is mirrored verbatim in
  * the DuckDB oracle SQL so the IEEE-754 operation order (and therefore
  * the bits of the result) is identical in both engines.
  *
  * No UDF, no custom Expression: this stays inside whole-stage codegen.
  */
object ChiSquare {

  def chi2(aL: Column, bL: Column, cL: Column, dL: Column, nL: Column): Column = {
    val a = aL.cast("double"); val b = bL.cast("double")
    val c = cL.cast("double"); val d = dL.cast("double")
    val n = nL.cast("double")
    val denom = (a + b) * (a + c) * (b + d) * (c + d)
    val diff = a * d - b * c
    when(denom === 0.0, 0.0).otherwise(n * diff * diff / denom)
  }

  /** The identical formula as a DuckDB SQL fragment (operand names must be
    * columns a, b, c, d, n already in scope). Kept next to the Scala form
    * so the two can never drift apart silently.
    */
  val chi2Sql: String =
    "CASE WHEN (CAST(a AS DOUBLE)+b)*(CAST(a AS DOUBLE)+c)*(CAST(b AS DOUBLE)+d)*(CAST(c AS DOUBLE)+d) = 0 THEN 0.0 " +
      "ELSE CAST(n AS DOUBLE) * (CAST(a AS DOUBLE)*d - CAST(b AS DOUBLE)*c) * (CAST(a AS DOUBLE)*d - CAST(b AS DOUBLE)*c) " +
      "/ ((CAST(a AS DOUBLE)+b)*(CAST(a AS DOUBLE)+c)*(CAST(b AS DOUBLE)+d)*(CAST(c AS DOUBLE)+d)) END"
}
