package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's two hash modes for candidate-generation keys:
  *
  *  - **oracle** (default): md5-derived integers. md5 is the one hash
  *    with identical output in Spark and DuckDB, so every query stays
  *    under the driver's exact-match correctness gate.
  *  - **production** (`spark.graft.productionHash=true`): xxhash64 —
  *    Spark-native, codegen'd, no string hex round-trip; the right
  *    choice on a real cluster where no cross-engine oracle is in the
  *    loop. Plan SHAPES are identical in both modes (pinned by
  *    ProductionHashSpec) — only the hash expression inside the
  *    projection changes, so every scale property (bucketing, caps,
  *    partial aggregation) carries over verbatim.
  *
  * SCOPE: the flag covers candidate-generation and bucketing hashes
  * (MinHash base, Jaccard shingle keys, SimHash bits, split buckets),
  * where a collision only perturbs candidate quality. It deliberately
  * does NOT cover exact-dedup identity (`sha2(text, 256)` stays):
  * 64-bit identity at 10^10 documents makes birthday collisions an
  * expected event, and exact dedup would silently drop distinct
  * documents — cryptographic width is correctness there, not cost.
  */
object PortableHash {

  val ConfKey = "spark.graft.productionHash"

  /** Mode is read from the owning session's runtime conf, so a user
    * flips it per-session (or per-run via `--conf`) without touching
    * query code.
    */
  def enabled(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ConfKey, "false").toBoolean

  /** 28-bit non-negative base hash of a string column. The 2^28 bound
    * is load-bearing for MinHash's affine transforms: a·base + b with
    * a,b < 2^31 stays under 2^59 — no int64 overflow (DuckDB errors on
    * overflow rather than wrapping, and Spark would silently wrap).
    *
    * Oracle mode: the top 28 bits of [[Md5Prefix64]] — bit-identical to
    * the `conv(substring(md5(c), 1, 7), 16, 10)` hex-digit formulation
    * the DuckDB oracle computes (7 hex digits ARE the top 28 bits), but
    * one codegen'd digest + shift instead of a hex-string round trip
    * (Md5Prefix64Spec pins the equivalence).
    */
  def base28(c: Column, production: Boolean): Column =
    if (production) pmod(xxhash64(c), lit(1L << 28))
    else shiftrightunsigned(GraftFunctions.graftMd5Bits(c), 36)

  /** Wide join/bucket key of a string column: 60 bits in oracle mode
    * (15 hex digits — the widest md5 prefix that converts exactly —
    * ≡ the top 60 bits of [[Md5Prefix64]]), the full signed 64 bits in
    * production mode.
    */
  def key64(c: Column, production: Boolean): Column =
    if (production) xxhash64(c)
    else shiftrightunsigned(GraftFunctions.graftMd5Bits(c), 4)
}
