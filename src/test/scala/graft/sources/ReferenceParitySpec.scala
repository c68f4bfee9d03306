package graft.sources

import graft.SparkSpec
import graft.pipeline.ChiSquarePipeline
import java.nio.file.Files

/** End-to-end parity with the reference's I/O contract: JSONL in
  * (malformed lines and empty fields skipped), stopwords side file
  * (lowercased on load), `<category> term:chi2 …` + dictionary text out.
  */
class ReferenceParitySpec extends SparkSpec {

  private def writeTemp(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-parity")
    val f = dir.resolve(name)
    Files.write(f, String.join("\n", lines: _*).getBytes("UTF-8"))
    f.toString
  }

  test("JSONL scan drops malformed lines; admission drops empty fields") {
    val path = writeTemp("reviews.jsonl", Seq(
      """{"reviewText": "apple banana", "category": "X"}""",
      """this is not json at all {{{""",
      """{"reviewText": "", "category": "X"}""",
      """{"reviewText": "cherry", "category": ""}""",
      """{"category": "X"}""",
      """{"reviewText": "cherry date", "category": "Y", "extra": 42}"""))
    val raw = ReviewSource.readReviews(spark, path)
    assert(raw.columns.toSeq === Seq("reviewText", "category"))
    // malformed line gone at scan level
    assert(raw.count() === 5)
    val admitted = graft.text.Tokenize.admitted_docs(raw, "reviewText", "category")
    // D4: empty text, empty category, missing text all skipped
    assert(admitted.count() === 2)
  }

  test("stopwords file is lowercased, trimmed, deduplicated on load") {
    val path = writeTemp("stop.txt", Seq("The", " AND ", "the", "", "of"))
    assert(ReviewSource.loadStopwords(spark, path).sorted === Seq("and", "of", "the"))
  }

  test("CLI pipeline reproduces the golden micro-corpus text output") {
    val input = writeTemp("golden.jsonl", Seq(
      """{"reviewText": "apple banana", "category": "X"}""",
      """{"reviewText": "apple", "category": "X"}""",
      """{"reviewText": "banana", "category": "Y"}""",
      """{"reviewText": "cherry", "category": "Y"}"""))
    val outDir = Files.createTempDirectory("graft-out").resolve("res").toString

    val reviews = ReviewSource.readReviews(spark, input)
    val top = ChiSquarePipeline.topTerms(
      reviews, "reviewText", "category", k = 75, stopwords = Seq.empty)
    ChiSquarePipeline.formattedLines(top)(spark)
      .coalesce(1).write.mode("overwrite").text(outDir)

    val lines = spark.read.textFile(outDir).collect().toSeq
    // FIXTURES.md §2 hand-verified values: apple/X χ²=4, banana 0 both,
    // cherry/Y χ² = 4·(1·2−0·1)²/(1·2·2·3) = 16/12 = 4/3; A=0 pairs
    // (apple/Y, cherry/X) never emitted; dictionary line last, sorted.
    assert(lines === Seq(
      "X apple:4.000000 banana:0.000000",
      "Y cherry:1.333333 banana:0.000000",
      "apple banana cherry"))
  }
}
