package graft.events

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for [[Events.activeUsers]]: on random event streams the
  * contribution-explode formulation (min-offset tagging, one linear
  * chain) must equal the brute-force definition — DAU(d) = |users with
  * an event on d|, WAU(d) = |users with an event in [d−6, d]| — on
  * shapes the fixture never explores: users active on window
  * boundaries, multiple events per day, gaps longer than a window.
  */
class EngagementPropertySpec extends graft.SparkSpec {

  /** (user, epoch-second) rows over a 21-day span, 6 users. */
  private val evGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(5, 60)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 6L)
      d <- Gen.choose(0L, 20L)
      s <- Gen.choose(0L, 86399L)
    } yield (u, d * 86400L + s))
  } yield rows

  private def samples(count: Int): Seq[Seq[(Long, Long)]] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(23L))(_.next)
      .flatMap(s => evGen.apply(params, s))
      .take(count).toSeq
  }

  test("activeUsers equals the brute-force DAU/WAU reference") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    for (sample <- samples(8)) {
      val df = sample.zipWithIndex
        .map { case ((u, sec), i) => (i.toLong, sec, u) }
        .toDF("event_id", "sec", "user_id")
        .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
          col("user_id"), lit("click").as("event_type"))
      val got = Events.activeUsers(df).collect()
        .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val ud = sample.map { case (u, sec) => (u, sec / 86400L) }.toSet
      val want = ud.map(_._2).toSeq.sorted.map { d =>
        val dau = ud.count(_._2 == d).toLong
        val wau = ud.collect {
          case (u, ad) if ad <= d && ad >= d - 6 => u
        }.size.toLong
        java.time.LocalDate.ofEpochDay(d).toString -> ((dau, wau))
      }.toMap
      assert(got === want,
        s"diverged on events:\n${sample.mkString("\n")}")
    }
  }
}
