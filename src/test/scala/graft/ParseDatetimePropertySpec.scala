package graft

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import graft.functions.BqFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the datetime kernel (SURVEY.md §5): round-trip
  * `parse(format(t)) == truncate(t)` over generated timestamps in each of
  * the five accepted layouts, and fuzzed garbage never parses leniently.
  */
class ParseDatetimePropertySpec extends SparkTestBase {

  /** deterministic sampling: scalacheck Gen driven by a fixed seed. */
  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  import spark.implicits._

  private val genDateTime: Gen[LocalDateTime] = for {
    year <- Gen.choose(1900, 2100)
    month <- Gen.choose(1, 12)
    day <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23)
    m <- Gen.choose(0, 59)
    s <- Gen.choose(0, 59)
    micros <- Gen.choose(0, 999999)
  } yield LocalDateTime.of(year, month, day, h, m, s, micros * 1000)

  /** render layouts index-aligned with BqFunctions.parseDatetimeFormats;
    * each pairs the Java renderer with the truncation the layout implies.
    */
  private val layouts: Seq[(DateTimeFormatter, LocalDateTime => LocalDateTime)] = Seq(
    (DateTimeFormatter.ofPattern("yyyy/MM/dd HH:mm:ss"), _.withNano(0)),
    (DateTimeFormatter.ofPattern("yyyy/MM/dd"), _.toLocalDate.atStartOfDay()),
    (DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"), _.withNano(0)),
    (DateTimeFormatter.ofPattern("yyyy-MM-dd"), _.toLocalDate.atStartOfDay()),
    (DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"), identity)
  )

  test("property: parse(format(t)) truncates exactly per layout, all five arms") {
    val cases = sample(Gen.listOfN(60, Gen.zip(genDateTime, Gen.choose(0, layouts.size - 1))), 42L)
    assert(cases.nonEmpty)
    val rendered = cases.map { case (t, i) =>
      (layouts(i)._1.format(t), layouts(i)._2(t)): (String, LocalDateTime)
    }
    val parsed = rendered.map(_._1).toDF("s")
      .select(BqFunctions.parseDatetime(col("s")).as("t"))
      .collect().map(_.getAs[LocalDateTime]("t"))
    parsed.zip(rendered.map(_._2)).zip(rendered.map(_._1)).foreach {
      case ((got, want), src) => assert(got == want, s"input '$src'")
    }
  }

  test("property: lenient arms return NULL on garbage, never a wrong value") {
    val garbage = sample(Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr.map("x" + _),
      Gen.const("2024-13-45"),          // invalid month/day
      Gen.const("2024/01/01T00:00:00"), // format crossover
      Gen.const("01-01-2024"),          // wrong order
      Gen.const("")
    )), 7L)
    assert(garbage.nonEmpty)
    val arms = BqFunctions.parseDatetimeFormats
    val df = garbage.toDF("s")
    arms.foreach { f =>
      val nonNull = df.select(BqFunctions.safeParseDatetime(col("s"), f).as("t"))
        .where(col("t").isNotNull).count()
      assert(nonNull == 0, s"format $f parsed garbage")
    }
  }

  test("property: fractional-second precision 0..6 digits all parse via %E*S") {
    val cases = sample(Gen.listOfN(50, Gen.zip(Gen.choose(0, 999999), Gen.choose(0, 6))), 11L)
    val inputs = cases.map { case (frac, digits) =>
      val fracStr = if (digits == 0) "" else "." + f"$frac%06d".take(digits)
      val expectMicros =
        if (digits == 0) 0L
        else f"$frac%06d".take(digits).padTo(6, '0').toLong
      (s"2024-03-05T10:20:30${fracStr}Z", expectMicros)
    }
    val got = inputs.map(_._1).toDF("s")
      .select(BqFunctions.safeParseDatetime(col("s"), "%Y-%m-%dT%H:%M:%E*SZ").as("t"))
      .collect().map(_.getAs[LocalDateTime]("t"))
    got.zip(inputs).foreach { case (t, (src, micros)) =>
      assert(t != null && t.getNano / 1000L == micros, s"input '$src'")
    }
  }
}
