package graft

import org.apache.spark.sql.functions._

/** Exercises text_pii_scrub's match path directly — the synthetic corpus
  * contains no PII-shaped spans, so the oracle check only proves the
  * no-op case; this spec proves redaction on strings that do match.
  */
class TextPiiSpec extends SparkTestBase {

  import spark.implicits._

  private val emailRe = graft.queries.TextQueries.PiiEmailRe
  private val phoneRe = graft.queries.TextQueries.PiiPhoneRe

  test("emails and phones are counted and redacted; clean text is untouched") {
    val rows = Seq(
      ("reach me at jo.doe+spam@example.co.uk or 555-123-4567 ok", 1L, 1L),
      ("two mails: a@b.io c.d@e-f.org; two phones 111.222.3333 999-888-7777", 2L, 2L),
      ("no pii here, just words and 12345 numbers", 0L, 0L),
      // a phone-shaped span inside an email local-part is ONE email, zero
      // phones — the email scrub consumes it before phones are counted
      ("ping 555-123-4567@mail.example.com today", 1L, 0L)
    ).toDF("text", "want_emails", "want_phones")
      .select(col("*"),
              regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
              regexp_replace(col("text"), emailRe, "<EMAIL>").as("t1"))
      .select(col("*"),
              regexp_count(col("t1"), lit(phoneRe)).cast("long").as("n_phones"),
              regexp_replace(col("t1"), phoneRe, "<PHONE>").as("scrubbed"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") == r.getAs[Long]("want_emails"), r.getAs[String]("text"))
      assert(r.getAs[Long]("n_phones") == r.getAs[Long]("want_phones"), r.getAs[String]("text"))
      val s = r.getAs[String]("scrubbed")
      assert(!s.matches(s".*$emailRe.*") && !s.matches(s".*$phoneRe.*"), s)
    }
    val scrubbed = rows.map(_.getAs[String]("scrubbed"))
    assert(scrubbed(0) == "reach me at <EMAIL> or <PHONE> ok")
    assert(scrubbed(2) == "no pii here, just words and 12345 numbers")
  }
}
