package graft.pipeline

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import graft.model.{Address, Domains, Record}
import graft.sources.DataGenerator

/** Byte-parity of `Publisher.serializeGoCompat` against Go's `json.Marshal`
  * of the reference Record (internal/models/record.go:7-34, consumed at
  * handler.go:54).
  *
  * The golden lines below are hand-derived from Go encoding/json's documented
  * semantics — struct-order keys, compact separators, RFC3339 time.Time with
  * the zero fractional second omitted, shortest-round-trip float64 (whole
  * values drop the point), `[]` for non-nil empty slices — NOT from running
  * the Spark code, so the comparison is an independent oracle.
  */
class GoJsonParitySpec extends SparkSpec {

  private def ts(iso: String): Timestamp =
    Timestamp.from(Instant.parse(iso))

  private val full = Record(
    id = "rec-001",
    created_at = ts("2026-01-01T00:00:00Z"),
    updated_at = ts("2026-01-02T03:04:05Z"),
    first_name = "James",
    last_name = "Smith",
    email = "james.smith@example.com",
    phone_number = "+1-303-555-0100",
    date_of_birth = "1987-06-05",
    address = Address("123 Main St", "Springfield", "CA", "90210", "USA"),
    account_type = "premium",
    account_status = "active",
    last_login_date = ts("2025-12-31T23:59:59Z"),
    account_balance = 1234.56,
    language = "en",
    communication_preferences = Seq("email", "sms"),
    newsletter_subscribed = true,
    tags = Seq.empty,
    body = "hello world 42")

  private val goldenFull =
    """{"id":"rec-001","created_at":"2026-01-01T00:00:00Z",""" +
      """"updated_at":"2026-01-02T03:04:05Z","first_name":"James",""" +
      """"last_name":"Smith","email":"james.smith@example.com",""" +
      """"phone_number":"+1-303-555-0100","date_of_birth":"1987-06-05",""" +
      """"address":{"street":"123 Main St","city":"Springfield",""" +
      """"state":"CA","postal_code":"90210","country":"USA"},""" +
      """"account_type":"premium","account_status":"active",""" +
      """"last_login_date":"2025-12-31T23:59:59Z",""" +
      """"account_balance":1234.56,"language":"en",""" +
      """"communication_preferences":["email","sms"],""" +
      """"newsletter_subscribed":true,"tags":[],"body":"hello world 42"}"""

  // Whole-number balance: Go's shortest-round-trip float64 drops the point.
  private val wholeBalance = Record(
    id = "rec-002",
    created_at = ts("2024-02-29T12:00:00Z"),
    updated_at = ts("2024-02-29T12:00:00Z"),
    first_name = "Mary",
    last_name = "Garcia",
    email = "mary.garcia@gmail.com",
    phone_number = "+1-000-001-0002",
    date_of_birth = "1950-01-28",
    address = Address("9999 Oak Ave", "Riverside", "TX", "00001", "USA"),
    account_type = "free",
    account_status = "closed",
    last_login_date = ts("2024-02-01T00:00:01Z"),
    account_balance = 100.0,
    language = "zh",
    communication_preferences = Seq("mail"),
    newsletter_subscribed = false,
    tags = Seq("vip", "beta-tester", "vip"),
    body = "a b c")

  private val goldenWholeBalance =
    """{"id":"rec-002","created_at":"2024-02-29T12:00:00Z",""" +
      """"updated_at":"2024-02-29T12:00:00Z","first_name":"Mary",""" +
      """"last_name":"Garcia","email":"mary.garcia@gmail.com",""" +
      """"phone_number":"+1-000-001-0002","date_of_birth":"1950-01-28",""" +
      """"address":{"street":"9999 Oak Ave","city":"Riverside",""" +
      """"state":"TX","postal_code":"00001","country":"USA"},""" +
      """"account_type":"free","account_status":"closed",""" +
      """"last_login_date":"2024-02-01T00:00:01Z",""" +
      """"account_balance":100,"language":"zh",""" +
      """"communication_preferences":["mail"],""" +
      """"newsletter_subscribed":false,""" +
      """"tags":["vip","beta-tester","vip"],"body":"a b c"}"""

  test("serializeGoCompat matches hand-derived Go json.Marshal goldens") {
    val s = spark
    import s.implicits._
    val out = Publisher
      .serializeGoCompat(Seq(full, wholeBalance).toDS().toDF(), "id")
      .collect().map(m => m.id -> m.body).toMap
    assert(out("rec-001") == goldenFull)
    assert(out("rec-002") == goldenWholeBalance)
  }

  test("generated records satisfy the Go-parity preconditions") {
    val s = spark
    import s.implicits._
    val recs = DataGenerator.generate(s, 200L, seed = 42L).collect()
    // second-resolution timestamps (the seconds-only RFC3339 pattern is
    // exact only then)
    assert(recs.forall(r =>
      r.created_at.getNanos == 0 && r.updated_at.getNanos == 0 &&
        r.last_login_date.getNanos == 0))
    // no Go-HTML-escaped characters (< > &) or JSON-escaped characters
    // (quote, backslash, control) in any string domain, including bodies
    val strings = recs.flatMap(r =>
      Seq(r.id, r.first_name, r.last_name, r.email, r.phone_number,
        r.date_of_birth, r.address.street, r.address.city, r.address.state,
        r.address.postal_code, r.address.country, r.account_type,
        r.account_status, r.language, r.body) ++
        r.communication_preferences ++ r.tags)
    assert(strings.forall(v =>
      !v.exists(c => c == '<' || c == '>' || c == '&' || c == '"' ||
        c == '\\' || c < ' ')))
    // balances carry at most 2 decimals, inside the non-scientific range
    assert(recs.forall(r =>
      r.account_balance >= 0.0 && r.account_balance < 10000.0 &&
        (r.account_balance * 100).round / 100.0 == r.account_balance))
  }

  test("goCompat output round-trips through from_json unchanged") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = DataGenerator.generate(s, 100L, seed = 7L).toDF()
    val schema = df.schema
    val back = Publisher.serializeGoCompat(df, "id")
      .select(from_json(col("body"), schema,
        Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ssXXX",
            "timeZone" -> "UTC")).as("r"))
      .select("r.*")
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}
