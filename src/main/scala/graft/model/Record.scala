package graft.model

import java.sql.Timestamp

/** Nested address group of the reference's one table.
  * Reference: internal/models/record.go:38-44.
  */
case class Address(
    street: String,
    city: String,
    state: String,
    postal_code: String,
    country: String)

/** The reference's `Record` schema (internal/models/record.go:6-35), field
  * names matching its `parquet:`/`json:` tags exactly so `to_json(struct(*))`
  * reproduces the Go `json.Marshal` key set. `date_of_birth` stays a STRING
  * (the reference keeps dates as "YYYY-MM-DD" strings — record.go:16).
  */
case class Record(
    id: String,
    created_at: Timestamp,
    updated_at: Timestamp,
    first_name: String,
    last_name: String,
    email: String,
    phone_number: String,
    date_of_birth: String,
    address: Address,
    account_type: String,
    account_status: String,
    last_login_date: Timestamp,
    account_balance: Double,
    language: String,
    communication_preferences: Seq[String],
    newsletter_subscribed: Boolean,
    tags: Seq[String],
    body: String)

/** Value domains of the synthetic generator.
  * Reference: cmd/create-test-data/main.go:24-35.
  */
object Domains {
  val languages: Seq[String] =
    Seq("en", "es", "fr", "de", "it", "pt", "ja", "zh")
  val accountTypes: Seq[String] =
    Seq("free", "basic", "premium", "enterprise")
  val accountStatuses: Seq[String] =
    Seq("active", "suspended", "pending", "closed")
  val firstNames: Seq[String] =
    Seq("James", "Mary", "John", "Patricia", "Robert",
        "Jennifer", "Michael", "Linda", "William", "Elizabeth")
  val lastNames: Seq[String] =
    Seq("Smith", "Johnson", "Williams", "Brown", "Jones",
        "Garcia", "Miller", "Davis", "Rodriguez", "Martinez")
  val emailDomains: Seq[String] =
    Seq("gmail.com", "yahoo.com", "hotmail.com", "outlook.com", "example.com")
  val streets: Seq[String] =
    Seq("Main St", "Oak Ave", "Maple Dr", "Cedar Ln", "Pine Rd")
  val cities: Seq[String] =
    Seq("Springfield", "Riverside", "Fairview", "Franklin", "Clinton")
  val states: Seq[String] = Seq("CA", "TX", "NY", "FL", "IL")
  val countries: Seq[String] = Seq("USA")
  val commPrefs: Seq[String] = Seq("email", "sms", "phone", "mail")
  val tagPool: Seq[String] =
    Seq("vip", "beta-tester", "early-adopter", "newsletter", "promo")
  /** 63-char body charset (letters + digits + space) —
    * cmd/create-test-data/main.go:171.
    */
  val bodyCharset: String =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
  val bodyLength: Int = 1000
}
