package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Redaction.redact(col("t"))).head().getString(0)

  test("each category masks and the rest of the text survives") {
    assert(redactOne("mail me at jo.doe+x@some-host.org today") ==
      "mail me at [EMAIL] today")
    assert(redactOne("see http://ex.com/a?b=1 and https://ex.org/z") ==
      "see [URL] and [URL]")
    assert(redactOne("host 192.168.0.1 gateway 10.0.0.254") ==
      "host [IP] gateway [IP]")
    assert(redactOne("call 303-555-0042 now") == "call [PHONE] now")
  }

  test("a URL embedding an email or dotted quad is masked as ONE url") {
    assert(redactOne("x http://u.com/a@b.co/10.1.2.3 y") == "x [URL] y")
  }

  test("boundaries: version strings and long digit runs are not PII") {
    // 1.2.3 (three octets) is not an IP; 1234-567-8901 fails the \b{3} form.
    assert(redactOne("v1.2.3 built 2026") == "v1.2.3 built 2026")
    assert(redactOne("id 1234-567-8901") == "id 1234-567-8901")
  }

  test("counts match the masks that fire") {
    val df = Seq("a@b.co or c@d.org at 1.2.3.4 via http://x.io")
      .toDF("t")
      .select(
        Redaction.countOf(col("t"), Redaction.emailRe).as("e"),
        Redaction.countOf(col("t"), Redaction.ipRe).as("i"),
        Redaction.countOf(col("t"), Redaction.urlRe).as("u"),
        Redaction.countOf(col("t"), Redaction.phoneRe).as("p"))
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 0L)))
  }
}
