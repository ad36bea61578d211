package graft

import graft.llm.Pii

class PiiSpec extends SparkTestBase {
  import spark.implicits._

  private def scrub(texts: (Long, String)*) =
    Pii.scrub(texts.toSeq.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4), r.getString(5)))).toMap

  test("emails: plus-addressing, subdomains, multiple per doc") {
    val m = scrub(
      (0L, "write to john.doe+x@mail.example.co.uk now"),
      (1L, "a@b.co and c@d.io"),
      (2L, "no at-sign here"))
    assert(m(0L) === ((1, 0, 0, true, "write to <EMAIL> now")))
    assert(m(1L) === ((2, 0, 0, true, "<EMAIL> and <EMAIL>")))
    assert(m(2L) === ((0, 0, 0, false, "no at-sign here")))
  }

  test("ipv4: dotted quad, and email@host-ip is consumed as an ip") {
    val m = scrub(
      (0L, "server at 192.168.0.1 port 80"),
      // '10.0.0.1' has no alphabetic TLD, so the email pattern does NOT
      // match 'a@10.0.0.1' — the dotted quad is redacted as an IP
      (1L, "mail a@10.0.0.1 fails"),
      (2L, "version 1.2.3 is fine"))
    assert(m(0L) === ((0, 1, 0, true, "server at <IP> port 80")))
    assert(m(1L) === ((0, 1, 0, true, "mail a@<IP> fails")))
    assert(m(2L) === ((0, 0, 0, false, "version 1.2.3 is fine")))
  }

  test("phones: international format with space/dash separators") {
    val m = scrub(
      (0L, "call +1 415-555-0000 today"),
      (1L, "tel +442071234567"),
      (2L, "sum 1+2 is 3"))
    assert(m(0L) === ((0, 0, 1, true, "call <PHONE> today")))
    assert(m(1L) === ((0, 0, 1, true, "tel <PHONE>")))
    assert(m(2L) === ((0, 0, 0, false, "sum 1+2 is 3")))
  }

  test("mixed doc redacts all three with counts over the original text") {
    val m = scrub(
      (0L, "x@y.org from 10.1.1.9 dial +1202555011 end"))
    assert(m(0L) === ((1, 1, 1, true, "<EMAIL> from <IP> dial <PHONE> end")))
  }
}
