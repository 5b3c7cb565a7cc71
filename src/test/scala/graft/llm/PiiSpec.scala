package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "mail me at a.user+tag@sub.example.org or b@x.io thanks"),
    (2L, "call +1-555-042-1234 or (212) 555-9876 today"),
    (3L, "card 4111-1111-1111-1111 and ssn 987-65-4321 leaked"),
    (4L, "server 10.0.3.25 and 192.168.1.1 up; version 1.2 is not an ip"),
    (5L, "perfectly clean text with numbers 12345 and dates 2024-01-01")
  ).toDF("doc_id", "text")

  test("counts per class; clean text counts zero") {
    val out = docs.select(col("doc_id"),
      Pii.emailCount(col("text")).as("e"), Pii.phoneCount(col("text")).as("p"),
      Pii.cardCount(col("text")).as("c"), Pii.ssnCount(col("text")).as("s"),
      Pii.ipv4Count(col("text")).as("i"), Pii.hasPii(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(out(1L) == ((2L, 0L, 0L, 0L, 0L, true)))
    assert(out(2L) == ((0L, 2L, 0L, 0L, 0L, true)))
    assert(out(3L) == ((0L, 0L, 1L, 1L, 0L, true)))
    assert(out(4L) == ((0L, 0L, 0L, 0L, 2L, true)))
    assert(out(5L) == ((0L, 0L, 0L, 0L, 0L, false)))
  }

  test("redact replaces every match with its class token, context intact") {
    val out = docs.select(col("doc_id"), Pii.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail me at [EMAIL] or [EMAIL] thanks")
    assert(out(2L) == "call [PHONE] or [PHONE] today")
    assert(out(3L) == "card [CARD] and ssn [SSN] leaked")
    assert(out(4L) == "server [IP] and [IP] up; version 1.2 is not an ip")
    assert(out(5L) == "perfectly clean text with numbers 12345 and dates 2024-01-01")
  }

  test("no false positives on dates, versions, bare digit runs") {
    val tricky = Seq(
      (1L, "released 2024-01-15, version 10.2.33, build 1234567890123456"),
      (2L, "ratio 1.5.2.9 though IS a dotted quad shape")  // documented: candidate layer
    ).toDF("doc_id", "text")
    val out = tricky.select(col("doc_id"), Pii.hasPii(col("text")).as("h"),
        Pii.ipv4Count(col("text")).as("i"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out(1L) == ((false, 0L)))
    assert(out(2L) == ((true, 1L))) // dotted quad matches by design (no range check)
  }
}
