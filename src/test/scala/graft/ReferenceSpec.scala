package graft

import graft.operators.Reference
import java.nio.file.Files

/** L1 reference-parity semantics (SURVEY.md §2 O1–O8, §2.1 fixes). */
class ReferenceSpec extends SparkSpec {

  private def fixture(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-ref").toFile
    val f = new java.io.File(dir, "txns.json")
    Files.write(f.toPath, lines.mkString("\n").getBytes("UTF-8"))
    f.getAbsolutePath
  }

  private val good = Seq(
    """{"transaction_id":"aaa-1","user_id":1001,"amount":250.75,"currency":"USD","type":"credit","metadata":{"merchant":"Amazon"},"timestamp":"2025-08-27T10:00:00.000001Z"}""",
    """{"transaction_id":"bbb-2","user_id":1002,"amount":88.10,"currency":"EUR","type":"debit","metadata":{"merchant":"Spotify"},"timestamp":"2025-08-27T10:30:00.000002Z"}""",
    """{"transaction_id":"aaa-1","user_id":1001,"amount":250.75,"currency":"USD","type":"credit","metadata":{"merchant":"Amazon"},"timestamp":"2025-08-27T10:00:00.000001Z"}""")
  private val corrupt = """{"transaction_id": BROKEN"""

  test("O1 seed: 3 typed rows") {
    assert(Reference.seed(spark).count() === 3)
  }

  test("O7 drop-malformed mode drops the corrupt record (Go semantics)") {
    val df = Reference.readJson(spark, fixture(good :+ corrupt))
    assert(df.count() === 3)
  }

  test("O7 failfast mode raises on the corrupt record (Rust semantics)") {
    val df = Reference.readJson(spark, fixture(good :+ corrupt), dropMalformed = false)
    intercept[Exception] { df.count() }
  }

  test("O7 parses the RFC3339 microsecond timestamp") {
    val df = Reference.readJson(spark, fixture(good))
    val ts = df.filter(org.apache.spark.sql.functions.col("transaction_id") === "bbb-2")
      .select("timestamp").collect().head.getTimestamp(0)
    assert(ts.toInstant.toString === "2025-08-27T10:30:00.000002Z")
  }

  test("O3 lookup by id returns first match only; missing id returns empty (fixed §2.1.1)") {
    val df = Reference.readJson(spark, fixture(good))
    assert(Reference.lookupById(df, "aaa-1").count() === 1)
    assert(Reference.lookupById(df, "zzz-404").count() === 0)
  }

  test("O5 ingest accepts duplicate ids (reference semantics §2.1.5); dedup is opt-in") {
    val df = Reference.readJson(spark, fixture(good))
    val more = Reference.readJson(spark, fixture(good.take(1)))
    val all = Reference.ingest(df, more)
    assert(all.count() === 4)
    assert(Reference.dedupById(all).count() === 2)
  }

  test("O8 JSON sink round-trips") {
    val df = Reference.readJson(spark, fixture(good.take(1)))
    val line = Reference.toJsonLines(df).collect().head
    assert(line.contains("\"transaction_id\":\"aaa-1\"") && line.contains("\"amount\":250.75"))
  }

  test("metadata map access extracts the merchant key") {
    val df = Reference.readJson(spark, fixture(good))
    val ms = Reference.merchant(df).select("merchant").collect().map(_.getString(0)).toSet
    assert(ms === Set("Amazon", "Spotify"))
  }

  test("§1.3 metadata duality: nested Rust-style metadata survives in metadata_json (main.rs:13)") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val nested =
      """{"transaction_id":"ccc-3","user_id":1003,"amount":10.0,"currency":"USD","type":"credit","metadata":{"merchant":"Amazon","risk":{"score":0.93,"rules":["velocity","geo"]}},"timestamp":"2025-08-27T12:00:00.000003Z"}"""
    val df = Reference.readJson(spark, fixture(good :+ nested))
    // the nested-metadata row is NOT dropped or mangled (Rust serde_json::Value parity)
    assert(df.count() === 4)
    val row = df.filter(col("transaction_id") === "ccc-3")
      .select("metadata_json").collect().head.getString(0)
    assert(row.contains("\"risk\""))
    // raw-JSON path access reaches the nested structure
    val rule = df.filter(col("transaction_id") === "ccc-3")
      .select(get_json_object(col("metadata_json"), "$.risk.rules[1]"))
      .collect().head.getString(0)
    assert(rule === "geo")
    // the Go map view still works on the same row: flat keys as strings,
    // nested values as their raw JSON text
    val m = df.filter(col("transaction_id") === "ccc-3")
      .select("metadata").collect().head.getMap[String, String](0)
    assert(m("merchant") === "Amazon")
    assert(m("risk").contains("\"score\""))
  }

  test("§1.3 both metadata columns coexist on flat Go-style records") {
    val df = Reference.readJson(spark, fixture(good))
    val r = df.filter(org.apache.spark.sql.functions.col("transaction_id") === "bbb-2")
      .select("metadata_json", "metadata").collect().head
    assert(r.getString(0).contains("\"merchant\""))
    assert(r.getMap[String, String](1)("merchant") === "Spotify")
  }
}
