package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference system's transaction record.
  *
  * Canonical union of the two divergent declarations in the reference
  * (Go `user-service/main.go:10-18`, Rust `monitoring-service/src/main.rs:8-15`
  * — see SURVEY.md §1.2): `type` is nullable because the Rust service's
  * serde model silently drops it; `metadata` is the Go string→string map
  * and `metadata_json` carries the raw JSON for the Rust arbitrary-value
  * form. `amount` stays Double, faithful to both services' f64.
  */
case class Transaction(
    transaction_id: String,
    user_id: Int,
    amount: Double,
    currency: String,
    `type`: Option[String],
    metadata: Option[Map[String, String]],
    metadata_json: Option[String],
    timestamp: java.sql.Timestamp)

/** L1 reference-parity surface (SURVEY.md §2 O1–O8), re-expressed as
  * Dataset/DataFrame operators. Each method is schema-parametric where
  * the reference hard-wires its single in-memory store.
  */
object Reference {

  /** JSON wire schema of the reference fixtures
    * (`mock_transactions.json`), timestamp still a string at this layer
    * — the reference never parses it (`main.go:17`). `metadata` is read
    * as its RAW JSON TEXT (a StringType target captures the unparsed
    * subtree verbatim): the Rust service accepts metadata as an
    * arbitrary `serde_json::Value` (`monitoring-service/src/main.rs:13`),
    * so a nested object must survive ingest byte-for-byte. [[decode]]
    * derives the Go `map[string]string` view (`user-service/main.go:16`)
    * from the raw form — SURVEY §1.3's dual-column model. */
  val wireSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("user_id", IntegerType, nullable = false),
    StructField("amount", DoubleType, nullable = false),
    StructField("currency", StringType, nullable = false),
    StructField("type", StringType, nullable = true),
    StructField("metadata", StringType, nullable = true),
    StructField("timestamp", StringType, nullable = false)))

  /** Wire → canonical: split `metadata` into the raw-JSON column
    * (`metadata_json`, Rust parity) and the string-map view
    * (`metadata`, Go parity; nested values appear as their raw JSON
    * text), and parse the RFC3339-µs-Z timestamp into TimestampType
    * (UTC). Shared by the batch reader and every streaming source. */
  def decode(wire: DataFrame): DataFrame =
    wire
      .withColumn("metadata_json", col("metadata"))
      .withColumn("metadata",
        from_json(col("metadata"), MapType(StringType, StringType)))
      .withColumn("timestamp",
        to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSX"))

  /** O1 — static seed (3 rows, mirroring `user-service/main.go:20-48`
    * in shape; values are our own). */
  def seed(spark: SparkSession): Dataset[Transaction] = {
    import spark.implicits._
    Seq(
      Transaction("11111111-1111-4111-8111-111111111111", 1001, 250.75, "USD",
        Some("credit"), Some(Map("merchant" -> "Amazon")),
        Some("""{"merchant":"Amazon"}"""),
        java.sql.Timestamp.valueOf("2025-08-27 10:00:00")),
      Transaction("22222222-2222-4222-8222-222222222222", 1002, 88.10, "EUR",
        Some("debit"), Some(Map("merchant" -> "Spotify")),
        Some("""{"merchant":"Spotify"}"""),
        java.sql.Timestamp.valueOf("2025-08-27 10:30:00")),
      Transaction("33333333-3333-4333-8333-333333333333", 1001, 19.99, "GBP",
        Some("debit"), Some(Map("merchant" -> "Netflix")),
        Some("""{"merchant":"Netflix"}"""),
        java.sql.Timestamp.valueOf("2025-08-27 11:00:00"))
    ).toDS()
  }

  /** O7 — schema-bound JSON source. `dropMalformed=true` reproduces the
    * Go service's silent-drop on bad JSON (`main.go:79-81`); `false`
    * reproduces the Rust service's hard failure (`main.rs:87`). Output
    * carries both metadata forms (see [[decode]]). */
  def readJson(spark: SparkSession, path: String,
               dropMalformed: Boolean = true): DataFrame = {
    val mode = if (dropMalformed) "DROPMALFORMED" else "FAILFAST"
    decode(spark.read.schema(wireSchema).option("mode", mode).json(path))
  }

  /** O2 — full scan, project-all. */
  def listAll(txns: DataFrame): DataFrame = txns

  /** O3/O4 — point lookup by transaction id. The reference does an O(n)
    * linear scan (`main.rs:95`); here the equality predicate is pushed
    * into the scan by Catalyst and `limit(1)` early-exits. */
  def lookupById(txns: DataFrame, id: String): DataFrame =
    txns.filter(col("transaction_id") === lit(id)).limit(1)

  /** O5/O6 — append ingest. Duplicate ids accepted, like the reference
    * (SURVEY.md §2.1.5). */
  def ingest(txns: DataFrame, batch: DataFrame): DataFrame =
    txns.unionByName(batch, allowMissingColumns = true)

  /** The dedup the reference lacks, as the explicit opt-in operator. */
  def dedupById(txns: DataFrame): DataFrame =
    txns.dropDuplicates("transaction_id")

  /** O8 — JSON sink (record → JSON text). */
  def toJsonLines(txns: DataFrame): Dataset[String] = txns.toJSON

  /** Metadata map access: the one key the fixtures use. */
  def merchant(txns: DataFrame): DataFrame =
    txns.withColumn("merchant", element_at(col("metadata"), "merchant"))
}
