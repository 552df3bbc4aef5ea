package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Readers for the driver-generated parquet tables (`/root/testdata/sf*`).
  *
  * Every query in [[graft.SparkEntry]] receives an `sfDir` and loads its
  * inputs through here, so scan-level concerns (nanosecond timestamps,
  * normalization to session-TZ timestamps) live in exactly one place.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame   = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame   = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame   = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame  = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** `events.parquet` has shipped `ts` in two physical encodings across
    * fixture generations: parquet TIMESTAMP(NANOS), which Spark cannot
    * read natively and arrives as LongType nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by Verify/Bench
    * session builders), and TIMESTAMP(MICROS, isAdjustedToUTC=false),
    * which arrives as TimestampNTZType. Normalize every case to a
    * session-TZ micro timestamp so downstream queries see one stable
    * schema: `ts: timestamp`. TemporalPrecisionSpec pins the contract.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: double division loses sub-µs exactness
        // on epoch nanos (> 2^53) and can shift a timestamp by 1 µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
