package graft.model

import org.apache.spark.sql.types._

/** Domain model for the radar engine — the reference's three tables plus
  * parse-time intermediates, declared once as case classes + StructTypes.
  *
  * Sources: clean-row header /root/reference/src/clean_data.py:25-40,
  * DDL /root/reference/database/schema.sql:22-71.
  */
object Model {

  /** Tidy row emitted by the report parser, pre-normalization — the
    * direct analogue of one written row of the reference's clean workbook
    * (clean_data.py:119-134). `pubdate` is still the `yyyy-MM-dd` string
    * the parser assembles; `direction` is still the raw block label
    * (e.g. "Centro/N"). */
  final case class RawFlowRow(
      pubdate: String,
      equipment: String,
      direction: String,
      time_range: String,
      speed_00_10: Int,
      speed_11_20: Int,
      speed_21_30: Int,
      speed_31_40: Int,
      speed_41_50: Int,
      speed_51_60: Int,
      speed_61_70: Int,
      speed_71_80: Int,
      speed_81_90: Int,
      speed_91_100: Int,
      speed_100_up: Int,
      total: Int)

  /** One parsed report file: lineage + its tidy rows.
    * `template` records which of the 3 layouts matched (clean_data.py:66-71). */
  final case class ParsedReport(
      source: String,
      pubdate: String,
      equipment: String,
      template: Int,
      rows: Seq[RawFlowRow])

  /** Parse failure — the engine's non-crashing version of the reference's
    * `raise Exception("No template was found for ...")` (clean_data.py:72-73). */
  final case class ParseError(source: String, message: String)

  /** Ingestion-ledger row (schema.sql:22-29); uniqueness key is
    * (pubdate, equipment) per the btree index at schema.sql:31-33. */
  final case class EquipmentFileEntry(
      file_name: String,
      pubdate: java.sql.Date,
      equipment: String,
      date_created: java.sql.Timestamp)

  /** Equipment dimension row (schema.sql:36-49 / equipamentos.csv). */
  final case class Equipment(
      equipment: String,
      latitude: Float,
      longitude: Float,
      address: String,
      bus_lane: Boolean,
      bike_lane: Boolean,
      parking_lane: Boolean,
      number_lanes: Int)

  val speedBins: Seq[String] = Seq(
    "speed_00_10", "speed_11_20", "speed_21_30", "speed_31_40",
    "speed_41_50", "speed_51_60", "speed_61_70", "speed_71_80",
    "speed_81_90", "speed_91_100", "speed_100_up")

  /** Representative speed (km/h) per histogram bin, for weighted-mean /
    * percentile analytics. Open-ended top bin pegged at 105. */
  val binMidpoints: Seq[Double] =
    Seq(5.0, 15.5, 25.5, 35.5, 45.5, 55.5, 65.5, 75.5, 85.5, 95.5, 105.0)

  /** Lower/upper km/h edge per bin (upper of the open top bin capped at
    * 110 for interpolation). Edges are INTEGER-domain inclusive ranges
    * (the radar vendor reports integer km/h): consecutive bins share no
    * value — the top bin starts at 101, not 100, so a reading of exactly
    * 100 lands in speed_91_100 only (an overlapping lower edge would
    * double-count it and break sum(bins) == total). Fractional speeds
    * are outside the model's domain. */
  val binEdges: Seq[(Double, Double)] = Seq(
    (0, 10), (11, 20), (21, 30), (31, 40), (41, 50), (51, 60),
    (61, 70), (71, 80), (81, 90), (91, 100), (101, 110))

  val directionDomain: Seq[String] = Seq("Norte", "Sul", "Leste", "Oeste")

  /** Clean flows schema (16 cols of clean_data.py:25-40 + the
    * initial/end_time split of clean_data.py:202-204). TIME-typed columns
    * are "HH:mm" strings (Spark has no TimeType) plus derived
    * seconds-of-day ints added by ops.withSlotSeconds. */
  val flowsSchema: StructType = StructType(
    Seq(
      StructField("pubdate", DateType),
      StructField("equipment", StringType),
      StructField("direction", StringType),
      StructField("time_range", StringType),
      StructField("initial_time", StringType),
      StructField("end_time", StringType)) ++
      speedBins.map(StructField(_, IntegerType)) :+
      StructField("total", IntegerType))

  val ledgerSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("pubdate", DateType),
    StructField("equipment", StringType),
    StructField("date_created", TimestampType)))

  val equipmentSchema: StructType = StructType(Seq(
    StructField("equipment", StringType),
    StructField("latitude", FloatType),
    StructField("longitude", FloatType),
    StructField("address", StringType),
    StructField("bus_lane", BooleanType),
    StructField("bike_lane", BooleanType),
    StructField("parking_lane", BooleanType),
    StructField("number_lanes", IntegerType)))
}
