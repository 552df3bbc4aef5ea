package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Model

/** The operator library for the radar domain — each function is a
  * composable `DataFrame => DataFrame` stage built purely from Catalyst
  * built-ins (zero UDFs, whole-stage-codegen friendly; SURVEY.md §7).
  */
object RadarOps {

  // ------------------------------------------------------------ F1 + F2
  /** clean_direction (clean_data.py:44-50): take the token after the first
    * '/' ("Centro/N" → "N"; null when there is no '/'), then recode the
    * four cardinal letters to Portuguese names; anything else passes
    * through unchanged (the reference's regexes are anchored).
    */
  def cleanDirection(df: DataFrame, directionCol: String = "direction"): DataFrame = {
    val afterSlash = when(col(directionCol).contains("/"),
      split(col(directionCol), "/", 2).getItem(1))
    val recoded = when(afterSlash === "N", "Norte")
      .when(afterSlash === "S", "Sul")
      .when(afterSlash === "L", "Leste")
      .when(afterSlash === "O", "Oeste")
      .otherwise(afterSlash)
    df.withColumn(directionCol, recoded)
  }

  // ------------------------------------------------------------------ F3
  /** Split "HH:MM as HH:MM" into initial/end time (clean_data.py:200-204:
    * slice(0,5) and slice(9,14)). */
  def splitTimeRange(df: DataFrame, timeRangeCol: String = "time_range"): DataFrame =
    df.withColumn("initial_time", substring(col(timeRangeCol), 1, 5))
      .withColumn("end_time", substring(col(timeRangeCol), 10, 5))

  /** Derived seconds-of-day ints for range queries over the "HH:mm"
    * strings (SURVEY.md §1.2 — Spark has no TimeType). */
  def withSlotSeconds(df: DataFrame): DataFrame = {
    def secs(c: String): Column =
      substring(col(c), 1, 2).cast("int") * 3600 + substring(col(c), 4, 2).cast("int") * 60
    df.withColumn("initial_seconds", secs("initial_time"))
      .withColumn("end_seconds", secs("end_time"))
  }

  // ------------------------------------------------------------------ F6
  /** Parser output → typed flows rows: date-typed pubdate (F6,
    * clean_data.py:151), cleaned direction, split times. The engine's
    * equivalent of process_clean_wb's DataFrame stage. */
  def normalizeFlows(raw: DataFrame): DataFrame =
    splitTimeRange(cleanDirection(raw.withColumn("pubdate", to_date(col("pubdate")))))
      .select(Model.flowsSchema.fieldNames.map(col).toSeq: _*)

  // ----------------------------------------------------------- F10 / F11
  /** Object-store key builder (scrape.py:87, clean_data.py:158):
    * "EQUIP/yyyy-MM-dd.ext". */
  def fileKey(equipment: Column, pubdate: Column, ext: String): Column =
    concat(concat_ws("/", equipment, date_format(pubdate, "yyyy-MM-dd")), lit("." + ext))

  /** Inverse of fileKey (backload_scrape.py:82-86): extract (equipment,
    * pubdate) from "EQUIP/yyyy-MM-dd.ext". */
  def parseFileKey(df: DataFrame, keyCol: String = "file_name"): DataFrame =
    df.withColumn("equipment", split(col(keyCol), "/").getItem(0))
      .withColumn("pubdate",
        to_date(regexp_extract(col(keyCol), raw"/(\d{4}-\d{2}-\d{2})\.", 1)))

  // ------------------------------------------------------------- J4 + F8
  /** Task-matrix generation (backload_scrape.py:61-67): every (equipment,
    * date) pair in [start, end]. Dates come from one `sequence` explode —
    * no driver-side loops. */
  def taskMatrix(equipments: DataFrame, start: Column, end: Column): DataFrame = {
    val dates = equipments.sparkSession.range(1)
      .select(explode(sequence(start.cast("date"), end.cast("date"),
        expr("interval 1 day"))).as("pubdate"))
    dates.crossJoin(equipments.select(col("equipment")).distinct())
  }

  // ------------------------------------------------------------------ J1
  /** Already-loaded elimination (backload_scrape.py:70-86): drop tasks
    * whose (equipment, pubdate) already appear in the ledger. The ledger
    * side is pre-projected so only the 2 key columns shuffle/broadcast. */
  def antiJoinLoaded(tasks: DataFrame, ledger: DataFrame): DataFrame =
    tasks.join(ledger.select("equipment", "pubdate"),
      Seq("equipment", "pubdate"), "left_anti")

  // ------------------------------------------------------------------ J2
  /** Idempotent-append guard (clean_data.py:164-180 + the unique index at
    * schema.sql:31-33): keep only rows whose key set is absent from the
    * existing table. Append-side dedup also collapses duplicate keys
    * within the incoming batch itself, DETERMINISTICALLY: the row with
    * the minimum (non-key columns, in order) wins — dropDuplicates would
    * keep a partition-order-dependent row, making recorded lineage
    * (file_name) differ between identical runs. */
  def idempotentNewRows(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame = {
    val others = incoming.columns.filterNot(keys.contains).toSeq
    val deduped =
      if (others.isEmpty) incoming.dropDuplicates(keys)
      else incoming.groupBy(keys.map(col): _*)
        .agg(min(struct(others.map(col): _*)).as("__w"))
        .select(incoming.columns.toSeq.map {
          case k if keys.contains(k) => col(k)
          case o => col(s"__w.$o").as(o)
        }: _*)
    deduped.join(existing.select(keys.map(col).toSeq: _*), keys, "left_anti")
  }

  // ------------------------------------------------------------- A1 + P6
  /** Completeness audit (verify_dates.py:26-50) as ONE hash aggregate
    * instead of the reference's per-date scalar queries: dates in
    * [start, end] with fewer than `expected` ledger files, including
    * dates with zero files (the reference reports those too). */
  def completenessAudit(
      ledger: DataFrame, start: Column, end: Column, expected: Int): DataFrame = {
    val spark = ledger.sparkSession
    val allDates = spark.range(1)
      .select(explode(sequence(start.cast("date"), end.cast("date"),
        expr("interval 1 day"))).as("pubdate"))
    val counts = ledger
      .filter(col("pubdate").between(start.cast("date"), end.cast("date")))
      .groupBy("pubdate").agg(count(lit(1)).as("files_found"))
    allDates.join(counts, Seq("pubdate"), "left")
      .select(col("pubdate"),
        coalesce(col("files_found"), lit(0L)).as("files_found"))
      .filter(col("files_found") < expected)
      .withColumn("files_missing", lit(expected) - col("files_found"))
  }

  // ----------------------------------------------------- P1 + P2 + F12
  /** Dimension-table normalization (load_equipments.py:32-89): drop the
    * Portuguese-only columns, rename PT→EN, cast the 0/1 lane flags to
    * boolean, enforce the direction enum domain when present. */
  def loadEquipments(raw: DataFrame): DataFrame = {
    val renames = Map(
      "equipamento" -> "equipment",
      "ciclofaixa" -> "bike_lane",
      "corredor" -> "bus_lane",
      "estacionamento" -> "parking_lane",
      "n_faixa_carro_sentido" -> "number_lanes",
      "sentido" -> "direction")
    val dropped = Seq("endereco_alterado", "radar_2_sentidos")
      .foldLeft(raw)((d, c) => if (d.columns.contains(c)) d.drop(c) else d)
    val renamed = renames.foldLeft(dropped) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val withAddress =
      if (renamed.columns.contains("endereco"))
        renamed.withColumnRenamed("endereco", "address")
      else renamed
    Seq("bike_lane", "bus_lane", "parking_lane").foldLeft(withAddress) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast("boolean")) else d
    }
  }

  /** Direction-domain validation expression (schema.sql:14-20's enum). */
  def directionValid(c: Column): Column = c.isin(Model.directionDomain: _*)
}
