package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Geo + space-filling-curve operators.
  *
  * The reference's dimension table carries per-radar geo position
  * (`/root/reference/database/schema.sql:42-43`, float4 lat/lon from
  * `src/equipamentos.csv`), which makes nearest-equipment lookup and
  * spatial clustering first-class engine capabilities. Everything here is
  * pure codegen'd column math — no UDFs — so the operators stay inside
  * whole-stage codegen and the same arithmetic is expressible in the
  * DuckDB oracle verbatim.
  */
object GeoOps {

  /** pi/180 as the exact double literal used on BOTH engines. Spark's
    * `radians()` is Math.toRadians (x / 180 * pi) while DuckDB multiplies
    * by its own constant — writing the multiply explicitly keeps the IEEE
    * op sequence identical across engines.
    */
  val Deg2Rad = 0.017453292519943295

  /** Mean-earth radius (km), IUGG value; doubled once in the haversine. */
  val EarthRadiusKm = 6371.0088

  /** Deterministic uniform in [0,1) from an integer key — Knuth
    * multiplicative hash, portable to any engine with 64-bit integer
    * arithmetic (no float-rounding ambiguity until the final divide).
    * The key is folded to [0, 2^31) via pmod BEFORE the multiply so the
    * product stays below Long.MaxValue for any BIGINT key (negative
    * hash surrogates included) — without the fold, keys ≳3.5e9
    * overflow: Spark wraps silently while DuckDB raises, so the engines
    * would diverge at 100 TB id ranges.
    */
  def knuthUniform(key: Column, salt: Long): Column =
    ((pmod(key.cast("long"), lit(2147483648L)) * lit(2654435761L) + lit(salt))
      % lit(4294967296L))
      .cast("double") / lit(4294967296.0)

  /** Synthetic latitude in [-60, 60) (poles avoided: distances there are
    * numerically twitchy and no radar lives at -89.9).
    */
  def syntheticLat(key: Column, salt: Long = 101L): Column =
    lit(-60.0) + knuthUniform(key, salt) * lit(120.0)

  /** Synthetic longitude in [-180, 180). */
  def syntheticLon(key: Column, salt: Long = 202L): Column =
    lit(-180.0) + knuthUniform(key, salt) * lit(360.0)

  /** Great-circle distance in km between two (lat, lon) degree pairs —
    * haversine with explicit deg→rad multiplies; `s * s` instead of
    * `pow(s, 2)` (pow is not guaranteed to be an exact square on either
    * engine).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = sin((lat2 - lat1) * lit(Deg2Rad) / lit(2.0))
    val dLon = sin((lon2 - lon1) * lit(Deg2Rad) / lit(2.0))
    val h = dLat * dLat +
      cos(lat1 * lit(Deg2Rad)) * cos(lat2 * lit(Deg2Rad)) * dLon * dLon
    // rounding can push h one ulp past 1.0 near antipodes → asin NaN
    lit(2.0 * EarthRadiusKm) * asin(sqrt(least(h, lit(1.0))))
  }

  /** 32-bit Morton (Z-order) key from two 16-bit dimensions: bit i of x
    * lands at position 2i, bit i of y at 2i+1. Locality-preserving — used
    * to cluster lake files so min/max footer stats prune on BOTH dims.
    * Pure integer shifts/masks → codegen'd, and [[zorderSqlTerms]] emits
    * the identical arithmetic for an external SQL engine.
    */
  def zorderKey(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Nearest-neighbour within a radius via grid-cell bucketing — the geo
    * analogue of the LSH bucket join: instead of |left|·|right| haversine
    * evaluations, each left row meets only the right rows in its 3×3 cell
    * neighbourhood, so the pair count scales with point density, not with
    * |left|·|right|. Lossless for nearest-within-radius semantics: every
    * cell is at least `radiusKm` tall everywhere (on the haversine sphere
    * 1° of latitude is a constant R·π/180 km) and at least `radiusKm`
    * wide at the worst latitude of the ±`maxAbsLatDeg` band, so any right
    * point within `radiusKm` of a left point lies in the neighbourhood
    * and the per-key argmin over candidates equals the argmin over all
    * pairs (pinned ≡ brute force in GeoOpsSpec). Longitude cells wrap at
    * the antimeridian via pmod on the cell index; latitude needs no wrap
    * inside the band.
    *
    * The RIGHT side is the one replicated ×9 into its neighbourhood, so
    * put the dimension there: the fact side maps to a single cell and the
    * replication cost stays dimension-sized. With `broadcastRight` (the
    * default) the candidate join is map-side and the final argmin
    * partial-aggregates — the fact table is never shuffled at all. Set it
    * false when the right side is itself fact-sized; the join then
    * shuffles both sides on the cell key, still never forming the cross
    * product. When the radius is so large that fewer than 3 longitude
    * cells tile the circle, wrapped neighbour offsets collide and a
    * candidate pair can appear more than once — harmless under min().
    *
    * Distances are rounded to 2 decimals BEFORE the radius filter and the
    * argmin (the q84 exactness discipline: a 1-ulp libm difference must
    * not flip a comparison), ties break on the right key. Left rows with
    * no right row within `radiusKm` are absent from the result.
    *
    * Both inputs must carry points with |lat| ≤ `maxAbsLatDeg` — the
    * width guarantee (hence losslessness) stops at the band edge.
    */
  def gridNearestWithin(
      left: DataFrame, lKey: String, lLat: String, lLon: String,
      right: DataFrame, rKey: String, rLat: String, rLon: String,
      radiusKm: Double,
      maxAbsLatDeg: Double = 60.0,
      broadcastRight: Boolean = true): DataFrame = {
    require(radiusKm > 0.0, "radiusKm must be positive")
    require(maxAbsLatDeg > 0.0 && maxAbsLatDeg < 90.0,
      "maxAbsLatDeg must be inside (0, 90): cell width degenerates at the poles")
    val kmPerDegLat = EarthRadiusKm * math.Pi / 180.0
    // The filter compares distances ROUNDED to 2 decimals against radiusKm,
    // so a pair with true distance up to radiusKm + 0.005 can pass. Size the
    // cells for that slop-extended radius so the 3×3 coverage guarantee
    // dominates the rounded filter even at the boundary.
    val coverKm = radiusKm + 0.005
    val latCellDeg = coverKm / kmPerDegLat
    // exact Δlon bound at the band edge: two points at lat = maxAbsLat
    // within coverKm satisfy sin(Δlon/2)·cos(maxAbsLat) ≤ sin(r/2R)
    val halfAngle = math.min(1.0,
      math.sin(coverKm / (2.0 * EarthRadiusKm)) / math.cos(maxAbsLatDeg * math.Pi / 180.0))
    val minLonCellDeg = 2.0 * math.asin(halfAngle) * 180.0 / math.Pi
    // shrink the cell count (never the cell width) so cells tile the
    // circle exactly and pmod wrap is cell-aligned
    val nLon = math.max(1L, math.floor(360.0 / minLonCellDeg).toLong)
    val lonCellDeg = 360.0 / nLon

    def latCell(lat: Column): Column = floor(lat / lit(latCellDeg)).cast("long")
    def lonCell(lon: Column): Column =
      pmod(floor((lon + lit(180.0)) / lit(lonCellDeg)).cast("long"), lit(nLon))

    val probe = left.select(col(lKey), col(lLat), col(lLon),
      latCell(col(lLat)).as("__lat_cell"), lonCell(col(lLon)).as("__lon_cell"))
    val offsets = (for (a <- -1 to 1; b <- -1 to 1)
      yield struct(lit(a.toLong).as("dlat"), lit(b.toLong).as("dlon"))).toSeq
    val build0 = right
      .select(col(rKey), col(rLat), col(rLon),
        latCell(col(rLat)).as("__rc_lat"), lonCell(col(rLon)).as("__rc_lon"))
      .withColumn("__off", explode(array(offsets: _*)))
      .select(col(rKey), col(rLat), col(rLon),
        (col("__rc_lat") + col("__off.dlat")).as("__lat_cell"),
        pmod(col("__rc_lon") + col("__off.dlon"), lit(nLon)).as("__lon_cell"))
    val build = if (broadcastRight) broadcast(build0) else build0
    val candidates = probe.join(build, Seq("__lat_cell", "__lon_cell"))
      .withColumn("dist_km",
        round(haversineKm(col(lLat), col(lLon), col(rLat), col(rLon)), 2))
      .filter(col("dist_km") <= lit(radiusKm))
    right.schema(rKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        // integral right key: the argmin runs as the native bounded-heap
        // aggregate (k = 1) inside ObjectHashAggregate. min(struct)
        // compiles to SortAggregate, which SORTS every candidate row on
        // both sides of the exchange; the heap keeps one (dist, key)
        // pair per group per partition and never sorts the candidates.
        // Negated distance turns the heap's largest-first order into
        // argmin; its tie-break (id ASC) is exactly ours (smallest key).
        candidates
          .groupBy(col(lKey))
          .agg(graft.functions.NativeTopK
            .topK(-col("dist_km"), col(rKey), 1).as("__tops"))
          .select(col(lKey),
            col("__tops").getItem(0).getField("id")
              .cast(right.schema(rKey).dataType).as(rKey),
            (-col("__tops").getItem(0).getField("sort_key")).as("dist_km"))
      case _ =>
        // arbitrary key type: struct-min (SortAggregate) fallback
        candidates
          .groupBy(col(lKey))
          .agg(min(struct(col("dist_km"), col(rKey))).as("__best"))
          .select(col(lKey),
            col(s"__best.$rKey").as(rKey),
            col("__best.dist_km").as("dist_km"))
    }
  }

  /** The same interleave as [[zorderKey]] as a SQL expression string over
    * column names `x`/`y` — shared with the DuckDB oracle so both engines
    * compute byte-identical keys.
    */
  def zorderSqlTerms(x: String, y: String): String =
    (0 until 16).map { i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
}
