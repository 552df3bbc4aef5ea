package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  /** The same interleave as [[zorderKey]] as a SQL expression string over
    * column names `x`/`y` — shared with the DuckDB oracle so both engines
    * compute byte-identical keys.
    */
  def zorderSqlTerms(x: String, y: String): String =
    (0 until 16).map { i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
}
