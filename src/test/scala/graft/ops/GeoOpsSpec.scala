package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GeoOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("haversine: zero distance, symmetry, and a known city pair") {
    val df = Seq(
      (0.0, 0.0, 0.0, 0.0),              // same point
      (-26.3044, -48.8487, -23.5505, -46.6333),  // Joinville → São Paulo
      (-23.5505, -46.6333, -26.3044, -48.8487))  // reversed
      .toDF("lat1", "lon1", "lat2", "lon2")
    val d = df.select(
      GeoOps.haversineKm($"lat1", $"lon1", $"lat2", $"lon2").as("km"))
      .as[Double].collect()
    assert(d(0) == 0.0)
    assert(d(1) > 370 && d(1) < 390, s"Joinville-SP ~380km, got ${d(1)}")
    assert(d(1) == d(2), "haversine must be symmetric")
  }

  test("haversine clamps past-1 rounding at antipodes (no NaN)") {
    val d = Seq((90.0, 0.0, -90.0, 180.0), (0.0, 0.0, 0.0, 180.0))
      .toDF("lat1", "lon1", "lat2", "lon2")
      .select(GeoOps.haversineKm($"lat1", $"lon1", $"lat2", $"lon2").as("km"))
      .as[Double].collect()
    assert(d.forall(x => !x.isNaN))
    // half the earth's mean circumference ≈ 20015 km
    assert(d.forall(x => x > 20000 && x < 20030))
  }

  test("synthetic coordinates are deterministic and in range") {
    val c = spark.range(1, 1000)
      .select(GeoOps.syntheticLat($"id").as("lat"), GeoOps.syntheticLon($"id").as("lon"))
    val rows = c.as[(Double, Double)].collect()
    assert(rows.forall { case (la, lo) => la >= -60 && la < 60 && lo >= -180 && lo < 180 })
    val again = c.as[(Double, Double)].collect()
    assert(rows.sameElements(again))
  }

  test("knuthUniform stays in [0,1) for BIGINT keys past 2^32 (no overflow)") {
    // pre-mask, keys ≳3.5e9 overflowed the Long multiply: Spark wrapped to
    // a negative modulo (coords out of range) while DuckDB raised
    val big = Seq(3500000000L, 5000000000L, Long.MaxValue - 1)
      .toDF("id")
      .select(GeoOps.knuthUniform($"id", 101L).as("u"),
        GeoOps.syntheticLat($"id").as("lat"))
      .as[(Double, Double)].collect()
    assert(big.forall { case (u, la) => u >= 0.0 && u < 1.0 && la >= -60 && la < 60 },
      s"out-of-range values: ${big.mkString(", ")}")
    // mask is a no-op for keys below 2^31 — sf-data results unchanged
    val smallOld = (7L * 2654435761L + 101L) % 4294967296L / 4294967296.0
    val smallNew = Seq(7L).toDF("id")
      .select(GeoOps.knuthUniform($"id", 101L)).as[Double].head()
    assert(smallNew == smallOld)
  }

  test("zorderKey interleaves bits exactly (scalar cross-check)") {
    def mortonRef(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .select(GeoOps.zorderKey($"x", $"y").as("z")).as[Long].collect()
    assert(got.toSeq == pts.map { case (x, y) => mortonRef(x, y) })
    // full 32-bit range reached at the max corner
    assert(got(3) == 0xFFFFFFFFL)
  }

  test("zorder clustering keeps per-bucket spans narrow on both dims") {
    // random-ish grid points; curve-ordered quartiles must have much
    // smaller average x/y span than the same data bucketed by x alone
    // would have on y (locality on BOTH dims is the whole point)
    val n = 4096
    val pts = spark.range(n).select(
      (col("id") * 2654435761L % 65536).as("x"),
      (col("id") * 40503L % 65536).as("y"))
    val z = pts.withColumn("z", GeoOps.zorderKey($"x", $"y"))
      .withColumn("b", ntile(16).over(
        org.apache.spark.sql.expressions.Window.orderBy($"z")))
    val spans = z.groupBy($"b")
      .agg(((max($"x") - min($"x")) + (max($"y") - min($"y"))).as("span"))
      .agg(avg($"span")).as[Double].head()
    // unclustered expectation: each bucket spans nearly the full 65536 on
    // both dims (~131k summed); Z-order cuts this several-fold
    assert(spans < 70000, s"avg combined span $spans not locality-preserving")
  }

  // brute-force nearest-within-radius: the exactness baseline the grid
  // path must reproduce bit-for-bit (same rounding + tie-break)
  private def bruteNearest(cust: org.apache.spark.sql.DataFrame,
      supp: org.apache.spark.sql.DataFrame, radiusKm: Double) =
    cust.crossJoin(supp)
      .withColumn("dist_km",
        round(GeoOps.haversineKm($"c_lat", $"c_lon", $"s_lat", $"s_lon"), 2))
      .filter($"dist_km" <= radiusKm)
      .groupBy($"ck")
      .agg(min(struct($"dist_km", $"sk")).as("best"))
      .select($"ck", $"best.sk".as("sk"), $"best.dist_km".as("dist_km"))

  test("gridNearestWithin ≡ brute force on synthetic points (three radii)") {
    val cust = spark.range(1, 400).select($"id".as("ck"),
      GeoOps.syntheticLat($"id", 11L).as("c_lat"),
      GeoOps.syntheticLon($"id", 22L).as("c_lon"))
    val supp = spark.range(1, 60).select($"id".as("sk"),
      GeoOps.syntheticLat($"id", 33L).as("s_lat"),
      GeoOps.syntheticLon($"id", 44L).as("s_lon"))
    for (r <- Seq(200.0, 800.0, 3000.0)) {
      val grid = GeoOps.gridNearestWithin(
          cust, "ck", "c_lat", "c_lon", supp, "sk", "s_lat", "s_lon", r)
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      val brute = bruteNearest(cust, supp, r)
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      assert(grid.nonEmpty, s"radius $r matched nothing — test data too sparse")
      assert(grid.toSeq == brute.toSeq, s"grid ≠ brute force at radius $r")
    }
  }

  test("gridNearestWithin: struct-min fallback (non-integral key) ≡ native argmin") {
    val cust = spark.range(1, 400).select($"id".as("ck"),
      GeoOps.syntheticLat($"id", 11L).as("c_lat"),
      GeoOps.syntheticLon($"id", 22L).as("c_lon"))
    val supp = spark.range(1, 60).select($"id".as("sk"),
      GeoOps.syntheticLat($"id", 33L).as("s_lat"),
      GeoOps.syntheticLon($"id", 44L).as("s_lon"))
    // zero-padded so string ordering == numeric ordering and the two
    // paths must tie-break identically
    val suppStr = supp.withColumn("sk", format_string("%05d", $"sk"))
    val native = GeoOps.gridNearestWithin(
        cust, "ck", "c_lat", "c_lon", supp, "sk", "s_lat", "s_lon", 800.0)
      .as[(Long, Long, Double)].collect()
      .map { case (c, s, d) => (c, f"$s%05d", d) }.sortBy(_._1)
    val fallback = GeoOps.gridNearestWithin(
        cust, "ck", "c_lat", "c_lon", suppStr, "sk", "s_lat", "s_lon", 800.0)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(native.nonEmpty && native.toSeq == fallback.toSeq)
  }

  test("gridNearestWithin wraps the antimeridian and honors the radius cutoff") {
    // cust 1 sits at lon 179.95, its nearest supplier across the seam at
    // -179.95 (~11 km away) — only reachable if the lon cell join wraps.
    // cust 2 is mid-Pacific with nothing within 500 km → absent.
    val cust = Seq((1L, 10.0, 179.95), (2L, -40.0, -120.0))
      .toDF("ck", "c_lat", "c_lon")
    val supp = Seq((7L, 10.0, -179.95), (8L, 10.2, 179.0))
      .toDF("sk", "s_lat", "s_lon")
    val got = GeoOps.gridNearestWithin(
        cust, "ck", "c_lat", "c_lon", supp, "sk", "s_lat", "s_lon", 500.0)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L), s"expected only cust 1 matched, got ${got.mkString(",")}")
    assert(got.head._2 == 7L, s"nearest across the seam must be supplier 7, got ${got.head}")
    assert(got.head._3 < 15.0)
  }

  test("zorderSqlTerms emits arithmetic equivalent to the column form") {
    val df = Seq((123L, 456L), (65535L, 1L)).toDF("x", "y")
    df.createOrReplaceTempView("zst_t")
    val viaSql = spark.sql(s"SELECT ${GeoOps.zorderSqlTerms("x", "y")} AS z FROM zst_t")
      .as[Long].collect().toSeq
    val viaCol = df.select(GeoOps.zorderKey($"x", $"y")).as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }
}
