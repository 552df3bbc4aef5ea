package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.analytics.SpeedHistogram
import graft.model.Model
import graft.ops.RadarOps
import graft.parse.{CellGrid, ReportFixtures, ReportParser, Xlsx}

/** Property-based checks from SURVEY.md §5: codec round-trips, histogram
  * invariants, percentile bounds, idempotency algebra. Generators drawn
  * deterministically (fixed seeds) so failures reproduce; Spark-touching
  * properties batch all samples into one job to stay fast.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("xlsx cell-ref codec round-trips for arbitrary coordinates") {
    val coords = samples(Gen.zip(Gen.choose(0, 100000), Gen.choose(0, 700)), 200)
    coords.foreach { case (r, c) =>
      assert(Xlsx.parseRef(Xlsx.toRef(r, c)) == ((r, c)))
    }
  }

  test("xlsx grid write→read round-trips arbitrary small grids") {
    val cellGen = for {
      r <- Gen.choose(0, 30)
      c <- Gen.choose(0, 25)
      v <- Gen.oneOf(Gen.alphaNumStr.map(_.take(20)), Gen.choose(0, 9999).map(_.toString))
    } yield (r, c) -> v
    samples(Gen.mapOf(cellGen), 25).foreach { cells =>
      val nonEmpty = cells.filter(_._2.nonEmpty)
      val grid = CellGrid(nonEmpty)
      assert(Xlsx.read(Xlsx.write(grid)).cells == nonEmpty)
    }
  }

  test("time_range split is the inverse of slot construction for all 96 slots") {
    val df = (0 until 96).map(ReportFixtures.slot).toDF("time_range")
    val rows = RadarOps.withSlotSeconds(RadarOps.splitTimeRange(df))
      .select("time_range", "initial_time", "end_time", "initial_seconds")
      .as[(String, String, String, Int)].collect()
    rows.zipWithIndex.foreach { case ((tr, ini, end, secs), i) =>
      assert(tr == s"$ini as $end")
      assert(secs == i * 900)
    }
  }

  test("percentile from bins stays within bin-edge bounds on random histograms") {
    val histGen = Gen.zip(Gen.listOfN(11, Gen.choose(0, 50)), Gen.choose(1, 99))
    val cases = samples(histGen, 60).filter(_._1.sum > 0)
    assert(cases.size > 30)
    // one Spark job for all generated histograms
    val union = cases.map { case (bins, pct) =>
      val cols = Model.speedBins.zip(bins).map { case (n, v) => lit(v).as(n) } :+
        lit(bins.sum).as("total")
      spark.range(1).select(cols: _*)
        .select(SpeedHistogram.percentileCol(pct / 100.0).as("p"))
    }.reduce(_ union _)
    union.as[Double].collect().foreach { p =>
      assert(p >= 0.0 && p <= 110.0, s"percentile $p out of bin range")
    }
  }

  test("parser emits sum(bins)==total for every template") {
    Seq(1, 2, 3).foreach { tpl =>
      val grid = ReportFixtures.workbook(tpl, "EQX", "2021-06-07")
      val rows = ReportParser.parseGrid("prop", grid).toOption.get.rows
      rows.foreach { r =>
        val bins = Seq(r.speed_00_10, r.speed_11_20, r.speed_21_30, r.speed_31_40,
          r.speed_41_50, r.speed_51_60, r.speed_61_70, r.speed_71_80,
          r.speed_81_90, r.speed_91_100, r.speed_100_up)
        assert(bins.sum == r.total)
      }
    }
  }

  test("packing invariants: offsets are exclusive prefix sums; pack ids monotone") {
    val docsGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 1000L), Gen.choose(0, 2), Gen.choose(1L, 500L)))
    samples(docsGen, 5).foreach { raw =>
      val docs = raw.distinctBy(_._1).map { case (id, s, t) => (id, s"shard$s", t) }
        .toDF("id", "shard", "toks")
      val packed = graft.ops.CorpusOps
        .packSequences(docs, "id", $"toks", "shard", budget = 700)
        .select($"id", $"shard", $"n_tokens", $"pack_offset", $"pack_id")
        .as[(Long, String, Long, Long, Long)].collect()
      packed.groupBy(_._2).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        var cum = 0L
        sorted.foreach { case (_, _, t, off, pid) =>
          assert(off == cum, "offset must be the exclusive token prefix sum")
          assert(pid == off / 700, "pack id must be offset div budget")
          cum += t
        }
        // pack ids never decrease in id order within a shard
        assert(sorted.map(_._5).toSeq == sorted.map(_._5).sorted.toSeq)
      }
    }
  }

  test("split assignment is a pure function of id: disjoint, exhaustive, stable") {
    val idsGen = Gen.listOfN(200, Gen.choose(0L, 100000L))
    samples(idsGen, 3).foreach { ids =>
      val df = ids.distinct.toDF("id")
      val out = graft.ops.CorpusOps.deterministicSplit(df, "id")
        .select($"id", $"split").as[(Long, String)].collect()
      assert(out.length == ids.distinct.size)
      assert(out.forall(r => Set("train", "val", "test")(r._2)))
      // same ids → same assignment regardless of DataFrame shape
      val again = graft.ops.CorpusOps.deterministicSplit(
        ids.distinct.reverse.toDF("id"), "id")
        .select($"id", $"split").as[(Long, String)].collect().toMap
      assert(out.forall { case (id, s) => again(id) == s })
    }
  }

  test("chunking invariants: full coverage and overlap stitching") {
    val docGen = Gen.choose(1, 120).map(n => (1 to n).map(i => s"t$i").mkString(" "))
    val docs = samples(docGen, 8).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val chunks = graft.ops.CorpusOps
      .chunkDocuments(docs, "doc_id", "text", chunkTokens = 16, overlap = 4)
      .select($"doc_id", $"chunk_idx", $"chunk")
      .as[(Long, Int, String)].collect()
    val originals = docs.as[(Long, String)].collect().toMap
    chunks.groupBy(_._1).foreach { case (id, rows) =>
      val ordered = rows.sortBy(_._2).map(_._3)
      // stitching: first chunk + the tail beyond the 4-token overlap of
      // each later chunk reconstructs the document exactly
      val stitched = (ordered.head +:
        ordered.tail.map(_.split(" ").drop(4).mkString(" ")))
        .filter(_.nonEmpty).mkString(" ")
      assert(stitched == originals(id), s"doc $id not reconstructible")
    }
  }

  test("idempotent append is a fixpoint: apply twice == apply once") {
    val pairsGen = Gen.listOfN(30, Gen.zip(Gen.choose(1, 5), Gen.choose(1, 5)))
    samples(pairsGen, 5).foreach { pairs =>
      val incoming = pairs.map { case (e, d) => (s"E$e", s"2021-03-0$d") }
        .toDF("equipment", "pubdate")
      val empty = Seq.empty[(String, String)].toDF("equipment", "pubdate")
      val once = RadarOps.idempotentNewRows(incoming, empty, Seq("equipment", "pubdate"))
      val after = empty.union(once)
      val twice = RadarOps.idempotentNewRows(incoming, after, Seq("equipment", "pubdate"))
      assert(twice.count() == 0)
      assert(once.count() == pairs.distinct.size)
    }
  }

  test("quantizeInt8 invariants: range bounded, every nonzero vector hits ±127") {
    val vecGen = Gen.listOfN(16, Gen.choose(-100.0f, 100.0f))
    val vecs = samples(vecGen, 60).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
    val q = graft.sim.Similarity.quantizeInt8(df, "id", "v")
      .groupBy($"id")
      .agg(min($"q8").as("lo"), max($"q8").as("hi"), max(abs($"q8")).as("m"))
      .as[(Long, Int, Int, Int)].collect()
    val nonzero = vecs.filter(_._2.exists(_ != 0f)).map(_._1).toSet
    q.foreach { case (id, lo, hi, m) =>
      assert(lo >= -127 && hi <= 127, s"vector $id out of int8 range")
      if (nonzero(id)) assert(m == 127, s"vector $id: absmax must land on ±127")
    }
  }

  test("dedupSpans is idempotent: re-deduping the cleaned corpus drops nothing") {
    val wordGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e"))
    val docs = samples(wordGen, 40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val df = docs.toDF("doc_id", "text")
    val once = graft.ops.CorpusOps.dedupSpans(df, "doc_id", "text", chunkTokens = 4)
      .filter(length($"clean_text") > 0)
      .select($"doc_id", $"clean_text".as("text"))
    val twice = graft.ops.CorpusOps.dedupSpans(once, "doc_id", "text", chunkTokens = 4)
    val changed = twice.filter($"n_kept" =!= $"n_chunks").count()
    assert(changed == 0, "second pass must keep every chunk")
  }

  test("stratifiedSample: exact ceil(frac·n) per stratum for arbitrary fractions") {
    val rows = (0L until 173L).map(i => (i, s"s${i % 3}"))
    val df = rows.toDF("id", "src")
    val base = rows.groupBy(_._2).view.mapValues(_.size).toMap
    Seq(0.05, 0.33, 0.8).foreach { f =>
      val got = graft.ops.CorpusOps.stratifiedSample(df, "id", "src", f)
        .groupBy($"src").count().as[(String, Long)].collect().toMap
      base.foreach { case (src, n) =>
        assert(got(src) == math.ceil(n * f).toLong, s"frac $f stratum $src")
      }
    }
  }

  test("ohlcBars invariants hold on random tick streams") {
    val tickGen = for {
      k <- Gen.choose(1L, 4L)
      h <- Gen.choose(0, 47) // two day-buckets
      m <- Gen.choose(0, 59)
      v <- Gen.choose(-500, 500).map(_ / 10.0)
    } yield (k, java.sql.Timestamp.valueOf(
      f"2024-02-0${1 + h / 24} ${h % 24}%02d:$m%02d:00"), v)
    val rows = samples(tickGen, 300).zipWithIndex
      .map { case ((k, t, v), i) => (k, t, i.toLong, v) }
    val bars = graft.ops.TimeSeriesOps.ohlcBars(
        rows.toDF("k", "t", "id", "v"), "k", "t", "v", "id",
        date_trunc("day", col("t")))
      .as[(Long, java.sql.Timestamp, Double, Double, Double, Double, Long)]
      .collect()
    assert(bars.nonEmpty)
    bars.foreach { case (_, _, open, high, low, close, n) =>
      assert(low <= open && open <= high, "open outside [low, high]")
      assert(low <= close && close <= high, "close outside [low, high]")
      assert(n > 0)
    }
    assert(bars.map(_._7).sum == rows.size.toLong, "bars must partition ticks")
  }

  test("winsorize: clamped mean stays inside the band, counts add up") {
    val valGen = Gen.choose(-10000, 10000).map(_ / 7.0)
    val rows = samples(valGen, 400).zipWithIndex
      .map { case (v, i) => (s"g${i % 2}", v) }
    val got = graft.ops.AnalyticsOps.winsorize(
        rows.toDF("k", "v"), "k", "v")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 2)
    got.foreach { case (_, n, nLo, nHi, pLo, pHi, mean) =>
      assert(pLo <= pHi)
      // rounded band edges vs 6-dp mean: allow the rounding epsilon
      assert(mean >= pLo - 1e-6 && mean <= pHi + 1e-6,
        s"winsorized mean $mean escaped [$pLo, $pHi]")
      assert(nLo + nHi < n, "clamped both-tail count must leave the middle")
    }
  }

  test("bfsDepths: every depth label is realizable and minimal on random graphs") {
    val edgeGen = Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L))
      .suchThat { case (a, b) => a != b }
    (0 until 3).foreach { round =>
      // vary the seed per round — samples() alone is deterministic, so
      // without the offset every round would test the identical graph
      val es = (0 until 40).flatMap(i =>
        edgeGen.apply(Gen.Parameters.default, Seed(1000L * round + i))).distinct
      val undirected = es.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val got = graft.ops.GraphOps.bfsDepths(
          undirected.toDF("s", "d"), "s", "d", Seq(0L), maxDepth = 4)
        .as[(Long, Int)].collect().toMap
      // reference BFS on the driver
      val adj = undirected.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var expect = Map(0L -> 0)
      var frontier = Set(0L)
      for (d <- 1 to 4) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(expect.keySet)
        expect = expect ++ next.map(_ -> d)
        frontier = next
      }
      assert(got == expect, s"round $round: BFS disagreement")
    }
  }
}
