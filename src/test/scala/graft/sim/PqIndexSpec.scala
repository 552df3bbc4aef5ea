package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ADC score ≡ dot(q, reconstruction) recomputed from the codebooks") {
    val emb = Tables.embeddings(spark, sf).limit(60)
    val index = PqIndex.build(emb, "vec_id", "embedding",
      nList = 2, m = 8, k = 4)
    try {
      // every vector got m codes in [0, k)
      val codes = index.encoded.select($"nn_id", $"codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(codes.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 4)))

      // probe every cell so the (query, candidate) pair below must appear
      val q = emb.filter($"vec_id" === 0L)
      val got = PqIndex.topK(q, "vec_id", "embedding", index,
          k = 60, nProbe = 2)
        .select($"neighbor_id", $"sim").as[(Long, Double)].collect().toMap

      // independent reconstruction on the driver: normalize q, then for a
      // few candidates sum dot(q_sub_j, codebook(j)(code_j))
      val qv = emb.filter($"vec_id" === 0L)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val qNorm = qv.map(_ / qn)
      for ((id, sim) <- got.take(5)) {
        val expected = (0 until index.m).map { j =>
          val cb = index.codebooks(j)(codes(id)(j))
          val sub = qNorm.slice(j * index.subDim, (j + 1) * index.subDim)
          sub.zip(cb).map { case (a, b) => a * b }.sum
        }.sum
        assert(math.abs(sim - expected) < 1e-9,
          s"ADC lut mis-indexed for neighbor $id: $sim vs $expected")
      }
    } finally index.close()
  }

  test("IVFPQ rerank recall beats ADC-only, both non-trivial vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val index = PqIndex.build(emb, "vec_id", "embedding",
      nList = 8, m = 8, k = 16)
    try {
      val queries = emb.filter($"vec_id" < 10)
      val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

      val adc = PqIndex.topK(queries, "vec_id", "embedding", index,
          k = 10, nProbe = 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val rr = PqIndex.topKRerank(queries, emb, "vec_id", "embedding", index,
          k = 10, nProbe = 3, rerankFactor = 4)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

      val adcRecall = (adc intersect exact).size.toDouble / exact.size
      val rrRecall = (rr intersect exact).size.toDouble / exact.size
      info(f"IVFPQ recall@10: adc=$adcRecall%.2f rerank=$rrRecall%.2f")
      assert(adcRecall > 0.15, s"ADC recall collapsed: $adcRecall")
      assert(rrRecall >= adcRecall,
        s"exact re-rank must not lose recall: $rrRecall < $adcRecall")
      assert(rrRecall > 0.3, s"rerank recall collapsed: $rrRecall")
    } finally index.close()
  }

  test("quantization floors: full-probe recall@10 ≥ 0.6 ADC, ≥ 0.8 reranked") {
    // nProbe = nList removes the IVF probe loss, so what these floors pin
    // is the QUANTIZATION quality itself (m=32 subspaces of 2 dims, 32
    // centroids each on the 64-dim fixture). A codebook-training or
    // LUT-indexing regression drags ADC recall well below 0.6; the exact
    // re-rank over an 8× shortlist must recover nearly all of the rest.
    val emb = Tables.embeddings(spark, sf)
    val index = PqIndex.build(emb, "vec_id", "embedding",
      nList = 4, m = 32, k = 32)
    try {
      val queries = emb.filter($"vec_id" < 20)
      val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val adc = PqIndex.topK(queries, "vec_id", "embedding", index,
          k = 10, nProbe = 4)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val rr = PqIndex.topKRerank(queries, emb, "vec_id", "embedding", index,
          k = 10, nProbe = 4, rerankFactor = 8)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val adcRecall = (adc intersect exact).size.toDouble / exact.size
      val rrRecall = (rr intersect exact).size.toDouble / exact.size
      info(f"full-probe IVFPQ recall@10: adc=$adcRecall%.2f rerank=$rrRecall%.2f")
      assert(adcRecall >= 0.6, s"ADC quantization floor broken: $adcRecall")
      assert(rrRecall >= 0.8, s"rerank floor broken: $rrRecall")
    } finally index.close()
  }

  test("codes at rest carry no raw vectors; ranks are a valid 1..k prefix") {
    val emb = Tables.embeddings(spark, sf).limit(120)
    val index = PqIndex.build(emb, "vec_id", "embedding",
      nList = 4, m = 4, k = 8)
    try {
      assert(index.encoded.columns.toSet == Set("nn_id", "cell", "codes"),
        s"raw vectors leaked into the index: ${index.encoded.columns.mkString(",")}")
      val ann = PqIndex.topK(emb.filter($"vec_id" < 3), "vec_id", "embedding",
        index, k = 5, nProbe = 4)
      val byQ = ann.select($"query_id", $"rank").as[(Long, Int)].collect()
        .groupBy(_._1).values
      assert(byQ.forall(rs => rs.map(_._2).sorted.toSeq == (1 to rs.length)))
    } finally index.close()
  }
}
