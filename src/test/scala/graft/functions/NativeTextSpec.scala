package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables
import graft.text.TextAnalysis

class NativeTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tricky = Seq(
    "the cat sat on the mat and it is that",            // en
    "der hund ist nicht mit der katze und das",         // de
    "le chat est dans la maison pour les enfants",      // fr
    "el perro es un animal para los niños en casa",     // es
    "o gato é um animal para os meninos em casa",       // pt
    "a a a",                                            // "a" ∈ en AND pt → tie → pt wins
    "这是一个中文句子有很多汉字在里面",                      // zh by script
    "qwerty zxcvb plmokn",                              // no hits → und
    "",                                                 // empty → und
    "   ",                                              // spaces only → und
    "the der le el o",                                  // 5-way tie → pt (last in sorted order)
    "\tthe\tis\t")                                      // tabs: trim() strips 0x20 only

  test("native langId is identical to the pure fold on tricky cases") {
    val df = tricky.toDF("text")
    val got = df.select(
      TextAnalysis.langId($"text").as("native"),
      TextAnalysis.langIdPure($"text").as("pure"))
      .as[(String, String)].collect()
    got.zip(tricky).foreach { case ((n, p), t) =>
      assert(n == p, s"mismatch on '$t': native=$n pure=$p")
    }
    // and the intended labels hold
    val labels = got.map(_._1).toSeq
    assert(labels.take(8) == Seq("en", "de", "fr", "es", "pt", "pt", "zh", "und"))
  }

  test("native langId matches the pure fold over the documents table") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
      TextAnalysis.langId($"text").as("native"),
      TextAnalysis.langIdPure($"text").as("pure"))
      .filter(not($"native" <=> $"pure"))
      .count()
    assert(diff == 0L)
  }

  test("textStats struct is bit-identical to the pure per-column expressions") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text")
      .unionByName(Seq("", "   ", "\tmixed\tws!", "élan café ... 123_abc ?!")
        .toDF("text"))
    val t = $"text"
    val diff = docs.select(
      graft.functions.NativeText.textStats(t).as("ts"),
      TextAnalysis.tokenCount(t).as("p_tokens"),
      TextAnalysis.bpeishCount(t).as("p_bpeish"),
      TextAnalysis.punctCount(t).as("p_punct"),
      TextAnalysis.stopwordRatio(t).as("p_stop"),
      TextAnalysis.qualityScore(t).as("p_quality"))
      .filter(
        $"ts.n_tokens" =!= $"p_tokens" || $"ts.n_bpeish" =!= $"p_bpeish" ||
          $"ts.n_punct" =!= $"p_punct" ||
          // bitwise, not approximate: same op order by construction
          not($"ts.stop_ratio" <=> $"p_stop") ||
          not($"ts.quality" <=> $"p_quality"))
      .count()
    assert(diff == 0L)
  }

  test("null text → 'und' on both forms") {
    val df = Seq(Some("the is a"), None).toDF("text")
    val got = df.select(
      TextAnalysis.langId($"text").as("native"),
      TextAnalysis.langIdPure($"text").as("pure"))
      .as[(String, String)].collect()
    assert(got(1)._1 == "und" && got(1)._2 == "und")
  }

  test("native langId runs inside WholeStageCodegen") {
    val df = spark.range(4)
      .select(concat(lit("the cat number "), col("id").cast("string")).as("t"))
      .select(TextAnalysis.langId($"t").as("l"))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("*(1) Project"), s"codegen collapsed:\n$p")
    assert(p.contains("graft_langid"), s"native expr missing:\n$p")
    df.collect()
  }

  test("graft_text_stats is callable from SQL") {
    NativeHashes.register(spark)
    Seq("the quick brown fox. it is fast!").toDF("text")
      .createOrReplaceTempView("nts_t")
    val row = spark.sql(
      "SELECT s.n_tokens, s.n_punct FROM (SELECT graft_text_stats(text) s FROM nts_t)")
      .as[(Int, Int)].head()
    assert(row == ((7, 2)))
  }

  test("normalizeUnicode composes NFC and matches java.text.Normalizer on edge cases") {
    val cases = Seq(
      "é",            // e + combining acute → é (1 codepoint)
      "àb̂",     // two combining sequences
      "ﬁle",           // ﬁ ligature: NFC keeps it, NFKC expands to "fi"
      "ｆｕｌｌｗｉｄｔｈ",   // full-width forms: NFKC folds to ASCII
      "already plain ascii",
      "",
      "é")                  // pre-composed stays as-is
    val df = cases.toDF("raw")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = df.select(NativeText.normalizeUnicode($"raw", form)).as[String].collect()
      val want = cases.map(s =>
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form)))
      assert(got.toSeq == want, s"form=$form")
    }
    // NFC composes the combining pair: length drops from 2 to 1
    val lens = df.select(length(NativeText.normalizeUnicode($"raw", "NFC")))
      .as[Int].collect()
    assert(lens(0) == 1)
  }

  test("normalizeUnicode: null \u2192 null, runs inside WholeStageCodegen") {
    val df = Seq(Some("e\u0301"), None).toDF("raw")
      .select(NativeText.normalizeUnicode($"raw").as("n"))
    assert(df.as[Option[String]].collect().toSeq == Seq(Some("\u00e9"), None))
    // literal input is constant-folded away (expression is foldable); use a
    // non-foldable source to observe the codegen span
    val wide = spark.range(3)
      .select(concat(lit("e\u0301 nr "), col("id").cast("string")).as("raw"))
      .select(NativeText.normalizeUnicode($"raw").as("n"))
    val plan = wide.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project"), s"codegen collapsed:\n$plan")
    assert(wide.as[String].collect().forall(_.startsWith("\u00e9 nr ")))
  }

  test("graft_normalize is callable from SQL, form defaults to NFC") {
    NativeHashes.register(spark)
    Seq("é ﬁ").toDF("raw").createOrReplaceTempView("nn_t")
    val got = spark.sql(
      "SELECT graft_normalize(raw), graft_normalize(raw, 'NFKC') FROM nn_t")
      .as[(String, String)].head()
    assert(got._1 == "é ﬁ")   // NFC: ligature preserved
    assert(got._2 == "é fi")       // NFKC: ligature expanded
  }

  test("graft_normalize rejects unknown/null forms with a clear analysis-time error") {
    NativeHashes.register(spark)
    Seq("abc").toDF("raw").createOrReplaceTempView("nn_bad_t")
    val eSql = intercept[Exception] {
      spark.sql("SELECT graft_normalize(raw, 'NFX') FROM nn_bad_t").collect()
    }
    assert(eSql.getMessage.contains("NFX") && eSql.getMessage.contains("NFKD"),
      s"want the bad form and the allowed list in the message, got: ${eSql.getMessage}")
    val eNull = intercept[Exception] {
      spark.sql("SELECT graft_normalize(raw, NULL) FROM nn_bad_t").collect()
    }
    assert(eNull.getMessage.toLowerCase.contains("null"))
    val eApi = intercept[IllegalArgumentException] {
      Seq("abc").toDF("raw").select(NativeText.normalizeUnicode($"raw", "nope"))
    }
    assert(eApi.getMessage.contains("nope"))
  }

  test("graft_langid is callable from SQL") {
    NativeHashes.register(spark)
    // note: "und" itself is a German stopword — use hit-free junk tokens
    Seq("xyzzy check", "the is a the").toDF("text").createOrReplaceTempView("nt_t")
    val got = spark.sql("SELECT graft_langid(text) FROM nt_t ORDER BY text")
      .as[String].collect().toList
    assert(got == List("en", "und"))
  }
}
