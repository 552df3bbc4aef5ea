package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq("the cat, sat!", "  spaced   out  ", "").toDF("t")
    val got = df.select(
      TextAnalysis.tokenCount($"t").as("w"),
      TextAnalysis.bpeishCount($"t").as("b")).as[(Int, Int)].collect().toSeq
    // "the cat, sat!" → whitespace [the, cat,, sat!]; bpeish [the,cat,',',sat,'!']
    assert(got(0) == ((3, 5)))
    assert(got(1)._1 == 2)
  }

  test("punct + stopword ratios") {
    val df = Seq("the end. of the line!").toDF("t")
    val (p, s) = df.select(
      TextAnalysis.punctCount($"t").as("p"),
      TextAnalysis.stopwordRatio($"t").as("s")).as[(Int, Double)].head()
    assert(p == 2)
    // tokens: [the, end., of, the, line!] → stopword hits: the, of, the
    assert(math.abs(s - 3.0 / 5.0) < 1e-12)
  }

  test("langId picks the language whose stopwords dominate; zh by script") {
    val df = Seq(
      "the cat is in the house and it is warm",
      "der hund ist nicht mit der katze und das ist gut",
      "le chat est dans la maison et la vie est belle",
      "el perro es un animal y la casa es grande",
      "这是一个中文句子这是一个中文句子",
      "zzz qqq xxx").toDF("t")
    val got = df.select(TextAnalysis.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "es", "zh", "und"))
  }

  test("quality score stays in [0,1]") {
    val df = Seq("", "a", "the quick brown fox jumps over the lazy dog. " * 20,
      "!!!!!!!!", "word " * 200).toDF("t")
    val got = df.select(TextAnalysis.qualityScore($"t")).as[Double].collect()
    got.foreach(q => assert(q >= 0.0 && q <= 1.0, s"quality $q out of range"))
  }

  test("contentFingerprint is whitespace/case-insensitive but content-sensitive") {
    val df = Seq(
      ("a", "Hello  World"), ("b", "hello world"), ("c", " hello   world  "),
      ("d", "hello worlds")).toDF("id", "t")
    val fps = df.select($"id", TextAnalysis.contentFingerprint($"t").as("fp"))
      .as[(String, Long)].collect().toMap
    assert(fps("a") == fps("b") && fps("b") == fps("c"))
    assert(fps("a") != fps("d"))
  }

  test("normalize: lowercases, strips urls/emails/punct, collapses space") {
    val got = Seq(
      "Visit https://example.com/x?q=1 NOW!!",
      "mail me at bob@example.com, please…",
      "  Já   está\tlimpo 123  ",
      "!!!").toDF("t")
      .select(TextAnalysis.normalize($"t")).as[String].collect().toSeq
    assert(got == Seq("visit now", "mail me at please", "j est limpo 123", ""))
  }

  test("winnowFingerprint stable under whitespace normalization") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "  the   quick brown fox jumps over the lazy dog  "),
      ("c", "an entirely different document about spark engines")).toDF("id", "t")
    val fps = df.select($"id", TextAnalysis.winnowFingerprint($"t").as("fp"))
      .as[(String, Long)].collect().toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }
}
