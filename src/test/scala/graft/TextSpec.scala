package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** Unit tests for the public Text column-function API. */
class TextSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect().head.getAs[T]("r")

  test("normalize collapses whitespace and lowercases") {
    assert(one[String](Text.normalize(col("text")), "  Hello   WORLD  ") == "hello world")
  }

  test("contentHash is invariant under whitespace/case noise") {
    val a = one[String](Text.contentHash(col("text")), "Alpha  Beta")
    val b = one[String](Text.contentHash(col("text")), " alpha beta ")
    assert(a == b && a.matches("[0-9a-f]{32}"))
  }

  test("wordNgrams produces n-grams in order, whole-doc fallback for short input") {
    val grams = Seq("a b c d").toDF("text")
      .select(Text.wordNgrams(Text.normTokens(col("text")), 3).as("g"))
      .as[Seq[String]].head()
    assert(grams == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(Text.wordNgrams(Text.normTokens(col("text")), 3).as("g"))
      .as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("minhashSignature: identical docs agree, signature is k-wide") {
    val df = Seq((1L, "x y z w v"), (2L, "x y z w v"), (3L, "completely different words here"))
      .toDF("id", "text")
      .select(col("id") +: Text.minhashSignature(Text.shingles(col("text"), 3), 4): _*)
    val rows = df.collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L) != rows(3L))
    assert(rows(1L).forall(_.matches("[0-9a-f]{32}")))
  }

  test("rollingHash is order-sensitive; setFingerprint is order-insensitive") {
    val ab = one[Long](Text.rollingHash(col("text")), "ab")
    val ba = one[Long](Text.rollingHash(col("text")), "ba")
    assert(ab != ba)
    val f1 = one[String](Text.setFingerprint(col("text")), "beta alpha")
    val f2 = one[String](Text.setFingerprint(col("text")), "alpha beta beta")
    assert(f1 == f2)
  }

  test("tokensInSet and bpeTokenCount") {
    assert(one[Int](Text.tokensInSet(Text.wsTokens(col("text")), Seq("the", "a")), "the cat a hat") == 2)
    assert(one[Int](Text.bpeTokenCount(col("text")), "ab 12 cd!") == 4)
  }

  test("redactPii replaces emails, IPs and phones; counts agree; clean text untouched") {
    val dirty = "mail bob.smith+x@example.co.uk from 10.0.12.9 or call 555-867-5309 now"
    assert(one[String](Text.redactPii(col("text")), dirty) ==
      "mail <EMAIL> from <IP> or call <PHONE> now")
    assert(one[Int](Text.piiCount(col("text")), dirty) == 3)
    // Email wins over the narrower patterns inside it (digits + dots).
    assert(one[String](Text.redactPii(col("text")), "x 192.168.0.1@host.com y") ==
      "x <EMAIL> y")
    val clean = "no personal data in this sentence at all"
    assert(one[String](Text.redactPii(col("text")), clean) == clean)
    assert(one[Int](Text.piiCount(col("text")), clean) == 0)
  }

  test("doc_boilerplate_ngrams: an injected template is flagged, unique salad is not") {
    // srcA: 10 docs share an 8-token banner prefix (6 trigrams recur in
    // all 10, the per-doc tail is unique); srcB: every trigram unique.
    val a = (1 to 10).map(i =>
      (i.toLong, s"subscribe to our free newsletter today unique body $i alpha beta", "srcA"))
    val b = (11 to 20).map(i =>
      (i.toLong, s"one two$i three$i four$i five$i", "srcB"))
    val docs = (a ++ b).toDF("doc_id", "text", "source")
    val got = graft.queries.PipelineCatalog.boilerplateFrom(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val sa = got("srcA")
    assert(sa.getLong(1) == 10 && sa.getLong(2) == 36, s"srcA frame counts: $sa")
    assert(sa.getLong(3) == 6, s"srcA: expected the 6 banner trigrams flagged, got $sa")
    assert(sa.getLong(4) == 10 && sa.getLong(5) == 60, s"srcA df/hits: $sa")
    assert(sa.getDouble(6) == 0.166667, s"srcA share: $sa")
    val sb = got("srcB")
    assert(sb.getLong(3) == 0 && sb.isNullAt(4) && sb.getLong(5) == 0,
      s"srcB must have no boilerplate: $sb")
  }
}
