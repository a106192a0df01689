package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T](0)

  test("tokens drops empty strings from repeated whitespace") {
    val got = Seq("  a  b\t c \n").toDF("t")
      .select(TF.tokens(col("t")).as("r")).collect()(0).getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
  }

  test("contentHash = base64(sha256), 44 chars, matches known vector") {
    // sha256("abc") is a published test vector
    assert(one[String](TF.contentHash(col("t")), "abc") ==
      "ungWv48Bz+pBQUDeXa4iI7ADYaOWF3qctBD/YfIAFa0=")
  }

  test("hash32 = first 8 hex chars of md5 as unsigned long") {
    // md5("abc") = 900150983cd24fb0... -> 0x90015098
    assert(one[Long](TF.hash32(col("t")), "abc") == 0x90015098L)
  }

  test("shingles: k-grams; shorter-than-k -> empty array") {
    val sh = Seq("a b c d").toDF("t")
      .select(TF.shingles(TF.tokens(col("t")), 3).as("r")).collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TF.shingles(TF.tokens(col("t")), 3).as("r")).collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("minhash signature: deterministic, monotone under the affine mix; empty -> no bands") {
    val df = Seq("w1 w2 w3 w4 w5").toDF("t")
      .withColumn("hashes", TF.shingleHashes(TF.shingles(TF.tokens(col("t")), 3)))
    val sig = df.select(TF.minhashSignature(col("hashes"), 8).as("r"))
      .collect()(0).getSeq[Long](0)
    assert(sig.size == 8 && sig.forall(v => v >= 0 && v < (1L << 32)))
    // identical text -> identical signature (determinism)
    val sig2 = df.select(TF.minhashSignature(col("hashes"), 8).as("r"))
      .collect()(0).getSeq[Long](0)
    assert(sig == sig2)
    // empty shingle set -> null minhash -> zero band keys
    val bands = Seq("a").toDF("t")
      .withColumn("hashes", TF.shingleHashes(TF.shingles(TF.tokens(col("t")), 3)))
      .select(TF.lshBands(TF.minhashSignature(col("hashes"), 8), 4, 2).as("r"))
      .collect()(0).getSeq[String](0)
    assert(bands.isEmpty)
  }

  test("simhash of a single token equals that token's hash32; hamming(x,x)=0") {
    val h = one[Long](TF.hash32(col("t")), "hello")
    val s = Seq("hello").toDF("t")
      .select(TF.simhash(TF.tokens(col("t"))).as("r")).collect()(0).getLong(0)
    assert(s == h)
    val d = Seq(("x")).toDF("t")
      .select(TF.hammingDistance(lit(12345L), lit(12345L)).as("r")).collect()(0).getLong(0)
    assert(d == 0L)
  }

  test("fingerprint is position-sensitive (unlike a bag hash)") {
    def fp(t: String): Long =
      Seq(t).toDF("t").select(TF.fingerprint(TF.tokens(col("t"))).as("r")).collect()(0).getLong(0)
    assert(fp("a b") != fp("b a"))
    assert(fp("a b") == fp("a b"))
    assert(fp("a b") >= 0 && fp("a b") < 2147483647L)
  }

  test("langId picks the marker-heavy language; no markers -> und") {
    assert(one[String](TF.langId(col("t")), "the cat and the dog is on the mat") == "en")
    assert(one[String](TF.langId(col("t")), "el gato y la casa de los perros") == "es")
    assert(one[String](TF.langId(col("t")), "qwerty zxcvb") == "und")
  }

  test("quality score stays in [0,1]") {
    Seq("", "short", "the " * 50 + "normal text of it is that for a while",
      "!!!???...;;;").foreach { t =>
      val q = one[java.lang.Double](TF.qualityScore(col("t")), t)
      assert(q >= 0.0 && q <= 1.0, s"q=$q for '$t'")
    }
  }

  test("unicodeNormalize: NFC composes, NFKC folds compatibility, strip drops marks") {
    def norm(mode: String, t: String): String =
      one[String](TF.unicodeNormalize(col("t"), mode), t)
    // decomposed e + combining acute (U+0301) composes to é (U+00E9)
    assert(norm("nfc", "café") == "café")
    // NFC leaves compatibility chars alone; NFKC folds the ﬁ ligature
    // (U+FB01) and fullwidth A (U+FF21)
    assert(norm("nfc", "ﬁle") == "ﬁle")
    assert(norm("nfkc", "ﬁle") == "file")
    assert(norm("nfkc", "ＡBC") == "ABC")
    // strip = NFD + drop combining marks, from either arrival form
    assert(norm("strip", "café") == "cafe")
    assert(norm("strip", "café") == "cafe")
    // ASCII fast path: unchanged through every mode
    Seq("nfc", "nfkc", "strip").foreach { m =>
      assert(norm(m, "plain ascii text 123!") == "plain ascii text 123!")
    }
  }
}
