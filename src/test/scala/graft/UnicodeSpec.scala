package graft

import org.apache.spark.sql.functions._

/** NFC semantics pinned: composition of combining sequences, singleton
  * replacements (Angstrom/Ohm signs), Hangul jamo composition, the ASCII
  * identity fast path, and codegen ≡ interpreted.
  */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private val cases = Seq(
    ("Cafe\u0301", "Caf\u00E9"),          // combining acute composes
    ("\u212B", "\u00C5"),                 // Angstrom sign -> A-ring (singleton)
    ("A\u030A", "\u00C5"),                // A + combining ring composes
    ("\u1100\u1161\u11A8", "\uAC01"),   // Hangul jamo -> one syllable
    ("e\u0302tre", "\u00EAtre"),          // circumflex composes mid-word
    ("\u2126", "\u03A9"),                 // Ohm sign -> Greek omega
    ("Caf\u00E9", "Caf\u00E9"),           // already NFC: unchanged
    ("plain ascii 123", "plain ascii 123"))

  test("X5u NFC reference values, ASCII identity, null propagation") {
    val df = cases.toDF("raw", "expect")
      .select(call_function("graft_nfc", col("raw")).as("got"), col("expect"))
    assert(df.where(col("got") =!= col("expect")).count() == 0,
      df.collect().mkString(";"))
    val nulls = Seq(Option.empty[String]).toDF("raw")
      .select(call_function("graft_nfc", col("raw")).as("got")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("X5u codegen and interpreted paths agree") {
    val df = cases.toDF("raw", "expect")
    val viaCodegen = df.select(call_function("graft_nfc", col("raw"))).as[String].collect()
    var viaInterp: Seq[String] = Nil
    withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      viaInterp = df.select(call_function("graft_nfc", col("raw"))).as[String].collect().toSeq
    }
    assert(viaCodegen.toSeq == viaInterp)
  }
}
