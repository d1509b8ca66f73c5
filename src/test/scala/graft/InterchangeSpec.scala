package graft

import org.apache.spark.sql.functions._

/** Interchange-format round trips under HOSTILE content — q370 proves
  * losslessness on the benign synthetic corpus; this spec proves the
  * same writer/reader option sets survive the characters that actually
  * break CSV/JSON pipelines: embedded quotes, commas, newlines,
  * backslashes, unicode, leading/trailing spaces, and empty-vs-null.
  */
class InterchangeSpec extends SparkSpec {
  import spark.implicits._

  private val hostile = Seq(
    (1L, "plain text", "en"),
    (2L, "comma, separated, values", "en"),
    (3L, "says \"quoted\" twice \"\"", "en"),
    (4L, "line\nbreak and\r\nCRLF", "en"),
    (5L, "back\\slash and tab\there", "en"),
    (6L, "unicodé — ellipsis… emoji 😀 CJK 你好", "zh"),
    (7L, "  leading and trailing  ", "en"),
    (8L, "&entities; <tags> 'apostrophes'", "en"),
    (9L, null: String, null: String))

  test("JSONL round trip is lossless on hostile strings (quotes, " +
    "newlines, backslashes, unicode, nulls)") {
    val df = hostile.toDF("id", "text", "lang")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl").toString
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir)
      .orderBy("id").collect().toSeq
    assert(back === df.orderBy("id").collect().toSeq)
  }

  test("CSV round trip with the q370 option set (header, escape=\") " +
    "is lossless on hostile strings INCLUDING embedded newlines — " +
    "multiLine=true on read is part of the contract for such content") {
    val df = hostile.toDF("id", "text", "lang")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_csv").toString
    // the univocity WRITER trims unquoted leading/trailing whitespace
    // by DEFAULT (ignore*WhiteSpace=true on write, false on read) —
    // silently lossy; disabling it is part of the lossless option set
    df.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    val back = spark.read.schema(df.schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true") // quoted \n records span lines
      .csv(dir)
      .orderBy("id").collect().toSeq
    // CSV cannot distinguish null from empty string without a marker;
    // Spark reads both back as null — normalize that single lossy cell
    // class and assert everything else survives byte-identically
    val want = df.orderBy("id").collect().toSeq
    assert(back.size === want.size)
    for ((b, w) <- back.zip(want); i <- 0 until w.length) {
      val (bv, wv) = (b.get(i), w.get(i))
      if (wv == "") assert(bv == null || bv == "")
      else assert(bv === wv, s"col $i of id ${w.get(0)}")
    }
  }
}
