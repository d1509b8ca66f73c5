package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{Documents, Patients}
import graft.sources.{DocxExtract, PdfExtract, XlsxSource}

/** JDBC warehouse round-trip: the reference's sink is a SQLite file
  * (`exo_1.py:196-197`; DDL in `drwh.db` — DWH_PATIENT /
  * DWH_PATIENT_IPPHIST / DWH_DOCUMENT). sqlite-jdbc cannot be vendored
  * in this zero-egress sandbox (no jar under /opt/spark/jars, the
  * offline coursier cache, or anywhere on disk — NOTES.md records the
  * attempt), so the JDBC boundary is proven against Derby, the embedded
  * JDBC database that SHIPS WITH Spark: same column set as the
  * reference DDL, same write → read round trip, and the PATIENT_NUM
  * gap semantics (`exo_1.py:123-131`: dropped duplicates burn their
  * number) asserted on the far side of the boundary.
  */
class JdbcRoundTripSpec extends SparkSpec {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private lazy val url = "jdbc:derby:" +
    java.nio.file.Files.createTempDirectory("graft_jdbc") + "/drwh;create=true"

  private def writeJdbc(df: DataFrame, table: String): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .mode("overwrite").save()

  private def readJdbc(table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .load()

  test("DWH_PATIENT / DWH_PATIENT_IPPHIST / DWH_DOCUMENT round-trip " +
    "through an embedded JDBC warehouse with the reference's column " +
    "set: 4826/4826/15 rows and the PATIENT_NUM gap semantics survive " +
    "the JDBC boundary") {
    // --- patient side (reference entry point 1, real Excel corpus) ---
    val excel = XlsxSource.read(spark,
      "/root/reference/fichiers source/export_patient.xlsx")
    val staged = excel.withColumn("__src_order",
      monotonically_increasing_id())
    val deduped = Patients.dedupAndNumber(staged)
    val patients = Patients.toDwhPatient(deduped, uploadId = 1L)
    val ipphist = Patients.toDwhIpphist(deduped, uploadId = 1L)

    writeJdbc(patients, "DWH_PATIENT")
    writeJdbc(ipphist, "DWH_PATIENT_IPPHIST")
    val pBack = readJdbc("DWH_PATIENT")
    val iBack = readJdbc("DWH_PATIENT_IPPHIST")
    assert(pBack.count() === 4826L)
    assert(iBack.count() === 4826L)
    assert(pBack.columns.toSet === patients.columns.toSet)

    // PATIENT_NUM semantics (exo_1.py:123-131): dropped duplicate rows
    // BURN their surrogate number, so the read-back key set must match
    // the pre-write set exactly. In the real corpus both duplicates are
    // the TRAILING rows (4827/4828 duplicate earlier patients), so the
    // kept set happens to be contiguous 1..4826 — asserted as such, and
    // the gap case is proven on a mid-stream-duplicate frame below.
    val sent = patients.select("PATIENT_NUM")
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = pBack.select("PATIENT_NUM")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === sent)
    assert(got === (1L to 4826L),
      "the real corpus's duplicates are its trailing rows")

    // GAP round-trip: a mid-stream duplicate burns number 2, and the
    // resulting {1, 3} key set — gap included — survives the JDBC
    // boundary (the DedupMergeSpec 1,2,4 semantics at the sink)
    import spark.implicits._
    val gapped = graft.engine.Dedup.numberThenDedup(
      Seq(("a", 10L), ("a", 11L), ("b", 12L)).toDF("k", "__src_order"),
      keys = Seq("k"), order = col("__src_order"),
      numCol = "PATIENT_NUM")
    writeJdbc(gapped.select("PATIENT_NUM", "k"), "GAP_DEMO")
    assert(readJdbc("GAP_DEMO").select("PATIENT_NUM")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))

    // --- document side (entry points 2+3: native PDF/DOCX extraction) -
    val extractText = udf((bytes: Array[Byte], path: String) =>
      if (path.endsWith(".docx")) DocxExtract.extractText(bytes)
      else if (path.endsWith(".pdf")) PdfExtract.extractText(bytes)
      else "")
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{pdf,docx}")
      .load("/root/reference/fichiers source")
      .withColumn("text", extractText(col("content"), col("path")))
      .select("path", "text")
    val docs = Documents.pipeline(files, ipphist, uploadId = 1L)
    writeJdbc(docs, "DWH_DOCUMENT")
    val dBack = readJdbc("DWH_DOCUMENT")
    assert(dBack.count() === 15L)
    assert(dBack.columns.toSet === docs.columns.toSet)
    // resolved FKs survive: every non-null PATIENT_NUM in the document
    // table exists in the patient table on the JDBC side
    val orphans = dBack.filter(col("PATIENT_NUM").isNotNull)
      .join(pBack.select("PATIENT_NUM"), Seq("PATIENT_NUM"), "left_anti")
      .count()
    assert(orphans === 0L)
  }
}
