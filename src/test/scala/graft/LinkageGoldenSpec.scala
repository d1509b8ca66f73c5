package graft

import graft.engine.Patients
import graft.sources.XlsxSource

/** Golden test: Fellegi–Sunter record linkage (Patients.linkageReport)
  * against the REAL reference export — the planted re-registration
  * pairs (identical identity fields, new HOSPITAL_PATIENT_ID) must be
  * exactly the links found, with a confident fitted model. */
class LinkageGoldenSpec extends SparkSpec {

  private val excelPath =
    "/root/reference/fichiers source/export_patient.xlsx"

  test("the planted Larsen/Debbie and Muncie/Samuel re-registrations " +
    "are exactly the pairs linked, by hospital-id sets") {
    assume(new java.io.File(excelPath).exists())
    val excel = XlsxSource.read(spark, excelPath)
    val (links, params) = Patients.linkageReport(excel)
    val got = links.collect().map(r =>
      (r.getAs[String]("nom"), r.getAs[String]("prenom"),
        Set(r.getAs[String]("hpid_a"), r.getAs[String]("hpid_b")),
        r.getAs[Double]("score_bits")))
    assert(got.length === 2, s"expected exactly the 2 planted pairs, " +
      s"got ${got.mkString("; ")}")
    val byName = got.map(g => (g._1, g._2) -> g._3).toMap
    assert(byName(("Larsen", "Debbie")) === Set("05866980", "00307440"))
    assert(byName(("Muncie", "Samuel")) === Set("06604836", "00302316"))
    // all-field agreement under a confident model: double-digit bits
    assert(got.forall(_._4 > 10.0),
      s"planted pairs should carry strong evidence: ${got.mkString("; ")}")
    // the fitted model is sane: every field separates (m > u), and
    // the blocking fields (NOM/PRENOM agree often among neighbors by
    // construction) still end below the identity fields' separation
    val pm = params.collect().map(r => r.getAs[String]("field") ->
      (r.getAs[Double]("m"), r.getAs[Double]("u"))).toMap
    for ((f, (m, u)) <- pm)
      assert(m > u, s"field $f: m=$m should exceed u=$u")
    assert(pm("DATE_NAISSANCE")._2 < 0.1,
      s"birth-date chance agreement should be rare: ${pm("DATE_NAISSANCE")}")
  }
}
