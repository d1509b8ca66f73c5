package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Patient ingest pipeline — the reference's `update_patient_data`
  * (`exo_1.py:173-214`) re-expressed set-at-a-time:
  * staged source → keep-first dedup on the five identity keys with
  * PRE-dedup surrogate numbering (gap semantics, SURVEY.md §2 P5) →
  * schema-mapping projections to DWH_PATIENT / DWH_PATIENT_IPPHIST →
  * keyed MERGE into the warehouse.
  *
  * The staged input contract: one row per source record with the 12
  * export columns (FIXTURES.md §1.1) plus a monotone `__src_order`
  * column assigned at staging time (file row index).
  */
object Patients {

  /** The five identity keys of the reference dedup (`exo_1.py:32-34`). */
  val dedupKeys: Seq[String] =
    Seq("NOM", "PRENOM", "DATE_NAISSANCE", "ADRESSE", "TEL")

  /** Dedup + surrogate numbering: number every staged row in input order
    * FIRST, then keep the first row per identity-key group — so dropped
    * duplicates leave gaps in PATIENT_NUM exactly like the reference
    * (verified `exo_1.py:53,123-131`). */
  def dedupAndNumber(staged: DataFrame, orderCol: String = "__src_order"): DataFrame =
    Dedup.numberThenDedup(staged, dedupKeys, col(orderCol), "PATIENT_NUM")

  /** P1/P4 — 22-column DWH_PATIENT projection (`exo_1.py:41-84`):
    * renames, constant NULLs, DEATH_CODE encode, sink-format dates kept
    * as DateType internally (SURVEY.md §7.4). */
  def toDwhPatient(deduped: DataFrame, uploadId: Long): DataFrame =
    deduped.select(
      col("PATIENT_NUM"),
      col("NOM").as("LASTNAME"),
      col("PRENOM").as("FIRSTNAME"),
      TextFunctions.parseFrDate(col("DATE_NAISSANCE")).as("BIRTH_DATE"),
      col("SEXE").as("SEX"),
      col("NOM_JEUNE_FILLE").as("MAIDEN_NAME"),
      col("ADRESSE").as("RESIDENCE_ADDRESS"),
      col("TEL").as("PHONE_NUMBER"),
      col("CP").as("ZIP_CODE"),
      col("VILLE").as("RESIDENCE_CITY"),
      TextFunctions.parseFrDate(col("DATE_MORT")).as("DEATH_DATE"),
      col("PAYS").as("RESIDENCE_COUNTRY"),
      lit(null).cast("string").as("RESIDENCE_LATITUDE"),
      lit(null).cast("string").as("RESIDENCE_LONGITUDE"),
      TextFunctions.boolFlag(col("DATE_MORT").isNotNull).as("DEATH_CODE"),
      current_date().as("UPDATE_DATE"),
      lit(null).cast("string").as("BIRTH_COUNTRY"),
      lit(null).cast("string").as("BIRTH_CITY"),
      lit(null).cast("string").as("BIRTH_ZIP_CODE"),
      lit(null).cast("double").as("BIRTH_LATITUDE"),
      lit(null).cast("double").as("BIRTH_LONGITUDE"),
      lit(uploadId).as("UPLOAD_ID"))

  /** P2 — 5-column DWH_PATIENT_IPPHIST projection (`exo_1.py:87-109`):
    * constant ORIGIN_PATIENT_ID="SIH", MASTER_PATIENT_ID from the
    * truthiness of the hospital id (`exo_1.py:104-105`). */
  def toDwhIpphist(deduped: DataFrame, uploadId: Long): DataFrame =
    deduped.select(
      col("PATIENT_NUM"),
      col("HOSPITAL_PATIENT_ID"),
      lit("SIH").as("ORIGIN_PATIENT_ID"),
      TextFunctions.boolFlag(TextFunctions.truthy(col("HOSPITAL_PATIENT_ID")))
        .as("MASTER_PATIENT_ID"),
      lit(uploadId).as("UPLOAD_ID"))
}
