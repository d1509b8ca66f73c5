package graft.engine

import org.apache.spark.sql.types._

/** Warehouse table schemas — the three i2b2-style DWH tables from the
  * reference's `drwh.db` DDL (FIXTURES.md §1.3), normalized per
  * SURVEY.md §7.4: date columns are DateType inside the engine (the
  * reference stores `dd/MM/yyyy` strings in SQLite TEXT affinity),
  * surrogate keys are LongType, flags IntegerType.
  */
object Schemas {

  /** DWH_PATIENT — 22 columns, PK PATIENT_NUM. */
  val dwhPatient: StructType = StructType(Seq(
    StructField("PATIENT_NUM", LongType, nullable = false),
    StructField("LASTNAME", StringType),
    StructField("FIRSTNAME", StringType),
    StructField("BIRTH_DATE", DateType),
    StructField("SEX", StringType),
    StructField("MAIDEN_NAME", StringType),
    StructField("RESIDENCE_ADDRESS", StringType),
    StructField("PHONE_NUMBER", StringType),
    StructField("ZIP_CODE", StringType),
    StructField("RESIDENCE_CITY", StringType),
    StructField("DEATH_DATE", DateType),
    StructField("RESIDENCE_COUNTRY", StringType),
    StructField("RESIDENCE_LATITUDE", StringType),
    StructField("RESIDENCE_LONGITUDE", StringType),
    StructField("DEATH_CODE", StringType),
    StructField("UPDATE_DATE", DateType),
    StructField("BIRTH_COUNTRY", StringType),
    StructField("BIRTH_CITY", StringType),
    StructField("BIRTH_ZIP_CODE", StringType),
    StructField("BIRTH_LATITUDE", DoubleType),
    StructField("BIRTH_LONGITUDE", DoubleType),
    StructField("UPLOAD_ID", LongType)))

  /** DWH_PATIENT_IPPHIST — 5 columns, no PK (history table). */
  val dwhPatientIpphist: StructType = StructType(Seq(
    StructField("PATIENT_NUM", LongType, nullable = false),
    StructField("HOSPITAL_PATIENT_ID", StringType),
    StructField("ORIGIN_PATIENT_ID", StringType),
    StructField("MASTER_PATIENT_ID", StringType),
    StructField("UPLOAD_ID", LongType)))

  /** DWH_DOCUMENT — 19 columns, PK DOCUMENT_NUM. */
  val dwhDocument: StructType = StructType(Seq(
    StructField("DOCUMENT_NUM", LongType, nullable = false),
    StructField("PATIENT_NUM", LongType),
    StructField("ENCOUNTER_NUM", StringType),
    StructField("TITLE", StringType),
    StructField("DOCUMENT_ORIGIN_CODE", StringType),
    StructField("DOCUMENT_DATE", DateType),
    StructField("ID_DOC_SOURCE", StringType),
    StructField("DOCUMENT_TYPE", StringType),
    StructField("DISPLAYED_TEXT", StringType),
    StructField("AUTHOR", StringType),
    StructField("UNIT_CODE", StringType),
    StructField("UNIT_NUM", LongType),
    StructField("DEPARTMENT_NUM", LongType),
    StructField("EXTRACTCONTEXT_DONE_FLAG", IntegerType),
    StructField("EXTRACTCONCEPT_DONE_FLAG", IntegerType),
    StructField("ENRGENE_DONE_FLAG", IntegerType),
    StructField("ENRICHTEXT_DONE_FLAG", IntegerType),
    StructField("UPDATE_DATE", DateType),
    StructField("UPLOAD_ID", LongType)))
}
