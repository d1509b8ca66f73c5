package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
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

  /** PROBABILISTIC RECORD LINKAGE over the raw patient export — the
    * reference's stated-but-unrealized intent: `requirements.txt:25`
    * pins the `recordlinkage` library but `exo_1.py` never imports it,
    * and the exact five-key dedup is all that ships. This is the
    * Fellegi–Sunter model that library implements, run unsupervised
    * (Winkler EM, the q306 machinery) against the REAL export: the
    * planted re-registration pairs (Larsen/Debbie and Muncie/Samuel,
    * identical on every identity field but carrying a NEW
    * HOSPITAL_PATIENT_ID) come out as the top-weight links, with
    * fitted per-field m/u to justify the decision — what a pure
    * id-equality dedup can never produce.
    *
    * Shape: sorted-neighborhood blocking on (NOM, PRENOM, row order)
    * — candidate volume exactly n·window, never a cross join — then
    * the 5-field agreement patterns collapse to a ≤32-row grain; 3 EM
    * rounds run on that grain (O(32) work each, whatever the corpus);
    * scoring is one broadcast of the fitted 1-row params back onto
    * the candidate pairs. Returns (links, params): candidate pairs at
    * or above `minScoreBits` of log₂ match evidence, and the fitted
    * per-field m/u table. */
  def linkageReport(staged: DataFrame, window: Int = 3,
                    minScoreBits: Double = 8.0): (DataFrame, DataFrame) = {
    import graft.functions.SortedSumD.{sortedSum => ssum}
    val fields = dedupKeys // NOM, PRENOM, DATE_NAISSANCE, ADRESSE, TEL
    val n = fields.length
    // deterministic row order for the blocking key: a two-phase global
    // rank over ALL identity fields (not monotonically_increasing_id,
    // whose value depends on partition layout — the candidate pair set
    // would change across partitionings; rows still tied on every field
    // are genuinely interchangeable). Zero-padded to fixed width before
    // concat_ws so the string sort orders it numerically ('10' < '2'
    // otherwise).
    val ordered = Dedup.numberRows(
      staged.select((fields :+ "HOSPITAL_PATIENT_ID").map(col): _*),
      order = struct((fields :+ "HOSPITAL_PATIENT_ID").map(col): _*),
      as = "__ord")
    // %019d, not lpad(12): lpad TRUNCATES strings longer than its
    // width, so a rank >= 10^12 would silently corrupt the blocking
    // key's sort order; 19 digits hold any positive Long (advisor r13)
    val snm = graft.ops.DedupOps.sortedNeighborhoodPairs(ordered,
      concat_ws("|", col("NOM"), col("PRENOM"),
        format_string("%019d", col("__ord"))), window)
    val agCols = fields.zipWithIndex.map { case (f, i) =>
      when(coalesce(col(s"a.$f"), lit("")) ===
        coalesce(col(s"b.$f"), lit("")), 1.0d).otherwise(0.0d)
        .as(s"g${i + 1}")
    }
    val pairs = graft.ops.Caches.small(snm.select(
      Seq(col("a.NOM").as("nom"), col("a.PRENOM").as("prenom"),
        col("a.HOSPITAL_PATIENT_ID").as("hpid_a"),
        col("b.HOSPITAL_PATIENT_ID").as("hpid_b")) ++ agCols: _*))
    val gs = (1 to n).map(i => col(s"g$i"))
    val pat = graft.ops.Caches.small(
      pairs.groupBy(gs: _*).agg(count(lit(1)).cast("double").as("cnt")))
    // one EM round on the pattern grain (the q306 idiom: no pow —
    // m^g·(1−m)^(1−g) is linear in the agreement bit; sorted folds)
    def emRound(pp: DataFrame): DataFrame = {
      def lik(p: String) = (1 to n).map(i =>
        col(s"g$i") * col(s"$p$i") +
          (lit(1.0d) - col(s"g$i")) * (lit(1.0d) - col(s"$p$i")))
        .reduce(_ * _)
      val withG = pat.crossJoin(broadcast(pp))
        .withColumn("pm", lik("m")).withColumn("pu", lik("u"))
        .withColumn("g", col("p") * col("pm") /
          (col("p") * col("pm") + (lit(1.0d) - col("p")) * col("pu")))
      def sfold(c: Column) = ssum(collect_list(c))
      val aggs =
        (sfold(col("g") * col("cnt")) / sfold(col("cnt"))).as("p") +:
        (1 to n).map(i => (sfold(col("g") * col("cnt") * col(s"g$i")) /
          sfold(col("g") * col("cnt"))).as(s"m$i")) ++:
        (1 to n).map(i =>
          (sfold((lit(1.0d) - col("g")) * col("cnt") * col(s"g$i")) /
            sfold((lit(1.0d) - col("g")) * col("cnt"))).as(s"u$i"))
      withG.agg(aggs.head, aggs.tail: _*)
    }
    val init = staged.sparkSession.range(1).select(
      lit(0.1d).as("p") +:
        ((1 to n).map(i => lit(0.9d).as(s"m$i")) ++
          (1 to n).map(i => lit(0.1d).as(s"u$i"))): _*)
    var fitted = init
    for (_ <- 1 to 3) fitted = emRound(fitted)
    // clamp away EM-degenerate 0/1 estimates before the log-odds
    val clamped = graft.ops.Caches.small(fitted.select(
      col("p") +: (1 to n).flatMap(i => Seq(
        least(greatest(col(s"m$i"), lit(1e-6d)), lit(1 - 1e-6d))
          .as(s"m$i"),
        least(greatest(col(s"u$i"), lit(1e-6d)), lit(1 - 1e-6d))
          .as(s"u$i"))): _*))
    val bits = (1 to n).map(i =>
      when(col(s"g$i") === 1.0d, log2(col(s"m$i") / col(s"u$i")))
        .otherwise(log2((lit(1.0d) - col(s"m$i")) /
          (lit(1.0d) - col(s"u$i"))))).reduce(_ + _)
    val links = pairs.crossJoin(broadcast(clamped))
      .withColumn("score_bits", round(bits, 2))
      .filter(col("score_bits") >= minScoreBits)
      .select("nom", "prenom", "hpid_a", "hpid_b", "score_bits")
    val params = clamped.select(explode(array(fields.zipWithIndex.map {
        case (f, i) => struct(lit(f).as("field"),
          round(col(s"m${i + 1}"), 4).as("m"),
          round(col(s"u${i + 1}"), 4).as("u"))
      }: _*)).as("f"))
      .select(col("f.field"), col("f.m"), col("f.u"))
    (links, params)
  }
}
