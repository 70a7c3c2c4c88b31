package graft.pipelines

import graft.functions.RefFunctions
import graft.geo.Geo
import graft.operators.{AddressOps, ColumnOps, DedupOps, TimeOps}
import graft.tables.MasterTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The flagship 311-requests pipeline — the Spark rebuild of the
  * hourly `qalert_requests` DAG (SURVEY §3.1; af2_dags/qalert_airflow
  * .py:247-249's 13 tasks collapse into this one driver program).
  *
  * Stage boundaries that were GCS/BigQuery round-trips in the
  * reference become plain DataFrame lineage; the two master tables
  * (`all_linked_requests`, `all_tickets_current_status`) are rewritten
  * per batch via deterministic join-and-overwrite (no in-place
  * UPDATE/DELETE in Spark).
  */
object QalertPipeline {

  import graft.sources.SchemaRegistry.flatSchema

  /** Raw camelCase API shape (FIXTURES.md §1;
    * qalert_requests_dataflow.py:80-103).
    */
  val rawSchema: StructType = flatSchema(
    "id" -> LongType, "master" -> LongType, "status" -> IntegerType,
    "typeId" -> LongType, "typeName" -> StringType,
    "addDateUnix" -> LongType, "lastActionUnix" -> LongType,
    "closeDate" -> StringType,
    "streetNum" -> StringType, "streetName" -> StringType,
    "crossStreetName" -> StringType, "streetId" -> LongType,
    "crossStreetId" -> LongType, "cityName" -> StringType,
    "latitude" -> DoubleType, "longitude" -> DoubleType,
    "comments" -> StringType, "privateNotes" -> StringType,
    "origin" -> StringType, "dept" -> StringType,
    // dropped on ingest (qalert_requests_dataflow.py:96-98)
    "addDate" -> StringType, "lastAction" -> StringType,
    "displayDate" -> StringType, "displayLastAction" -> StringType,
    "district" -> StringType, "submitter" -> StringType,
    "priorityValue" -> LongType, "aggregatorId" -> LongType,
    "priorityToDisplay" -> StringType, "aggregatorInfo" -> StringType,
    "resumeDate" -> StringType, "cityId" -> LongType)

  val fieldNameSwaps: Seq[(String, String)] = Seq(
    "master" -> "parent_ticket_id", "addDateUnix" -> "create_date_unix",
    "lastActionUnix" -> "last_action_unix", "status" -> "status_code",
    "streetNum" -> "pii_street_num", "streetName" -> "street",
    "crossStreetName" -> "cross_street", "comments" -> "pii_comments",
    "privateNotes" -> "pii_private_notes", "latitude" -> "pii_lat",
    "longitude" -> "pii_long", "cityName" -> "city",
    "typeId" -> "request_type_id", "typeName" -> "request_type_name")

  val dropFields: Seq[String] = Seq(
    "addDate", "lastAction", "displayDate", "displayLastAction",
    "district", "submitter", "priorityValue", "aggregatorId",
    "priorityToDisplay", "aggregatorInfo", "resumeDate", "cityId")

  /** Stage 2 — the record-transform chain
    * (qalert_requests_dataflow.py:126-146, DoFn-for-DoFn).
    */
  def transform(raw: DataFrame): DataFrame = {
    // ReplacePII on comments (retain location), before any other use
    val redacted = raw.withColumn("anon_comments",
      RefFunctions.redactPiiUdf(col("comments")))
    // SwapFieldNames → FilterFields → (names already snake) →
    // GetDateStringsFromUnix
    val renamed = ColumnOps.filterFields(
      ColumnOps.renameFields(redacted, fieldNameSwaps), dropFields)
    val dated = Seq("create_date_unix", "last_action_unix")
      .foldLeft(renamed)((d, f) => TimeOps.dateStringsFromUnix(d, f))
    // ChangeDataTypes: ids → strings (qalert_requests_dataflow.py:103-104)
    val typed = ColumnOps.changeTypes(dated, Seq(
      "id" -> ColumnOps.RStr, "parent_ticket_id" -> ColumnOps.RStr,
      "status_code" -> ColumnOps.RStr, "streetId" -> ColumnOps.RStr,
      "crossStreetId" -> ColumnOps.RStr, "request_type_id" -> ColumnOps.RStr))
    // GetStatus / GetClosedDate / DetectChildTicketStatus
    val statused = typed
      .withColumn("status_name",
        when(col("status_code") === "0", "open")
          .when(col("status_code") === "1", "closed")
          .when(col("status_code") === "3", "in progress")
          .when(col("status_code") === "4", "on hold"))
      .withColumn("closed_date_unix",
        when(col("status_name") === "closed", col("last_action_unix")))
      .withColumn("closed_date_utc",
        when(col("status_name") === "closed", col("last_action_unix_utc")))
      .withColumn("closed_date_est",
        when(col("status_name") === "closed", col("last_action_unix_est")))
      .drop("closeDate")
      // DetectChildTicketStatus (qalert_requests_dataflow.py:57-62) is
      // `parent == "0" ? False : True` in Python, where a missing/None
      // parent is != "0" — so a NULL parent_ticket_id is a CHILD. A
      // bare =!= would leave it NULL, and the row would satisfy
      // NEITHER integrate() branch and silently vanish from the
      // linked-requests master
      .withColumn("child_ticket",
        coalesce(col("parent_ticket_id") =!= "0", lit(true)))
    // FormatAndClassifyAddress (+ anonymization twins)
    val classified = AddressOps.formatAndClassifyAddress(statused,
      streetNum = "pii_street_num", streetName = "street",
      crossStreet = "cross_street", city = "city",
      lat = "pii_lat", long = "pii_long", containsPii = true)
    classified
      .withColumn("anon_lat", RefFunctions.anonymizeCoord(col("pii_lat"), 200))
      .withColumn("anon_long", RefFunctions.anonymizeCoord(col("pii_long"), 200))
      .withColumn("anon_input_address",
        RefFunctions.anonymizeBlockUdf(100)(col("pii_input_address")))
  }

  /** Stage 4 — format/dedupe (format_incoming_data_types,
    * transform_enrich_requests.py:120-151): SELECT DISTINCT with typed
    * time/coord columns.
    */
  def formatDedupe(df: DataFrame): DataFrame =
    DedupOps.distinctRows(df)
      .withColumn("pii_lat", col("pii_lat").cast(DoubleType))
      .withColumn("pii_long", col("pii_long").cast(DoubleType))

  /** Stages 5-6 — city-limits reclassification + 8-family time-bounded
    * reverse geocode (geo_queries.py:123-154, :35-108).
    *
    * Parity note: missing-coordinate tickets reach this stage with
    * lat/long 0.0 (FormatAndClassifyAddress coerces None → 0.0,
    * dataflow_utils.py:437-443), so against a real city polygon they
    * classify 'Outside of City' — exactly what the reference's UPDATE
    * does, since its `WHERE lat IS NOT NULL` guard never sees a NULL
    * after that same coercion.
    */
  def enrich(df: DataFrame, cityWkt: String, enclaveWkt: String,
             zoneFamilies: Map[String, Seq[(String, String, Long, Option[Long])]]): DataFrame = {
    val limited = Geo.cityLimits(df, cityWkt, enclaveWkt,
      latCol = "pii_lat", longCol = "pii_long")
    Geo.revGeoTimeBound(limited, zoneFamilies,
      latCol = "pii_lat", longCol = "pii_long",
      eventUnixCol = "create_date_unix")
  }

  /** Master-table state carried between runs. */
  final case class Masters(allLinked: DataFrame, currentStatus: DataFrame)

  /** Stages 7-11 — integrate a batch into the master tables
    * (integrate_new_requests.py + qalert_airflow.py:148-217):
    *  7. insert never-seen parents into `all_linked_requests`
    *  8. remove false parents (tickets that re-arrive as children)
    *  9. aggregate new children onto their parents (ARRAY_AGG append)
    * 10. replace last-update fields of previously-seen parents
    * 11. delete+insert snapshot upsert of `all_tickets_current_status`
    */
  def integrate(masters: Masters, enriched: DataFrame): Masters = {
    val parents  = enriched.filter(!col("child_ticket"))
    val children = enriched.filter(col("child_ticket"))

    // 8: previously-parent tickets that now arrive as children — one
    // anti-join against the children's ids (a semi-join intermediate
    // would re-scan the master's key set for no semantic difference)
    val cleaned = MasterTables.deleteMatching(masters.allLinked,
      children.select(col("id")), Seq("id"))

    // 7: new parents, initialised with an empty child array
    val newParents = parents
      .join(cleaned.select(col("id")), Seq("id"), "left_anti")
      .withColumn("child_tickets",
        array().cast(ArrayType(childStruct)))
      .withColumn("num_requests", lit(1L))
    val withNew = cleaned.unionByName(newParents.select(cleaned.columns.map(col).toIndexedSeq: _*))

    // 9: append this batch's children to their parents — struct shape
    // (child_id, child_comments, child_notes) per
    // integrate_new_requests.py:213-216
    val childShaped = children.select(
      col("parent_ticket_id"),
      col("id").as("child_id"),
      col("anon_comments").as("child_comments"),
      col("pii_private_notes").as("child_notes"))
    val withChildren = MasterTables.integrateChildren(
      withNew, childShaped,
      parentKey = "id", childParentKey = "parent_ticket_id",
      childCols = Seq("child_id", "child_comments", "child_notes"))

    // 10: refresh status/close/last-action fields from re-arriving parents
    val updated = MasterTables.syncUpdate(withChildren, parents,
      keys = Seq("id"),
      updateCols = Seq("status_code", "status_name",
        "last_action_unix", "last_action_unix_utc", "last_action_unix_est",
        "closed_date_unix", "closed_date_utc", "closed_date_est"))

    // 11: snapshot upsert of the current-status table (all tickets,
    // parent or child)
    val current = MasterTables.deleteOldInsertNew(
      masters.currentStatus, enriched, keys = Seq("id"))

    Masters(updated, current)
  }

  private val childStruct = StructType(Seq(
    StructField("child_id", StringType), StructField("child_comments", StringType),
    StructField("child_notes", StringType)))

  /** Stage 12 — scrubbed export (drop_pii,
    * transform_enrich_requests.py:97-117): safe columns only, children
    * rendered as a JSON string with null-id entries filtered (the
    * reference's `WHERE child_id IS NOT NULL` inside the ARRAY
    * subquery; its `SELECT AS STRUCT *` passes child_comments AND
    * child_notes through, reproduced here), private request types
    * filtered out with SQL `NOT IN` semantics — a NULL
    * request_type_name is excluded, exactly as `NOT IN` evaluates to
    * NULL in BigQuery (a coalesce-to-'' would export those rows).
    */
  def dropPiiForExport(master: DataFrame, privateTypes: Seq[String]): DataFrame =
    master
      .filter(col("request_type_name").isNotNull &&
        !col("request_type_name").isin(privateTypes: _*))
      .select(
        col("id"), col("parent_ticket_id"), col("child_ticket"),
        col("status_name"), col("request_type_name"),
        col("create_date_unix"), col("create_date_unix_utc"), col("create_date_unix_est"),
        col("last_action_unix"), col("closed_date_unix"),
        col("address_type"), col("anon_input_address"),
        col("anon_lat"), col("anon_long"), col("anon_comments"),
        col("num_requests"),
        to_json(filter(col("child_tickets"), c => c("child_id").isNotNull))
          .as("child_tickets_json"))

  /** One full batch run: raw ndjson path → transformed/enriched batch +
    * new master state + scrubbed export.
    */
  def runBatch(
      spark: SparkSession, rawPath: String,
      masters: Masters,
      cityWkt: String, enclaveWkt: String,
      zoneFamilies: Map[String, Seq[(String, String, Long, Option[Long])]],
      privateTypes: Seq[String] = Seq("Private Violation")): (Masters, DataFrame, DataFrame) = {
    val (raw, quarantine) = graft.sources.JsonSource.readRepaired(spark, rawPath, rawSchema)
    // enriched feeds four-plus lineage branches inside integrate()
    // (parents, children twice, the current-status upsert): persist so
    // the JSON repair-parse, PII redaction, and revgeo run once per
    // batch, not once per branch. The returned masters are eagerly
    // localCheckpointed — truncating lineage so chaining hourly
    // runBatch calls keeps O(1) plans instead of growing the DAG per
    // run (iterative-Spark rule) — after which the batch cache is
    // released.
    val enriched = enrich(formatDedupe(transform(raw)), cityWkt, enclaveWkt, zoneFamilies)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val next0 = integrate(masters, enriched)
      val next = Masters(next0.allLinked.transform(graft.state.Checkpoints.stableLazy),
        next0.currentStatus.transform(graft.state.Checkpoints.stableLazy))
      (next, dropPiiForExport(next.allLinked, privateTypes), quarantine)
    } finally enriched.unpersist(blocking = false)
  }

  /** Submitter-field column order shared by the 311_utilizers ledger
    * (qscend/submitter_admin.py:4-24).
    */
  private val utilizerCols = Seq("request_id", "create_date_est",
    "request_type_name", "complaint_address", "submitter_id", "first_name",
    "last_name", "email", "phone", "address", "address_2", "city", "state",
    "zip", "neighborhood_name", "twitter_name", "last_request_date",
    "last_modified_date", "curr_total_requests_made",
    "curr_total_requests_closed", "satisfaction_level", "origin")

  /** join_submitter_to_request (qscend/submitter_admin.py:4-24):
    * enrich the latest submitters with their ticket's create
    * date/type/address (LEFT OUTER on request id), keep only the
    * (request_id, submitter_id) pairs not already in the ledger, and
    * union the legacy summaries snapshot. The returned frame is the
    * REPLACEMENT table content (the reference is CREATE OR REPLACE of
    * 311_utilizers with exactly these two UNION ALL branches — not an
    * append of a delta); callers overwrite the ledger with it. The
    * pair-key guard is a left_anti on the two columns (no CONCAT
    * collision risk, same semantics for non-NULL keys); only the new
    * batch shuffles.
    */
  def utilizersAppend(
      latestSubmitters: DataFrame, tickets: DataFrame,
      utilizers: DataFrame, summaries: DataFrame): DataFrame = {
    val enriched = latestSubmitters.join(
      tickets.select(col("id").as("request_id"), col("create_date_est"),
        col("request_type_name"),
        col("pii_google_formatted_address").as("complaint_address"),
        col("neighborhood_name")),
      Seq("request_id"), "left")
    val fresh = enriched
      .join(utilizers.select("request_id", "submitter_id"),
        Seq("request_id", "submitter_id"), "left_anti")
      .select(utilizerCols.map(col): _*)
    fresh.unionByName(summaries.select(utilizerCols.map(col): _*))
  }

  /** update_submitter_table (qscend/submitter_admin.py:26-40): roll the
    * latest submitters up to one row per identity with MAX totals, and
    * retain existing ledger identities absent from the batch (NOT IN →
    * left_anti; the reference's submitter ids are non-NULL). One
    * shuffle each side on submitter identity.
    */
  def submitterRollup(latest: DataFrame, existing: DataFrame): DataFrame = {
    val identity = Seq("submitter_id", "first_name", "last_name", "email",
      "phone", "address", "address_2", "city", "state", "zip", "twitter_name")
    val rolled = latest.groupBy(identity.map(col): _*)
      .agg(max("curr_total_requests_made").as("total_requests_made"),
        max("curr_total_requests_closed").as("total_requests_closed"))
    val retained = existing
      .join(latest.select("submitter_id").distinct(), Seq("submitter_id"), "left_anti")
      .select((identity ++ Seq("total_requests_made", "total_requests_closed")).map(col): _*)
      .distinct()
    rolled.unionByName(retained)
  }

  /** Empty master tables with the full integrated schema (first run). */
  def emptyMasters(spark: SparkSession, like: DataFrame): Masters = {
    val linked = like
      .withColumn("child_tickets", array().cast(ArrayType(childStruct)))
      .withColumn("num_requests", lit(1L))
      .limit(0)
    Masters(linked, like.limit(0))
  }
}
