package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-side parsing — the distributed analog of the reference's
  * scrape-and-flatten stage. The reference parses Steam `appdetails`
  * JSON into a flat metadata row (main.py:296-313) and extracts app
  * ids out of markup (main.py:215-242); here those are declarative
  * column transforms over whatever source (parquet/json/csv/kafka)
  * delivers the raw strings.
  */
object Ingest {

  /** Schema of the reference's appdetails payload (the fields
    * main.py:296-313 actually consumes). */
  val appDetailsSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("release_date", StructType(Seq(
      StructField("date", StringType)))),
    StructField("developers", ArrayType(StringType)),
    StructField("publishers", ArrayType(StringType)),
    StructField("genres", ArrayType(StructType(Seq(
      StructField("description", StringType))))),
    StructField("price_overview", StructType(Seq(
      StructField("initial", LongType),
      StructField("currency", StringType),
      StructField("discount_percent", IntegerType))))))

  /** Flatten an appdetails JSON string column into the reference's
    * games_metadata shape: arrays joined with ", ", name trimmed of
    * ™/® noise (main.py:301-320), price cents → value. */
  def parseAppDetails(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val j = from_json(col(jsonCol), appDetailsSchema)
    df.select(
      col(idCol).as("app_id"),
      normalizeName(j.getField("name")).as("name"),
      j.getField("type").as("type"),
      j.getField("release_date").getField("date").as("release_date"),
      array_join(j.getField("developers"), ", ").as("developer"),
      array_join(j.getField("publishers"), ", ").as("publisher"),
      array_join(transform(j.getField("genres"),
        g => g.getField("description")), ", ").as("genres"),
      (j.getField("price_overview").getField("initial") / 100.0).as("price_numeric"),
      j.getField("price_overview").getField("currency").as("price_currency"),
      j.getField("price_overview").getField("discount_percent").as("discount_percent"))
  }

  /** normalize_game_name (ref main.py:318-320): strip ™ ® and trim. */
  def normalizeName(c: Column): Column =
    trim(translate(c, "™®", ""))

  /** Per-batch accounting of a quarantining read. */
  case class QuarantineReport(valid: Long, quarantined: Long)

  /** QUARANTINING JSON-lines reader — the ingestion-robustness verb a
    * production feed needs (the reference survives malformed
    * appdetails responses by skipping them, main.py:288-316; at 100 TB
    * a bad record must neither kill the job NOR silently vanish):
    * parse `jsonCol` rows against `schema` in PERMISSIVE mode with a
    * corrupt-record column, split the batch into VALID rows (parsed
    * columns + the id column) and QUARANTINED raw rows (unparseable,
    * or parseable but failing `required` non-null fields — the
    * half-parsed rows PERMISSIVE would otherwise let through as
    * nulls), append the quarantined originals to `quarantineDir`
    * (raw text + the id, so an operator can replay them after a
    * fix), and return (valid frame, report). One map-side pass, no
    * shuffle; the quarantine write is the only extra I/O and it is
    * proportional to the bad rows. */
  def readJsonQuarantine(df: DataFrame, idCol: String, jsonCol: String,
                         schema: StructType, quarantineDir: String,
                         required: Seq[String] = Nil)
      : (DataFrame, QuarantineReport) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema already has a _corrupt_record field — it would shadow " +
        "the PERMISSIVE corrupt-record channel and mask parse failures")
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val parsed = df.select(col(idCol).as("_id"), col(jsonCol).as("_raw"),
        from_json(col(jsonCol), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("j"))
      .localCheckpoint() // one parse feeds both splits and the write
    val bad = required.map(f => col("j").getField(f).isNull)
      .foldLeft(col("j").isNull ||
        col("j").getField("_corrupt_record").isNotNull)(_ || _)
    val quarantined = parsed.filter(bad)
      .select(col("_id").as(idCol), col("_raw").as(jsonCol))
      .localCheckpoint() // materialize before the append
    val nQuarantined = quarantined.count()
    // clean batches write NOTHING: an unconditional append would leave
    // one empty parquet file (plus the directory) per batch, silting a
    // long-running daily loop with small files
    if (nQuarantined > 0)
      quarantined.write.mode("append").parquet(quarantineDir)
    val valid = parsed.filter(!bad)
      .select(col("_id").as(idCol) +:
        schema.fields.map(f => col("j").getField(f.name).as(f.name)): _*)
    (valid, QuarantineReport(valid.count(), nQuarantined))
  }

  /** Extract every id matching `pattern` (first group) from a markup
    * column — the fetch_paginated_list id-extraction analog
    * (main.py:215-242), one row per id. */
  def extractIds(df: DataFrame, textCol: String, pattern: String): DataFrame =
    df.select(explode(expr(
      s"regexp_extract_all($textCol, '$pattern', 1)")).as("app_id"))
      .filter(length(col("app_id")) > 0)
      .distinct()
}
