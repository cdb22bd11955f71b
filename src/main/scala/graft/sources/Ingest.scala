package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-validated ingest (SURVEY §2.2 F1 intended semantics).
  *
  * The reference validates each record against a JSON Schema in a
  * Python loop — with the bug that it re-validates `records[1]` every
  * iteration (`Assignment_3.ipynb:270`). Engine semantics: validation
  * is schema-on-read — malformed JSON routes to `_corrupt_record`
  * (PERMISSIVE mode), and required-field presence compiles to one
  * boolean `valid` column — a plain Catalyst predicate, fully codegen'd
  * and pushdown-friendly, no per-row interpreter.
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  /** Compile required dotted paths (e.g. "src_airport.latitude") to a
    * single validity predicate.
    */
  def requiredPredicate(required: Seq[String]): Column =
    required.map(p => col(p).isNotNull)
      .foldLeft(col(CorruptCol).isNull)(_ && _)

  /** Read JSONL(.gz) with explicit schema; adds `_corrupt_record` (raw
    * line for unparseable rows) and `valid`.
    */
  def readJsonValidated(spark: SparkSession, path: String,
      schema: StructType, required: Seq[String]): DataFrame = {
    val withCorrupt = schema.add(StructField(CorruptCol, StringType))
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("recursiveFileLookup", "true")
      .schema(withCorrupt)
      .json(path)
      .withColumn("valid", requiredPredicate(required))
  }

  /** Split into (valid, rejected) — rejected keeps the corrupt raw line
    * or the failed record for error routing (reference prints failures
    * and keeps going; here both streams are first-class DataFrames).
    */
  def validateAndSplit(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col("valid")).drop(CorruptCol, "valid"),
      df.filter(!col("valid")))
}
