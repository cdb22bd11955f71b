package graft.ops.text

import org.apache.spark.ml.{Pipeline, Transformer}
import org.apache.spark.ml.feature.{CountVectorizer, Tokenizer}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The email featurization pipeline (SURVEY §2.11 M1-M6), Spark-native.
  *
  * Reference shape (`Assignment 4.py:480-508`): struct-returning Python
  * UDF → 19 chained withColumn flattens → Tokenizer → CountVectorizer.
  * Here: one Scala UDF (rows stay in the JVM), a single `parsed.*`
  * projection instead of 19 chained ones (P2), and stock spark.ml
  * stages for M4-M6.
  */
object ParseEmails {

  /** Struct-returning email parse, M1. */
  val parseEmailUdf = udf(EmailParser.parseEmail _)

  /** Charset-sniffing bytes→string decode, S3. */
  val decodeBestUdf = udf(EmailParser.decodeBest _)

  /** HTML→text, M2. */
  val stripHtmlUdf = udf((s: String) => HtmlStrip.stripHtml(s))

  /** S2: recursive maildir ingest — each file one email; `username` =
    * first dir under the root, `id` = path relative to the root
    * (`Assignment 4.py:132-194` intended semantics). binaryFile keeps
    * raw bytes so S3 charset sniffing happens in the JVM, not at read.
    */
  def readMaildir(spark: SparkSession, root: String): DataFrame = {
    val cleanRoot = root.stripSuffix("/")
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(cleanRoot)
      .withColumn("rel", regexp_replace(col("path"), s".*${java.util.regex.Pattern.quote(cleanRoot)}/", ""))
      .select(
        regexp_extract(col("rel"), "^([^/]+)/", 1).as("username"),
        col("rel").as("id"),
        decodeBestUdf(col("content")).as("original_msg"))
  }

  /** P1 + P2: parse and flatten in one projection. */
  def parseEmails(input: DataFrame): DataFrame =
    input
      .select(col("username"), col("id"), col("original_msg"),
        parseEmailUdf(col("original_msg")).as("parsed_email"))
      .select(col("username"), col("id"), col("original_msg"),
        col("parsed_email.*"))

  /** M4-M6: the reference's full pipeline with the custom transformer. */
  def emailPipeline(): Pipeline = {
    val tokenizer = new Tokenizer().setInputCol("text").setOutputCol("words")
    val cv = new CountVectorizer().setInputCol("words")
      .setOutputCol("features")
    new Pipeline().setStages(Array(new ParseEmailsTransformer(), tokenizer, cv))
  }
}

/** M3: the reference's custom pipeline stage
  * (`Assignment 4.py:490-499`) as an org.apache.spark.ml.Transformer.
  */
class ParseEmailsTransformer(override val uid: String) extends Transformer {
  def this() = this(Identifiable.randomUID("parseEmails"))

  override def transform(ds: Dataset[_]): DataFrame =
    ParseEmails.parseEmails(ds.toDF())

  override def transformSchema(schema: StructType): StructType = {
    val parsedFields = org.apache.spark.sql.catalyst.ScalaReflection
      .schemaFor[EmailParser.ParsedEmail].dataType
      .asInstanceOf[StructType].fields
    StructType(schema.fields ++ parsedFields)
  }

  override def copy(extra: ParamMap): ParseEmailsTransformer =
    defaultCopy(extra)
}
