package graft.ops.anomaly

import org.apache.spark.ml.feature.{PCA, StandardScaler}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable anomaly scorers (SURVEY §2.11 M10).
  *
  * The reference's "anomaly detection" is a Keras VAE scored by
  * reconstruction error (`Week#12_Assignment.ipynb:104-230`). MLlib has
  * no VAE; the engine contract is the **anomaly_score column**: every
  * scorer appends a non-negative `anomaly_score` (higher = more
  * anomalous) so downstream thresholding/top-k is scorer-agnostic.
  * Statistical equivalents supplied:
  *  - [[ZScoreScorer]] — |z| against per-group mean/stddev (batch twin
  *    of the streaming Welford detector)
  *  - [[KMeansScorer]] — distance to nearest centroid
  *  - [[PcaScorer]] — PCA reconstruction error, the closest analog of
  *    the VAE's latent-bottleneck reconstruction loss
  */
object Scorers {

  /** |z| of `valueCol` within each group of `keys` as anomaly_score. */
  def zscore(df: DataFrame, valueCol: String, keys: Seq[String]): DataFrame = {
    val stats = df.groupBy(keys.map(col): _*)
      .agg(avg(col(valueCol)).as("__mean"),
        stddev_pop(col(valueCol)).as("__std"))
    df.join(broadcast(stats), keys)
      .withColumn("anomaly_score",
        when(col("__std") > 0,
          abs(col(valueCol) - col("__mean")) / col("__std"))
          .otherwise(0.0))
      .drop("__mean", "__std")
  }

  /** Distance to the nearest of k centroids over an array<float/double>
    * embedding column. Fit is one MLlib job; scoring is a broadcast of
    * k centroids — no shuffle at scoring time.
    */
  def kmeansDistance(df: DataFrame, embeddingCol: String, k: Int,
      seed: Long = 7L): DataFrame = {
    val feat = df.withColumn("__features",
      array_to_vector(col(embeddingCol).cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("__features").fit(feat)
    val centers = feat.sparkSession.sparkContext.broadcast(
      model.clusterCenters)
    val dist = udf((v: Vector) =>
      centers.value.map(c => Vectors.sqdist(c, v)).min match {
        case d => math.sqrt(d)
      })
    feat.withColumn("anomaly_score", dist(col("__features")))
      .drop("__features")
  }

  /** PCA reconstruction error: project to k principal components and
    * back; the score is the L2 distance between the input and its
    * reconstruction — the statistical stand-in for the reference VAE's
    * reconstruction loss.
    */
  def pcaReconstructionError(df: DataFrame, embeddingCol: String,
      k: Int): DataFrame = {
    val feat = df.withColumn("__features",
      array_to_vector(col(embeddingCol).cast("array<double>")))
    val model = new PCA().setK(k).setInputCol("__features")
      .setOutputCol("__pc").fit(feat)
    val pcB = feat.sparkSession.sparkContext.broadcast(model.pc)
    val err = udf((v: Vector, proj: Vector) => {
      val pc = pcB.value // d x k column-major
      val d = v.size; val kk = proj.size
      var sum = 0.0
      var i = 0
      while (i < d) {
        var rec = 0.0
        var j = 0
        while (j < kk) { rec += pc(i, j) * proj(j); j += 1 }
        val diff = v(i) - rec
        sum += diff * diff
        i += 1
      }
      math.sqrt(sum)
    })
    model.transform(feat)
      .withColumn("anomaly_score", err(col("__features"), col("__pc")))
      .drop("__features", "__pc")
  }
}
