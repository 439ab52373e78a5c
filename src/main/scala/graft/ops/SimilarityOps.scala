package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  * - brute-force cosine top-k: exact, one pass, map-side score +
  *   TakeOrderedAndProject — the correct baseline and fine whenever
  *   k × candidates fits a single reduce.
  * - sign-random-projection LSH buckets: the scale path — scoring
  *   only within matching buckets turns a 100 TB full scan per query
  *   into a bucket-pruned probe. Hyperplanes are md5-derived and
  *   deterministic, so bucket assignment is reproducible anywhere.
  */
object SimilarityOps {

  /** Dot product of two float-array columns, accumulated in double
    * in element order (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Brute-force cosine top-k against one query vector. The query
    * vector is a literal baked into the plan (broadcast-equivalent);
    * scoring is map-side; Spark plans TakeOrderedAndProject so only
    * k rows per partition reach the driver.
    */
  def cosineTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = lit(query.toArray)
    embeddings
      .select(col(idCol),
        round(cosine(col(vecCol), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Sign-random-projection bucket id: one bit per hyperplane =
    * sign of the projection; packs to a long. Vectors in the same
    * bucket are likely neighbors (cosine LSH).
    */
  def srpBucket(vec: Column, planes: Int): Column = {
    val bits = transform(sequence(lit(0), lit(planes - 1)), pIdx => {
      // projection of vec onto plane pIdx: sum_d vec[d] * w(p, d)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, d) => v.cast("double") * srpWeight(pIdx, d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, pow(lit(2.0), pIdx.cast("double")).cast("long")).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc + b)
  }

  private def srpWeight(p: Column, d: Column): Column = {
    val h = conv(substring(md5(concat(lit("plane"), p.cast("string"), lit("|"),
      d.cast("string"))), 1, 8), 16, 10).cast("long")
    (h.cast("double") / lit(math.pow(2, 31))) - lit(1.0)
  }

  /** ANN top-k via SRP-LSH: score only rows whose bucket matches the
    * query's bucket (multi-probe: optionally also buckets at Hamming
    * distance 1). Falls back to fewer results when the bucket is
    * small — recall/cost is tuned by `planes` and `probe`.
    */
  def annTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, planes: Int = 8, probe: Int = 1): DataFrame = {
    val spark = embeddings.sparkSession
    val q = lit(query.toArray)
    // query bucket computed once, driver-side, via a literal row
    val qBucket = spark.range(1)
      .select(srpBucket(q, planes).as("b")).collect()(0).getLong(0)
    val probed: Seq[Long] =
      if (probe <= 0) Seq(qBucket)
      else qBucket +: (0 until planes).map(j => qBucket ^ (1L << j))
    embeddings
      .withColumn("_bucket", srpBucket(col(vecCol), planes))
      .where(col("_bucket").isin(probed: _*))
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs top neighbors within LSH buckets — the corpus-scale
    * "find my duplicates" shape: bucket first (shuffle on bucket id),
    * pair only within buckets, never a cross join.
    */
  def bucketedNeighborPairs(
      embeddings: DataFrame, idCol: String, vecCol: String,
      planes: Int = 8, minCosine: Double = 0.9): DataFrame = {
    val withBucket = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      srpBucket(col(vecCol), planes).as("bucket"))
    val a = withBucket.alias("a"); val b = withBucket.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.vec"), col("b.vec")), 6).as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}
