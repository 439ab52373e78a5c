package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorExpressions

/** Embedding-space clustering as dataflow: Lloyd's k-means with the
  * centroid set held driver-side between rounds — the same topology
  * Spark MLlib's KMeans uses, re-derived here with the repo's
  * engine-exact numeric contract so every assignment is reproducible
  * bit-for-bit across engines and partitionings.
  *
  * Scale shape per round: assignment is a PURE PROJECTION — the k
  * centroids enter the plan as literals (k·dim doubles, broadcast-
  * sized by definition), each row scores against all k via the native
  * [[graft.functions.VectorDot]] and picks its argmin with `least`
  * over (distance, cid) structs — no cross-join row explosion, no
  * exchange. The update is one aggregation whose output is (k × dim)
  * rows: map-side partial sums mean the shuffle carries centroid-
  * sized data regardless of corpus size. Driver state is k·dim
  * doubles per round — the bounded "trainer state" pattern of
  * [[SimilarityOps]] (SRP/IVF/PQ training) — so a 100 TB corpus
  * streams through `rounds` scans and nothing corpus-sized ever
  * converges on one node.
  *
  * Determinism contract (the estimator rule used across the repo):
  * seeds are the k smallest-id vectors; squared distances are
  * computed as n2 − 2·a·c + |c|² with the same left-to-right fold
  * both engines use for inner products, rounded to 6 dp before the
  * argmin, ties broken by the smaller cluster id; centroid means sum
  * their float components as DECIMAL(28,8) (order-independent under
  * any partitioning — see q79's oracle) and round to 6 dp. A cluster
  * that loses every member simply drops out of the next round — both
  * engines derive the survivor set from the same assignment.
  */
object ClusterOps {

  private val outSchema = StructType(Seq(
    StructField("_kmid", LongType), StructField("cluster", IntegerType),
    StructField("d2", DoubleType)))

  /** Lloyd's k-means over `vecCol` (array of float/double).
    *
    * `rounds` centroid updates, then a final assignment against the
    * last centroid set. Returns (idCol, cluster, d2): the winning
    * cluster id (dense 0..k-1 over the seed order) and the 6-dp
    * squared L2 distance to its centroid. Null vectors are excluded.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      rounds: Int = 2): DataFrame = {
    require(k > 0, "kmeans: k must be positive")
    require(rounds >= 0, "kmeans: rounds must be non-negative")
    val spark = df.sparkSession
    val pts = df.where(col(vecCol).isNotNull)
      .select(col(idCol).as("_kmid"), col(vecCol).as("_v"),
        VectorExpressions.dot(col(vecCol), col(vecCol)).as("_n2"))
    // seeds: the k smallest ids — a k-sized, deterministic collect
    var cent: Seq[(Int, Array[Double])] =
      pts.orderBy(col("_kmid")).limit(k).collect().toSeq.zipWithIndex.map {
        case (r, i) =>
          i -> r.getSeq[Any](1).map {
            case f: java.lang.Float => f.toDouble
            case d: java.lang.Double => d.doubleValue
          }.toArray
      }
    if (cent.isEmpty)
      return spark.createDataFrame(
          java.util.Collections.emptyList[Row](), outSchema)
        .withColumnRenamed("_kmid", idCol)

    // assignment projection against the current literal centroids:
    // least() over (d2, cid) structs is argmin with the cid tie-break
    def best(c: Seq[(Int, Array[Double])]): Column = {
      val scored = c.map { case (cid, cv) =>
        // |c|² folds left-to-right like the engines' inner products
        var n = 0.0
        var i = 0
        while (i < cv.length) { n += cv(i) * cv(i); i += 1 }
        val cl = typedLit[Seq[Double]](cv.toSeq)
        struct(
          round(col("_n2") - lit(2.0) * VectorExpressions.dot(col("_v"), cl)
            + lit(n), 6).as("_d2"),
          lit(cid).as("_cid"))
      }
      if (scored.size == 1) scored.head else least(scored: _*)
    }

    var r = 0
    while (r < rounds && cent.nonEmpty) {
      // one job: assign, explode dims, per-(cluster, dim) exact mean —
      // the collected result is k·dim rows whatever the corpus size.
      // The assignment is projected in its OWN select below the
      // explode: a generator and a complex expression in one select
      // put the expression in the projection above the Generate,
      // re-evaluating the k-way argmin once per exploded dimension
      // (measured 234x at the 10x scale probe before this split)
      val means = pts
        .select(col("_kmid"), best(cent).getField("_cid").as("_cid"),
          col("_v"))
        .select(col("_cid"), posexplode(col("_v")).as(Seq("_pos", "_val")))
        .groupBy(col("_cid"), col("_pos"))
        .agg(round(
          sum(col("_val").cast(DecimalType(28, 8))).cast(DoubleType)
            / count(lit(1)), 6).as("_m"))
        .collect()
      cent = means.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
        case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }
      r += 1
    }
    pts.select(col("_kmid"), best(cent).as("_b"))
      .select(col("_kmid").as(idCol),
        col("_b").getField("_cid").as("cluster"),
        col("_b").getField("_d2").as("d2"))
  }
}
