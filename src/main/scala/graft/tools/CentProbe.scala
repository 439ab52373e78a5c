package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** Scratch probe: where does k-way literal-centroid assignment spend
  * its time as k grows? (not part of the engine; run via
  * `sbt "runMain graft.tools.CentProbe"`).
  */
object CentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("centprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.sql.files.maxPartitionBytes", "1m") // see Bench.scala
      .config("spark.sql.files.openCostInBytes", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.ImportSource.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))

    def run(name: String)(df: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = (1 to 3).map(_ => once())
      println(f"$name%-40s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val cents45 = SimilarityOps.sqrtSeedCentroids(emb, "vec_id", "embedding")
    val cents4 = cents45.take(4)
    println(s"k=${cents45.size}")

    def assign(cents: Seq[Seq[Float]]) =
      emb.select(col("vec_id"),
        SimilarityOps.ivfAssign(col("embedding"), cents).as("cell"))

    run("assign k=4 (argmax cosine)")(assign(cents4))
    run("assign k=45 (argmax cosine)")(assign(cents45))
    run("assign k=45 + groupBy count")(
      assign(cents45).groupBy("cell").count())

    // dot-only variant: centroids pre-normalized driver-side, vector
    // norm factored out of the argmax (argmax over dot(v, c/|c|))
    def l2(c: Seq[Float]): Seq[Float] = {
      val n = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      if (n == 0) c else c.map(x => (x / n).toFloat)
    }
    def assignDot(cents: Seq[Seq[Float]]) = {
      val scores = cents.map(c =>
        SimilarityOps.dot(col("embedding"), lit(l2(c).toArray)))
      val arr = array(scores: _*)
      emb.select(col("vec_id"),
        coalesce((array_position(arr, array_max(arr)) - 1).cast("int"),
          lit(-1)).as("cell"))
    }
    run("assign k=45 (argmax dot, prenorm)")(assignDot(cents45))

    run("knnJoin k=45 full")(
      SimilarityOps.knnJoin(emb, "vec_id", "embedding", cents45, 5))

    spark.stop()
  }
}
