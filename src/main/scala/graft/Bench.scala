package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall seconds.
  *
  * Each query is forced through the `noop` sink (not `count()` — count lets
  * Catalyst prune away the computed columns, which would under-measure
  * map-heavy queries). A small warmup query absorbs one-time JVM/codegen
  * startup so per-query numbers reflect steady-state execution.
  *
  * Output fields:
  *  - `queries`      cold (first-run) seconds per query — comparable to
  *                   previous rounds' numbers; `value` is their total;
  *  - `queries_warm` second-run seconds (plan + codegen caches hot) — the
  *                   steady-state cost, for round-over-round deltas that
  *                   aren't drowned in codegen noise;
  *  - `errors`       names of failed queries; a failed query also reports
  *                   -1 in both per-query maps so automated consumers can't
  *                   mistake a partial wall time for success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: JVM + codegen + parquet reader paths (not timed).
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      } finally {
        // measurement isolation: a query that persists/checkpoints must not
        // tax its successors' memory (blocks otherwise free only on GC)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }

    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val cold = named.map { case (n, fn) => n -> run(n, fn) }
    val warm = named.map { case (n, fn) => n -> run(n, fn) }
    def jsonMap(m: Seq[(String, Double)]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errors = (cold ++ warm).collect { case (n, v) if v < 0 => n }.distinct.sorted
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = cold.map(_._2).filter(_ >= 0).sum
    val totalWarm = warm.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${jsonMap(cold)},"queries_warm":${jsonMap(warm)},""" +
      s""""total_warm":$totalWarm,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
