package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for a list of contract queries to files —
  * the r16 optimization round's plan-evidence harness (plans/r16/). One
  * JVM, many queries: `runMain graft.tools.ExplainDump <sfDir> <outDir>
  * <suffix> <q1,q2,...>` writes `<outDir>/<query>_<suffix>.txt`.
  *
  * Same session shape as Bench (master/shuffle-partitions/AQE/UTC) so the
  * dumped plans are the plans the bench executes. Queries that run eager
  * driver work at plan-build time (index builds, localCheckpoints) run it
  * here too — the dump reflects the FINAL returned frame's plan.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      System.err.println(s"[explain] wrote $n")
      // the eager plan-build work of some queries persists RDDs/caches;
      // drop them so one dump can't tax the next
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
