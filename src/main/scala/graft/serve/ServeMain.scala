package graft.serve

import org.apache.spark.sql.SparkSession
import graft.sources.PartitionedArchive

/** Standalone server entry point: serve the seven reference endpoints +
  * `/health` over a partitioned archive (see [[PartitionedArchive]] for the
  * layout). Usage: `runMain graft.serve.ServeMain <archiveRoot> [port]`.
  *
  * The session is long-lived and shared across requests — exactly the
  * deployment shape the reference runs (one FastAPI process over one
  * upstream accessor), with Spark partition pruning standing in for the
  * reference's filename-based file selection. On a cluster, point the
  * master at it and the same per-request plans distribute.
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    // before ANY JDK http-server class loads: ServerConfig freezes this
    // in its static init (see HttpApi.start's Nagle note)
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val root = args.headOption.getOrElse(
      sys.error("usage: ServeMain <archiveRoot> [port]"))
    val port = args.lift(1).map(_.toInt).getOrElse(8000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      // report sorted output for one-file-per-bucket bucketed scans
      // (Spark's single-file check still guards multi-file buckets) —
      // elides the index-side merge-join sort for the persisted
      // band/IVF/bucketed-fact tables
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // FAIR pools per request class (HttpApi.poolFor): a heavy heatmap
      // shares the executors with concurrent raw/daily requests instead
      // of queueing them behind it FIFO
      .config("spark.scheduler.mode", "FAIR")
      // serving-latency file splits: request windows touch few small
      // files (pruned heatmap windows, 50 MB maintained rollups); 16 MB
      // splits fan those scans across cores instead of packing them onto
      // 1-2 tasks (PERF.md r16)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "4m")
      .getOrCreate()
    // sidecar bootstrap: catalog + integrity zones + daily rollups from
    // persisted metadata — sub-second restart at any archive size (r16;
    // the fromFrames full-archive recompute was 9-29 s at 1.27 B rows)
    val service = AmbientService.fromArchive(spark, root)
    val server = new HttpApi(service, scheduler = Some(spark)).start(port)
    System.err.println(s"[serve] listening on :${server.getAddress.getPort} over $root")
    Thread.currentThread().join()
  }
}
