package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val Sf0001 = "/root/testdata/sf0.001"

  /** Self-generated NANOS-LAYOUT events fixture: the same rows as the
    * sf0.001 events table with `ts` stored as a raw int64 epoch-nanos
    * column — the physical layout the archive shipped with before the
    * round-9 regeneration moved it to native TIMESTAMP_MICROS. Keeping the
    * fixture in-repo means BOTH ingestion branches of
    * [[graft.tables.Tables.adaptTs]] stay tested no matter which layout
    * the driver's testdata currently uses. Written as a single FILE named
    * `events.parquet` (not a directory) so the streaming source's
    * `pathGlobFilter` matches it exactly like the real testdata. */
  lazy val NanosFixtureDir: String = {
    val dir = new java.io.File("target/fixtures/nanos").getAbsoluteFile
    val eventsFile = new java.io.File(dir, "events.parquet")
    if (!eventsFile.exists()) {
      dir.mkdirs()
      val tmp = new java.io.File(dir, "_tmp_events")
      import org.apache.spark.sql.functions._
      graft.tables.Tables.events(spark, Sf0001)
        .withColumn("ts", expr("unix_micros(ts) * 1000L"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, eventsFile.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
    dir.getAbsolutePath
  }
}
