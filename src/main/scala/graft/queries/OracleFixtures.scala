package graft.queries

import org.apache.spark.sql.DataFrame

/** Deterministic-seam fixtures for the probabilistic-hash queries.
  *
  * The driver's DuckDB oracle cannot reproduce xxhash64 / splitmix64 hash
  * families, but everything DOWNSTREAM of the hashes (band joins, candidate
  * verification, Hamming pigeonholes, exact ranking) is plain relational
  * algebra. So each such query splits at its deterministic seam: Spark
  * writes the hash-stage output (signatures / fingerprints / buckets /
  * shingle hashes) to a parquet fixture, reads it back, and runs the
  * downstream stage from the fixture — and the oracle SQL runs the SAME
  * downstream stage in DuckDB over the SAME fixture files. The driver's
  * hash compare then verifies the whole post-hash pipeline bit-for-bit.
  *
  * Paths embed the scale-factor directory name so a bench run at sf0.1
  * can't clobber the sf0.01 fixtures between `Verify` and the DuckDB
  * compare. The oracle SQL strings are static, so they pin the driver's
  * verification scale (sf0.01, per the driver contract).
  */
object OracleFixtures {
  val Root = "/tmp/graft_fixtures"

  /** SF directory the driver verifies at; oracle SQL references this. */
  val VerifySf = "sf0.01"

  private def sfName(sfDir: String): String =
    new java.io.File(sfDir.replaceAll("/+$", "")).getName

  /** Write `df` as the fixture `name` for this SF and read it back, so the
    * Spark downstream stage consumes exactly the bytes DuckDB will.
    *
    * Only the verification scale pays the write by default: at any other
    * SF (bench at sf0.1, ad-hoc runs) no oracle will ever read the
    * fixture, so the frame passes through untouched — bench numbers
    * measure the pipeline, not a coalesce(1) disk round-trip.
    *
    * SCALE-HONEST SWEEPS (r13 verdict #7): setting `SPARK_GRAFT_SEAM_WRITE`
    * makes every SF pay the write, under its own `$Root/<sfName>/` prefix
    * — `tools/check_oracle_timed.py` then rewrites the pinned sf0.01
    * fixture paths to the sweep's SF and replays the full downstream
    * oracle there, so cells like q_dedup_eval carry a MEASURED
    * precision/recall claim at the scale being swept instead of
    * degrading to FIXTURE_SEAM. Bench never sets the variable. */
  def seam(df: DataFrame, sfDir: String, name: String): DataFrame = {
    val sf = sfName(sfDir)
    if (sf != VerifySf && !sys.env.contains("SPARK_GRAFT_SEAM_WRITE")) df
    else {
      val path = s"$Root/$sf/$name"
      df.coalesce(1).write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    }
  }

  /** The `read_parquet` glob for fixture `name` in oracle SQL. */
  def sqlPath(name: String): String = s"$Root/$VerifySf/$name/*.parquet"
}
