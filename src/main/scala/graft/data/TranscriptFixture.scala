package graft.data

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixed deterministic transcript corpus for the driver contract's
  * transcript-native queries (BASELINE.json `input_hint`: conv_id,
  * turn_idx, role, text, tool, ts).
  *
  * The driver's testdata has no transcripts table, so these queries
  * synthesise one with [[TranscriptGen]] (pure counter-mode hashing — a
  * regeneration with the same seed is byte-identical, pinned in
  * TranscriptJobsSpec) and dump it ONCE to a fixed absolute path. The
  * DuckDB oracle SQL reads the same parquet via `read_parquet`, so every
  * transcript aggregation gets a full independent re-computation of its
  * semantics over the identical rows — the oracle checks the OPERATOR
  * (grouping, sketch estimates in their exact regimes, membership,
  * quantiles), while generation determinism itself is pinned by the
  * suite's byte-identity test.
  *
  * Scale-invariant on purpose: the corpus is a fixed shape regardless of
  * the driver's sfDir (like `audio_decode`'s synthesised WAVs), so one
  * fixed oracle path serves every scale the driver verifies at. The Zipf
  * hotspot (conv 0 owns ~1200 turns vs a 4-turn median) preserves the
  * skew that the salted queries exist for.
  *
  * The dump is written atomically (stage + rename) so concurrent verify
  * runs can't observe a half-written directory, and it is deliberately
  * NOT cleaned up on JVM exit — the driver's DuckDB pass runs after the
  * Spark JVM is gone.
  */
object TranscriptFixture {
  val Seed = 42L
  val NConvs = 600L
  val HotTurns = 1200
  val MinTurns = 4

  /** Fixed path referenced verbatim by the oracle SQL. Versioned: any
    * change to the generator parameters above must bump this. */
  val Dir = "/tmp/graft_transcript_fixture/v1"

  /** DuckDB source for oracle SQL strings. */
  val OracleGlob = s"read_parquet('$Dir/*.parquet')"

  @volatile private var ensured = false

  private def dumped(p: Path): Boolean = Files.exists(p.resolve("_SUCCESS"))

  /** Generate-once, then always read from the dump so Spark and DuckDB
    * see the identical files. */
  def frame(spark: SparkSession): DataFrame = {
    val p = Paths.get(Dir)
    if (!ensured) synchronized {
      if (!ensured && !dumped(p)) {
        val stage = Paths.get(Dir + ".stage-" + java.util.UUID.randomUUID())
        TranscriptGen.generate(spark, Seed, NConvs, HotTurns, MinTurns)
          .coalesce(1)
          .write.mode("overwrite").parquet(stage.toString)
        Files.createDirectories(p.getParent)
        try Files.move(stage, p, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
              _: java.nio.file.DirectoryNotEmptyException =>
            // another process won the race; its content is byte-identical
            LocalFs.deleteRecursively(stage.toFile)
        }
      }
      ensured = true
    }
    spark.read.parquet(Dir)
  }
}
