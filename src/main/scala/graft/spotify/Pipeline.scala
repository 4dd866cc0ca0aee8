package graft.spotify

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The E→T→L driver (`scripts/etl_pipeline.py:184-237`) as a linear Spark
  * program. Stages hand off lazy DataFrames; executors run only at the
  * write/count actions (SURVEY.md §3.1). Offline mode (no transport, a
  * pre-existing raw file, or nothing at all) mirrors the DAG's test-mode
  * fallback lattice (`dags/spotify_etl_dag.py:137-176`):
  * explicit path → newest raw file → synthesized empty dataset.
  */
object Pipeline {

  final case class RunResult(
      status: String,
      elapsedSec: Double,
      rawPath: Option[String],
      stats: Map[String, Long],
      outputs: Map[String, String],
      error: Option[String] = None)

  val emptyRawJson: String =
    """{"extraction_timestamp": null, "releases": [], "audio_features": [], "categories": []}"""

  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.raw)
      .option("multiLine", "true") // raw file is ONE pretty-printed doc (load.py:73)
      .json(path)

  /** Full run. `client=None` + no raw file ⇒ empty-dataset offline run. */
  def run(spark: SparkSession, config: AppConfig,
      client: Option[SpotifyClient] = None,
      rawPathOverride: Option[String] = None): RunResult = {
    val t0 = System.nanoTime()
    val base = config.getString("output.base_dir", "data")
    val rawDir = s"$base/${config.getString("output.raw_dir", "raw")}"
    val procDir = s"$base/${config.getString("output.processed_dir", "processed")}"
    val finalDir = s"$base/${config.getString("output.final_dir", "final")}"
    val format = config.getString("output.format", "csv")
    val ts = Writers.timestamp()
    try {
      // extract (or offline fallback)
      val rawPath = rawPathOverride
        .orElse(client.map { c =>
          val json = c.extractFullDataset(
            config.getInt("parameters.limit", 10),
            Option(config.getString("parameters.country", null)))
          Writers.writeRawJson(json, rawDir, ts = ts)
        })
        .orElse(Writers.latestPath(rawDir, "raw").filter(p =>
          java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
        .getOrElse(Writers.writeRawJson(emptyRawJson, rawDir, ts = ts))

      // transform
      val raw = readRaw(spark, rawPath)
      val tables0 = Transforms.all(spark, raw)
      val tables =
        if (config.getBoolean("transformations.merge_tracks_features", true)) tables0
        else tables0 - "tracks_with_features"

      // Each table feeds two zone writes + the empty-guard + stats; cache
      // so the raw-JSON parse and flatten run once per table, and release
      // the cache before returning (run() is eager, so unpersist is safe).
      tables.values.foreach(_.persist())
      try {
        val outputs = for {
          (name, df) <- tables
          zone <- Seq(procDir, finalDir)
          path <- Writers.writeTable(df, zone, name, format, ts = ts,
            prefix = if (zone == finalDir) "spotify_final" else "spotify")
        } yield s"$zone/$name" -> path

        val stats = tables.map { case (n, df) => n -> df.count() }
        RunResult("success", (System.nanoTime() - t0) / 1e9, Some(rawPath),
          stats, outputs.toMap)
      } finally tables.values.foreach(_.unpersist())
    } catch {
      case e: Exception =>
        RunResult("failed", (System.nanoTime() - t0) / 1e9, None,
          Map.empty, Map.empty, Some(e.getMessage))
    }
  }
}
