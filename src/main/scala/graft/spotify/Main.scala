package graft.spotify

import org.apache.spark.sql.SparkSession

/** CLI front door for the E→T→L pipeline — the engine's equivalent of
  * `scripts/etl_pipeline.py:240-261` (argparse `--config`, run, print a
  * summary, exit 0/1) with the run-report rendering of the DAG's
  * completion notification (`dags/spotify_etl_dag.py:276-322`): per-table
  * counts, output locations, elapsed time.
  *
  * Credentials come from config/env (`AppConfig`); when absent the run
  * proceeds in the offline test-mode fallback lattice
  * (`dags/spotify_etl_dag.py:137-176`): newest existing raw file, else an
  * empty dataset — so the CLI always completes without the network.
  */
object Main {

  /** Render the run report (the DAG notification's content, as one
    * string): status line, stage stats, outputs, elapsed seconds.
    */
  def renderSummary(result: Pipeline.RunResult): String = {
    val sb = new StringBuilder
    if (result.status == "success") {
      sb.append(f"ETL completed in ${result.elapsedSec}%.2f seconds")
        .append(System.lineSeparator)
      result.rawPath.foreach(p =>
        sb.append(s"Raw dataset: $p").append(System.lineSeparator))
      result.stats.toSeq.sortBy(_._1).foreach { case (table, n) =>
        sb.append(s"  $table: $n rows").append(System.lineSeparator)
      }
      result.outputs.toSeq.sortBy(_._1).foreach { case (zone, path) =>
        sb.append(s"  wrote $zone -> $path").append(System.lineSeparator)
      }
    } else {
      sb.append(s"ETL failed: ${result.error.getOrElse("Unknown error")}")
        .append(System.lineSeparator)
      sb.append(f"Elapsed: ${result.elapsedSec}%.2f seconds")
        .append(System.lineSeparator)
    }
    sb.result()
  }

  /** Parse args (`--config <path>` only, like the reference CLI), run the
    * pipeline, and return (exit code, rendered summary). Pure with
    * respect to the process: no exit, no printing — `main` does those —
    * so PipelineSpec can drive the full CLI path in-process.
    */
  def runCli(args: Array[String], spark: SparkSession,
      client: Option[SpotifyClient] = None,
      rawPathOverride: Option[String] = None,
      env: Map[String, String] = sys.env): (Int, String) = {
    val configPath = args.sliding(2).collectFirst {
      case Array("--config", p) => p
    }
    val config = AppConfig.load(configPath, env)
    val effectiveClient = client.orElse {
      for {
        id <- config.get("spotify.client_id").map(_.toString)
        secret <- config.get("spotify.client_secret").map(_.toString)
      } yield new SpotifyClient(new HttpSpotifyTransport(id, secret))
    }
    val result = Pipeline.run(spark, config, effectiveClient, rawPathOverride)
    val code = if (result.status == "success") 0 else 1
    (code, renderSummary(result))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("spotify-etl")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SQL_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // sys.exit inside the try would halt the JVM without unwinding the
    // stack (finally would never run), skipping the clean spark.stop().
    // Compute the code, stop Spark, THEN exit.
    val code =
      try {
        val (c, summary) = runCli(args, spark)
        println(summary)
        c
      } finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
