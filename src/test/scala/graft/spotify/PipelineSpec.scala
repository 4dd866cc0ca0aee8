package graft.spotify

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** End-to-end offline runs: explicit raw file, and the synthesized-empty
  * fallback (`dags/spotify_etl_dag.py:137-176` semantics).
  */
class PipelineSpec extends SparkSpec {

  private def tmpConfigFile(base: String, format: String = "parquet"): String = {
    val yaml = s"""output:
                  |  base_dir: $base
                  |  format: $format
                  |""".stripMargin
    val p = Files.createTempFile("cfg", ".yaml")
    Files.writeString(p, yaml)
    p.toString
  }

  private def tmpConfig(base: String, format: String = "parquet"): AppConfig =
    AppConfig.load(Some(tmpConfigFile(base, format)), env = Map.empty)

  test("offline run with explicit raw file writes processed+final zones") {
    val base = Files.createTempDirectory("graft_run").toString
    val res = Pipeline.run(spark, tmpConfig(base),
      rawPathOverride = Some(fixturePath("spotify_raw_fixture.json")))
    assert(res.status == "success", res.error)
    assert(res.stats("albums") == 2)
    assert(res.stats("tracks") == 3)
    assert(res.stats("audio_features") == 2)
    assert(res.stats("tracks_with_features") == 3)
    assert(res.stats("categories") == 0)
    // categories is empty -> skipped by the empty-table guard (load.py:100-102)
    assert(!res.outputs.keySet.exists(_.endsWith("/categories")))
    // a written table is readable back and latest-pointer resolves
    val albumsOut = res.outputs(s"$base/processed/albums")
    assert(spark.read.parquet(albumsOut).count() == 2)
    assert(Writers.latestPath(s"$base/processed", "albums").contains(albumsOut))
  }

  test("no client, no raw file: synthesizes empty dataset and succeeds") {
    val base = Files.createTempDirectory("graft_empty").toString
    val res = Pipeline.run(spark, tmpConfig(base))
    assert(res.status == "success", res.error)
    assert(res.stats.values.forall(_ == 0))
    assert(res.outputs.isEmpty) // all tables empty -> all writes skipped
    assert(res.rawPath.exists(p => Files.exists(Paths.get(p))))
  }

  test("unsupported output format fails the run, not the JVM") {
    val base = Files.createTempDirectory("graft_bad").toString
    val res = Pipeline.run(spark, tmpConfig(base, format = "xml"),
      rawPathOverride = Some(fixturePath("spotify_raw_fixture.json")))
    assert(res.status == "failed")
    assert(res.error.exists(_.contains("Formato no soportado")))
  }

  test("CLI: offline run exits 0 and renders the full run report") {
    val base = Files.createTempDirectory("graft_cli").toString
    val (code, summary) = Main.runCli(
      Array("--config", tmpConfigFile(base)), spark,
      rawPathOverride = Some(fixturePath("spotify_raw_fixture.json")),
      env = Map.empty)
    assert(code == 0, summary)
    // the DAG notification's content (spotify_etl_dag.py:276-322):
    // status + elapsed, per-table counts, output locations
    assert(summary.contains("ETL completed in"))
    assert(summary.contains("albums: 2 rows"))
    assert(summary.contains("tracks: 3 rows"))
    assert(summary.contains("audio_features: 2 rows"))
    assert(summary.contains("tracks_with_features: 3 rows"))
    assert(summary.contains(s"wrote $base/processed/albums -> "))
    assert(summary.contains(s"wrote $base/final/tracks_with_features -> "))
  }

  test("CLI: unsupported output format exits 1 with the failure report") {
    val base = Files.createTempDirectory("graft_cli_bad").toString
    val (code, summary) = Main.runCli(
      Array("--config", tmpConfigFile(base, format = "xml")), spark,
      rawPathOverride = Some(fixturePath("spotify_raw_fixture.json")),
      env = Map.empty)
    assert(code == 1)
    assert(summary.contains("ETL failed"), summary)
    assert(summary.contains("Formato no soportado"), summary)
  }

  test("config: env overrides yaml, dot-path defaults work") {
    val cfg = AppConfig.load(None, env = Map("SPOTIFY_OUTPUT_FORMAT" -> "parquet"))
    assert(cfg.getString("output.format") == "parquet") // env wins
    assert(cfg.getString("output.base_dir", "x") == "data") // default yaml
    assert(cfg.getInt("parameters.limit", 99) == 10)
    assert(cfg.getString("missing.path", "fallback") == "fallback")
    // null-valued yaml keys (parameters.country: null) behave as absent
    assert(cfg.get("parameters.country").isEmpty)
    assert(cfg.getString("parameters.country", null) == null)
  }

  test("offline client extraction composes the raw document") {
    val releases = """{"albums": {"items": [
        {"id": "a1", "name": "A", "type": "album", "release_date": "2020",
         "total_tracks": 1, "artists": [{"id": "ar1", "name": "X"}],
         "images": [{"url": "http://img"}],
         "external_urls": {"spotify": "http://alb"},
         "available_markets": ["US"]}]}}"""
    val tracks = """{"items": [{"id": "t1", "name": "T", "track_number": 1,
        "duration_ms": 1000, "explicit": false, "artists": [],
        "external_urls": {"spotify": "http://trk"}}]}"""
    val artist = """{"id": "ar1", "name": "X", "popularity": 5,
        "genres": ["g"], "followers": {"total": 1}}"""
    val feats = """{"audio_features": [{"id": "t1", "danceability": 0.5,
        "energy": 0.5, "loudness": -5, "tempo": 100}]}"""
    val cats = """{"categories": {"items": [{"id": "c", "name": "C", "href": "h"}]}}"""
    val client = new SpotifyClient(new OfflineTransport(Map(
      "/browse/new-releases" -> releases,
      "/albums/a1/tracks" -> tracks,
      "/artists/ar1" -> artist,
      "/audio-features" -> feats,
      "/browse/categories" -> cats)))
    val json = client.extractFullDataset()
    val p = Files.createTempFile("raw", ".json")
    Files.writeString(p, json)
    val tables = Transforms.all(spark, Pipeline.readRaw(spark, p.toString), Some("2024-01-01"))
    assert(tables("albums").count() == 1)
    assert(tables("tracks").count() == 1)
    assert(tables("audio_features").count() == 1)
    val a = tables("albums").head
    assert(a.getAs[String]("main_artist_id") == "ar1")
    assert(a.getAs[String]("artist_genres") == "g")
  }

  test("fetch seam runs executor-side: one transport per partition over an id frame") {
    // the SURVEY §7.3 scale-out shape for a large id space: the id
    // DataFrame is partitioned, and each partition builds ONE transport +
    // client (the expensive init) and streams its ids through it — the
    // same client the driver-side extraction uses, verbatim
    import spark.implicits._
    val responses = (1 to 8).map { i =>
      s"/artists/ar$i" ->
        s"""{"id": "ar$i", "name": "Artist$i", "popularity": $i}"""
    }.toMap
    val inits = spark.sparkContext.longAccumulator("transport_inits")
    val ids = spark.createDataset((1 to 8).map(i => s"ar$i") :+ "ar_missing")
      .repartition(4)
    val fetched = ids.mapPartitions { it =>
      inits.add(1) // per-PARTITION init point, executor-side
      val client = new SpotifyClient(new OfflineTransport(responses))
      it.map { id =>
        val node = client.getArtistInfo(id)
        (id, node.map(_.path("name").asText).orNull,
          node.map(_.path("popularity").asInt).getOrElse(-1))
      }
    }.collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fetched.size == 9)
    (1 to 8).foreach { i =>
      assert(fetched(s"ar$i") == ((s"Artist$i", i)), s"ar$i")
    }
    // error->None semantics survive the executor-side path
    assert(fetched("ar_missing") == ((null, -1)))
    // exactly one transport per (non-empty) partition, not one per id
    assert(inits.value == 4L, s"expected 4 partition inits, got ${inits.value}")
  }
}
