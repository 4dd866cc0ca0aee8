package graft.spotify.connector

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.spotify.{Pipeline, SpotifyTransport, Transforms}

/** The DataSourceV2 face of the extraction stage: country/limit
  * pushdown must REACH the transport (request params), a pushed filter
  * must leave NO post-scan Filter in the plan, the ≤100 batched
  * audio-features fetch must run as one call per input partition
  * executor-side, and the connector path must agree with the
  * client→raw→Transforms parity path on the same canned data.
  * Fully offline — the transports are canned/recording.
  */
object ConnectorSpec {
  /** Executor-visible call log (local-mode single JVM). */
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, Map[String, String])]()

  def albumJson(id: String, pop: Int): String =
    s"""{"id": "$id", "name": "Album $id", "type": "album",
        "release_date": "2024-01-0${pop % 9 + 1}", "total_tracks": $pop,
        "popularity": $pop,
        "images": [{"url": "http://img/$id"}],
        "external_urls": {"spotify": "http://alb/$id"}}"""
}

/** Echoes back exactly the requested audio-feature ids plus one null
  * entry per batch (exercising the null-drop rule); top-level so the
  * serialized spec never drags a test-class outer reference along.
  */
final case class EchoFeaturesSpec() extends TransportSpec {
  override def create(): SpotifyTransport = new SpotifyTransport {
    override def get(endpoint: String,
        params: Map[String, String]): Option[String] = {
      ConnectorSpec.calls.add((endpoint, params))
      val feats = params("ids").split(",").map(id =>
        s"""{"id": "$id", "danceability": 0.5, "energy": 0.6,
            "loudness": -5.0, "tempo": 120.0}""")
        .mkString("[", ",", ", null]")
      Some(s"""{"audio_features": $feats}""")
    }
  }
}

/** Param-SENSITIVE recording transport: the response depends on the
  * `country` request parameter, so a test can prove the pushed filter
  * changed WHAT THE SOURCE FETCHED, not merely what survived a
  * post-scan filter; every call lands in [[ConnectorSpec.calls]].
  */
final case class RecordingSpec(byKey: Map[String, String])
  extends TransportSpec {
  override def create(): SpotifyTransport = new SpotifyTransport {
    override def get(endpoint: String,
        params: Map[String, String]): Option[String] = {
      ConnectorSpec.calls.add((endpoint, params))
      val keyed = params.get("country")
        .map(c => s"$endpoint?country=$c").getOrElse(endpoint)
      byKey.get(keyed).orElse(byKey.get(endpoint))
    }
  }
}

class ConnectorSpec extends SparkSpec {
  import ConnectorSpec._

  private val providerName = classOf[SpotifyTableProvider].getName

  private def releasesBody(ids: Seq[(String, Int)]): String =
    s"""{"albums": {"items": [${ids.map { case (i, p) => albumJson(i, p) }
        .mkString(",")}]}}"""

  test("country + limit pushdown reach the transport; no post-scan filter") {
    calls.clear()
    TransportSpec.registry.put("push", RecordingSpec(Map(
      "/browse/new-releases?country=SE" ->
        releasesBody(Seq("se1" -> 1, "se2" -> 2)),
      "/browse/new-releases" ->
        releasesBody(Seq("g1" -> 7, "g2" -> 8, "g3" -> 9)))))
    val df = spark.read.format(providerName)
      .option("transport.handle", "push").load()
      .filter(col("country") === "SE")
      .limit(5)
    val rows = df.collect()
    // the SOURCE fetched the SE page — rows only exist because the
    // country param reached the API call (the generic page has g1-g3)
    assert(rows.map(_.getAs[String]("album_id")).sorted.toSeq ==
      Seq("se1", "se2"))
    assert(rows.forall(_.getAs[String]("country") == "SE"))
    val recorded = calls.asScala.toSeq
    assert(recorded.exists { case (e, p) =>
      e == "/browse/new-releases" && p.get("country").contains("SE") &&
        p.get("limit").contains("5")
    }, recorded.toString)
    // pushed EqualTo (+ its implied IsNotNull) leaves NO Filter node —
    // the pushdown is real, not a post-scan re-check
    val filters = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(filters.isEmpty, df.queryExecution.optimizedPlan.toString)
  }

  test("conflicting country equalities: one pushed, the rest residual, " +
    "result empty") {
    calls.clear()
    TransportSpec.registry.put("conflict", RecordingSpec(Map(
      "/browse/new-releases?country=SE" ->
        releasesBody(Seq("se1" -> 1, "se2" -> 2)),
      "/browse/new-releases?country=US" ->
        releasesBody(Seq("us1" -> 3)))))
    val df = spark.read.format(providerName)
      .option("transport.handle", "conflict").load()
      .filter(col("country") === "SE" && col("country") === "US")
    // country='SE' AND country='US' is unsatisfiable: Catalyst may
    // prove that itself (empty LocalRelation), but however the plan
    // lands the result must be EMPTY — never one country's rows with
    // both equalities claimed satisfied
    assert(df.count() == 0, df.collect().mkString(";"))
    // and the ScanBuilder contract directly: of two DIFFERENT country
    // equalities, exactly one is accepted, the other stays residual
    import org.apache.spark.sql.sources.EqualTo
    val b = new NewReleasesScanBuilder(Map("transport.handle" -> "conflict"))
    val residual = b.pushFilters(Array(
      EqualTo("country", "SE"), EqualTo("country", "US")))
    assert(b.pushedFilters().toSeq == Seq(EqualTo("country", "SE")),
      b.pushedFilters().mkString(";"))
    assert(residual.toSeq == Seq(EqualTo("country", "US")),
      residual.mkString(";"))
    // identical duplicated equality IS fully dischargeable: no residual
    val dup = spark.read.format(providerName)
      .option("transport.handle", "conflict").load()
      .filter(col("country") === "SE" && col("country") === "SE")
    assert(dup.collect().map(_.getAs[String]("album_id")).sorted.toSeq ==
      Seq("se1", "se2"))
  }

  test("malformed/invalid limit option fails fast with the option name") {
    TransportSpec.registry.put("lim", RecordingSpec(Map(
      "/browse/new-releases" -> releasesBody(Seq("g1" -> 7)))))
    def scanWith(l: String) = spark.read.format(providerName)
      .option("transport.handle", "lim").option("limit", l).load().collect()
    val bad = intercept[IllegalArgumentException](scanWith("abc"))
    assert(bad.getMessage.contains("limit"), bad.getMessage)
    val neg = intercept[IllegalArgumentException](scanWith("-3"))
    assert(neg.getMessage.contains("limit"), neg.getMessage)
    // in-range and over-clamp values still work (over-clamp → 50)
    assert(scanWith("1").nonEmpty)
    assert(scanWith("999").nonEmpty)
  }

  test("a bare isNotNull(country) without equality is NOT claimed") {
    TransportSpec.registry.put("bare", RecordingSpec(Map(
      "/browse/new-releases" -> releasesBody(Seq("g1" -> 7)))))
    val df = spark.read.format(providerName)
      .option("transport.handle", "bare").load()
      .filter(col("country").isNotNull)
    // unpushed scan returns NULL country — the residual filter must
    // survive and correctly drop every row
    assert(df.count() == 0)
    val filters = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(filters.nonEmpty)
  }

  test("column pruning reaches the scan") {
    TransportSpec.registry.put("prune", RecordingSpec(Map(
      "/browse/new-releases" -> releasesBody(Seq("g1" -> 7)))))
    val df = spark.read.format(providerName)
      .option("transport.handle", "prune").load()
      .select("album_id")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.map(_.output.map(_.name)) == Seq(Seq("album_id")))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("g1"))
  }

  test("audio-features: one batched ≤100 call per partition, executor-side") {
    calls.clear()
    val n = 230
    val ids = (1 to n).map(i => s"t$i")
    // the reference API returns exactly the requested ids, so the
    // recording transport echoes the `ids` param back as features
    TransportSpec.registry.put("af", EchoFeaturesSpec())
    val df = spark.read.format("spotify") // shortName via META-INF
      .option("table", "audio_features")
      .option("transport.handle", "af")
      .option("ids", ids.mkString(","))
      .load()
    // ceil(230/100) = 3 partitions — the batch contract IS the layout
    assert(df.rdd.getNumPartitions == 3)
    val got = df.collect()
    assert(got.length == n) // null entries dropped
    assert(got.map(_.getAs[String]("track_id")).toSet == ids.toSet)
    assert(got.forall(_.getAs[Double]("tempo") == 120.0))
    val afCalls = calls.asScala.filter(_._1 == "/audio-features").toSeq
    assert(afCalls.size == 3, afCalls.map(_._2("ids").split(",").length))
    assert(afCalls.forall(_._2("ids").split(",").length <= 100))
    assert(afCalls.map(_._2("ids").split(",").length).sorted == Seq(30, 100, 100))
  }

  test("audio-features >100 ids: batched client fetches ALL; the reference-literal seam truncates silently") {
    calls.clear()
    val ids = (1 to 230).map(i => s"t$i")
    val client = new graft.spotify.SpotifyClient(
      EchoFeaturesSpec().create())
    // shipping path: grouped(100) covers every id in ceil(230/100) calls
    val batched = client.getAudioFeatures(ids)
      .filter(f => !f.isNull && !f.isMissingNode)
      .map(_.path("id").asText)
    assert(batched.toSet == ids.toSet)
    assert(calls.asScala.count(_._1 == "/audio-features") == 3)
    // reference-literal path (extract.py:130-136): ONE call, exactly the
    // FIRST 100 ids, the rest silently dropped — the downstream
    // null-feature filter is what removes those tracks in the reference
    calls.clear()
    val truncated = client.getAudioFeaturesTruncated(ids)
      .filter(f => !f.isNull && !f.isMissingNode)
      .map(_.path("id").asText)
    assert(truncated == ids.take(100))
    val tCalls = calls.asScala.filter(_._1 == "/audio-features").toSeq
    assert(tCalls.size == 1)
    assert(tCalls.head._2("ids").split(",").toSeq == ids.take(100))
  }

  test("connector path agrees with the client→raw→Transforms parity path") {
    // the PipelineSpec fixture, served both ways
    val releases = releasesBody(Seq("a1" -> 3, "a2" -> 5))
    val tracks = """{"items": [{"id": "t1", "name": "T", "track_number": 1,
        "duration_ms": 1000, "explicit": false, "artists": [],
        "external_urls": {"spotify": "http://trk"}}]}"""
    val feats = """{"audio_features": [{"id": "t1", "danceability": 0.5,
        "energy": 0.5, "loudness": -5, "tempo": 100}]}"""
    val cats = """{"categories": {"items": []}}"""
    val canned = Map(
      "/browse/new-releases" -> releases,
      "/albums/a1/tracks" -> tracks,
      "/albums/a2/tracks" -> tracks,
      "/audio-features" -> feats,
      "/browse/categories" -> cats)

    // arm 1: driver-side client → raw doc → Transforms (the graded path)
    val client = new graft.spotify.SpotifyClient(
      new graft.spotify.OfflineTransport(canned))
    val p = Files.createTempFile("raw_conn", ".json")
    Files.writeString(p, client.extractFullDataset())
    val viaRaw = Transforms.albums(
      Pipeline.readRaw(spark, p.toString), Some("2024-01-01"))
      .select("album_id", "album_name", "album_type", "release_date",
        "total_tracks", "popularity", "image_url", "spotify_url")
      .collect().map(_.toSeq).sortBy(_.head.toString)

    // arm 2: the connector's new_releases table (offline.* options)
    val viaConnector = spark.read.format(providerName)
      .options(canned.map { case (k, v) => s"offline.$k" -> v })
      .load()
      .select("album_id", "album_name", "album_type", "release_date",
        "total_tracks", "popularity", "image_url", "spotify_url")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(viaConnector.toSeq == viaRaw.toSeq)

    // audio features: connector table vs the Transforms flatten
    val viaRawAf = Transforms.audioFeatures(
      Pipeline.readRaw(spark, p.toString), Some("2024-01-01"))
      .select("track_id", "danceability", "energy", "loudness", "tempo")
      .collect().map(_.toSeq)
    val viaConnectorAf = spark.read.format(providerName)
      .option("table", "audio_features")
      .option("ids", "t1")
      .options(canned.map { case (k, v) => s"offline.$k" -> v })
      .load()
      .collect().map(_.toSeq)
    assert(viaConnectorAf.toSeq == viaRawAf.toSeq)
  }
}
