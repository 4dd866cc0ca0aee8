package graft.spotify

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Instant
import scala.jdk.CollectionConverters._

/** Transport seam for the Spotify Web API (SURVEY.md §2.1 S1–S7).
  *
  * The extraction stage is inherently driver-side at reference scale
  * (tens of albums — `scripts/extract.py:194-276`); the transport trait
  * exists so (a) tests run fully offline against canned JSON, and (b) a
  * partition-parallel fetch (`mapPartitions` with one transport per
  * partition, keyed by id ranges) can reuse the same client verbatim when
  * the id space is large (SURVEY.md §7.3).
  */
trait SpotifyTransport {
  /** GET `endpoint` (relative to the API base) → raw JSON, or None on
    * error (error→None mirrors `extract.py:190-192`).
    */
  def get(endpoint: String, params: Map[String, String]): Option[String]
}

/** OAuth2 client-credentials HTTP transport (`extract.py:40-96`):
  * token fetch, bearer header, one retry on 401.
  */
final class HttpSpotifyTransport(clientId: String, clientSecret: String,
    apiBase: String = "https://api.spotify.com/v1",
    tokenUrl: String = "https://accounts.spotify.com/api/token")
  extends SpotifyTransport {

  private val http = HttpClient.newHttpClient()
  private var token: Option[String] = None

  private def fetchToken(): Unit = {
    val creds = java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes("UTF-8"))
    val req = HttpRequest.newBuilder(URI.create(tokenUrl))
      .header("Authorization", s"Basic $creds")
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString("grant_type=client_credentials"))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    token = Some(new ObjectMapper().readTree(resp.body).get("access_token").asText)
  }

  override def get(endpoint: String, params: Map[String, String]): Option[String] = {
    if (token.isEmpty) fetchToken()
    def call(): HttpResponse[String] = {
      val qs = if (params.isEmpty) ""
        else "?" + params.map { case (k, v) =>
          s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}" }.mkString("&")
      val req = HttpRequest.newBuilder(URI.create(s"$apiBase$endpoint$qs"))
        .header("Authorization", s"Bearer ${token.get}").GET().build()
      http.send(req, HttpResponse.BodyHandlers.ofString())
    }
    try {
      var resp = call()
      if (resp.statusCode == 401) { fetchToken(); resp = call() } // extract.py:88-90
      if (resp.statusCode >= 400) None else Some(resp.body)
    } catch { case _: Exception => None }
  }
}

/** Offline transport: endpoint-prefix → canned JSON. The test-mode
  * fallback lattice of `dags/spotify_etl_dag.py:137-176` means the whole
  * engine must run without the network; this is that mode.
  */
final class OfflineTransport(responses: Map[String, String])
  extends SpotifyTransport {
  override def get(endpoint: String, params: Map[String, String]): Option[String] =
    responses.collectFirst { case (prefix, body)
      if endpoint.startsWith(prefix) => body }
}

/** The extraction surface (S2–S7): each method is one reference endpoint
  * wrapper; `extractFullDataset` composes them into the nested raw
  * document (`extract.py:194-276`).
  */
final class SpotifyClient(transport: SpotifyTransport) {
  private val mapper = new ObjectMapper()

  private def parse(body: Option[String]): Option[JsonNode] =
    body.flatMap(b => try Some(mapper.readTree(b)) catch { case _: Exception => None })

  /** S2: `/browse/new-releases`, limit clamped to 50 (`extract.py:109`). */
  def getNewReleases(limit: Int = 50, country: Option[String] = None): Seq[JsonNode] = {
    val params = Map("limit" -> math.min(limit, 50).toString) ++
      country.map("country" -> _)
    parse(transport.get("/browse/new-releases", params))
      .map(_.path("albums").path("items").elements.asScala.toSeq)
      .getOrElse(Seq.empty)
  }

  /** S3: `/audio-features?ids=…`, ≤100 ids per call (`extract.py:120-142`);
    * unlike the reference (which silently truncates >100,
    * `extract.py:131-133`) callers batch via `grouped(100)`.
    */
  def getAudioFeatures(trackIds: Seq[String]): Seq[JsonNode] =
    trackIds.grouped(100).toSeq.flatMap { batch =>
      parse(transport.get("/audio-features", Map("ids" -> batch.mkString(","))))
        .map(_.path("audio_features").elements.asScala.toSeq)
        .getOrElse(Seq.empty)
    }

  /** The reference's LITERAL S3 semantics (`extract.py:130-136`): ONE
    * request, ids beyond the first 100 silently dropped (the Python
    * logs a warning and slices `track_ids[:100]`). Kept as the
    * documented parity seam beside the batched [[getAudioFeatures]]
    * shipping path — a reference user migrating byte-for-byte behavior
    * (features missing for tracks past 100, which the downstream
    * null-feature filter then removes) gets it here; the DSv2
    * connector's ≤100-per-partition contract is the scale
    * generalization under which truncation never triggers.
    */
  def getAudioFeaturesTruncated(trackIds: Seq[String]): Seq[JsonNode] =
    parse(transport.get("/audio-features",
        Map("ids" -> trackIds.take(100).mkString(","))))
      .map(_.path("audio_features").elements.asScala.toSeq)
      .getOrElse(Seq.empty)

  /** S4: `/albums/{id}/tracks`, limit 50 (`extract.py:144-159`). */
  def getTracksFromAlbum(albumId: String): Seq[JsonNode] =
    parse(transport.get(s"/albums/$albumId/tracks", Map("limit" -> "50")))
      .map(_.path("items").elements.asScala.toSeq)
      .getOrElse(Seq.empty)

  /** S5: `/browse/categories` (`extract.py:161-176`). */
  def getCategories(limit: Int = 50): Seq[JsonNode] =
    parse(transport.get("/browse/categories", Map("limit" -> limit.toString)))
      .map(_.path("categories").path("items").elements.asScala.toSeq)
      .getOrElse(Seq.empty)

  /** S6: `/artists/{id}`, None on error (`extract.py:178-192`). */
  def getArtistInfo(artistId: String): Option[JsonNode] =
    parse(transport.get(s"/artists/$artistId", Map.empty))

  /** S7 (`extract.py:194-276`): fetch releases, then per album its tracks
    * (skipping zero-track albums — inner-join semantics,
    * `extract.py:220-221`) and the first artist's details; batch-fetch
    * audio features for all collected track ids; attach categories.
    * Returns the raw document as a JSON string ready for the raw zone.
    */
  def extractFullDataset(limit: Int = 10, country: Option[String] = None): String = {
    val releases = getNewReleases(limit, country)
    val out = mapper.createObjectNode()
    out.put("extraction_timestamp", Instant.now.toString)
    val enriched = out.putArray("releases")
    val allTrackIds = scala.collection.mutable.ArrayBuffer[String]()

    releases.foreach { album =>
      val albumId = album.path("id").asText
      val tracks = getTracksFromAlbum(albumId)
      if (tracks.nonEmpty) { // extract.py:220-221
        val e = enriched.addObject()
        e.put("album_id", albumId)
        e.put("album_name", album.path("name").asText)
        e.put("album_type", album.path("type").asText)
        e.put("release_date", album.path("release_date").asText)
        e.put("total_tracks", album.path("total_tracks").asInt)
        e.put("popularity", album.path("popularity").asInt(0)) // default 0
        val artists = e.putArray("artists")
        album.path("artists").elements.asScala.foreach { a =>
          val n = artists.addObject()
          n.put("id", a.path("id").asText)
          n.put("name", a.path("name").asText)
        }
        val mainArtist = album.path("artists").elements.asScala.toSeq.headOption
        val details = mainArtist.flatMap(a => getArtistInfo(a.path("id").asText))
        details match {
          case Some(d) => e.set[ObjectNode]("main_artist_details", d)
          case None => e.putNull("main_artist_details")
        }
        val ts = e.putArray("tracks")
        tracks.foreach { t =>
          ts.add(t)
          allTrackIds += t.path("id").asText
        }
        val img = album.path("images").elements.asScala.toSeq.headOption
        img match {
          case Some(i) => e.put("image_url", i.path("url").asText)
          case None => e.putNull("image_url")
        }
        e.put("spotify_url", album.path("external_urls").path("spotify").asText)
        val mk = e.putArray("available_markets")
        album.path("available_markets").elements.asScala
          .foreach(m => mk.add(m.asText))
      }
    }
    val af = out.putArray("audio_features")
    getAudioFeatures(allTrackIds.toSeq).foreach(af.add)
    val cats = out.putArray("categories")
    getCategories().foreach(cats.add)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(out)
  }
}
