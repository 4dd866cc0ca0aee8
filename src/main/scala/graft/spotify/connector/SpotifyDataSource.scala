package graft.spotify.connector

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.spotify.{HttpSpotifyTransport, OfflineTransport, SpotifyClient, SpotifyTransport}

/** Serializable recipe for building a [[SpotifyTransport]] on an
  * executor. The transports themselves hold live state (an HttpClient,
  * an OAuth token) and must be constructed where they run; the spec is
  * the closure-safe factory that ships instead (the `fetch(ids)`
  * executor seam of SURVEY.md §7.3, now exercised by a real connector).
  */
trait TransportSpec extends Serializable {
  def create(): SpotifyTransport
}

/** Canned-JSON offline transport recipe (the test-mode lattice of
  * `dags/spotify_etl_dag.py:137-176` at connector level).
  */
final case class OfflineSpec(responses: Map[String, String])
  extends TransportSpec {
  override def create(): SpotifyTransport = new OfflineTransport(responses)
}

/** OAuth2 HTTP transport recipe (`scripts/extract.py:40-96`): one
  * client + token per executor-side reader, never serialized.
  */
final case class HttpSpec(clientId: String, clientSecret: String,
    apiBase: String, tokenUrl: String) extends TransportSpec {
  override def create(): SpotifyTransport =
    new HttpSpotifyTransport(clientId, clientSecret, apiBase, tokenUrl)
}

object TransportSpec {
  /** Driver-side registry for injecting arbitrary specs (tests use it
    * to plant param-recording transports). Resolved at scan-build time
    * on the DRIVER; the resolved spec object then ships to executors by
    * ordinary closure serialization, so this works beyond one JVM as
    * long as the spec class is on the executor classpath.
    */
  val registry = new java.util.concurrent.ConcurrentHashMap[String, TransportSpec]()

  /** Options (lowercased keys) → spec. `transport.handle` wins (registry
    * seam); `mode=http` builds the OAuth client from credentials;
    * otherwise every `offline.<endpoint-prefix>` option becomes one
    * canned response.
    */
  def fromOptions(opts: Map[String, String]): TransportSpec =
    opts.get("transport.handle") match {
      case Some(h) =>
        val spec = registry.get(h)
        require(spec != null, s"no TransportSpec registered under '$h'")
        spec
      case None if opts.get("mode").contains("http") =>
        HttpSpec(
          opts.getOrElse("clientid",
            sys.error("spotify http mode requires clientId")),
          opts.getOrElse("clientsecret",
            sys.error("spotify http mode requires clientSecret")),
          opts.getOrElse("apibase", "https://api.spotify.com/v1"),
          opts.getOrElse("tokenurl", "https://accounts.spotify.com/api/token"))
      case None =>
        OfflineSpec(opts.collect {
          case (k, v) if k.startsWith("offline.") =>
            k.stripPrefix("offline.") -> v
        })
    }
}

/** Column schemas the connector serves. */
object SpotifyTables {
  /** S2 as a TABLE: one row per new-release album. `country` is both a
    * result column and the PUSHDOWN surface — `filter($"country" ===
    * "SE")` becomes the API's `country` request parameter
    * (`extract.py:109-111`), never a post-scan filter.
    */
  val newReleases: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("album_id", StringType),
    StructField("album_name", StringType),
    StructField("album_type", StringType),
    StructField("release_date", StringType),
    StructField("total_tracks", IntegerType),
    StructField("popularity", IntegerType),
    StructField("image_url", StringType),
    StructField("spotify_url", StringType)))

  /** S3 as a TABLE over a known id list: each input partition carries
    * ≤100 ids and issues exactly ONE batched `/audio-features` call
    * executor-side (`extract.py:120-142`'s batching as the partition
    * contract, not a driver loop).
    */
  val audioFeatures: StructType = StructType(Seq(
    StructField("track_id", StringType),
    StructField("danceability", DoubleType),
    StructField("energy", DoubleType),
    StructField("loudness", DoubleType),
    StructField("tempo", DoubleType)))

  def schemaFor(table: String): StructType = table match {
    case "audio_features" => audioFeatures
    case "new_releases" => newReleases
    case other => throw new IllegalArgumentException(
      s"unknown spotify table '$other' (new_releases | audio_features)")
  }
}

/** `spark.read.format("spotify")` — the DataSourceV2 face of the
  * extraction stage (SURVEY.md §2.1-S2/S3). Options:
  *
  *  - `table`: `new_releases` (default) | `audio_features`
  *  - `limit`: new-releases page size, clamped to 50 like
  *    `extract.py:109`; a `df.limit(n)` is ALSO pushed here
  *  - `ids`: comma-separated track ids (audio_features input set)
  *  - transport: `mode=http` + `clientId`/`clientSecret`, or
  *    `offline.<endpoint-prefix>` canned bodies, or `transport.handle`
  *    into [[TransportSpec.registry]]
  */
class SpotifyTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "spotify"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpotifyTables.schemaFor(options.getOrDefault("table", "new_releases"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SpotifyTable(properties.asScala.map {
      case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v
    }.toMap)
}

class SpotifyTable(opts: Map[String, String]) extends Table with SupportsRead {
  private val table = opts.getOrElse("table", "new_releases")
  override def name(): String = s"spotify.$table"
  override def schema(): StructType = SpotifyTables.schemaFor(table)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    table match {
      case "audio_features" => new AudioFeaturesScanBuilder(opts)
      case _ => new NewReleasesScanBuilder(opts)
    }
}

/** Pushdown surface for the new-releases scan: `country = '<v>'` and
  * LIMIT both travel into the API request (the reference pushes them as
  * query params, `extract.py:109-111`); required-column pruning trims
  * the produced rows. A pushed country is REMOVED from the post-scan
  * plan (returned as residual-free), which the connector spec asserts.
  */
class NewReleasesScanBuilder(opts: Map[String, String]) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownLimit
  with SupportsPushDownRequiredColumns {

  private var pushedCountry: Option[String] = None
  private var limit: Int = {
    val raw = opts.get("limit").map { v =>
      require(v.matches("-?\\d+"),
        s"spotify option 'limit' must be an integer, got '$v'")
      v.toInt
    }.getOrElse(50)
    // clamp to the API's documented [1, 50] (extract.py:109): the
    // reference passes min(limit, 50) as a query param and the API
    // rejects non-positive values, so a negative/zero option is a
    // caller bug, not a scan shape
    require(raw >= 1,
      s"spotify option 'limit' must be >= 1, got $raw")
    math.min(raw, 50)
  }
  private var required: StructType = SpotifyTables.newReleases
  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Catalyst pairs `country = 'SE'` with an implied IsNotNull(country);
    // both are fully satisfied by the source (a country-pushed scan
    // returns exactly that non-null country), so both are accepted and
    // NO post-scan Filter remains — the spec asserts this. A bare
    // IsNotNull with no equality stays residual: an unpushed scan
    // returns NULL country rows, so the source can't discharge it.
    // Only ONE distinct country equality can be discharged by a scan
    // that requests one country: a conjunction over two different
    // values (correct result: empty) must leave the extras residual so
    // Spark re-applies them post-scan rather than silently returning
    // one country's rows.
    val eqValues = filters.collect {
      case EqualTo("country", v: String) => v
    }.distinct
    val pushable = eqValues.headOption
    val hasEq = pushable.isDefined
    val (ours, residual) = filters.partition {
      case EqualTo("country", v: String) => pushable.contains(v)
      case org.apache.spark.sql.sources.IsNotNull("country") => hasEq
      case _ => false
    }
    pushedCountry = pushable
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pushLimit(l: Int): Boolean = {
    limit = math.min(limit, l)
    // ≤50 the API honors exactly (and the reader re-truncates
    // defensively); beyond the clamp the push is only partial
    l <= 50
  }

  override def pruneColumns(s: StructType): Unit = required = s

  override def build(): Scan =
    new NewReleasesScan(TransportSpec.fromOptions(opts), limit,
      pushedCountry, required)
}

case class NewReleasesPartition(limit: Int, country: Option[String])
  extends InputPartition

class NewReleasesScan(spec: TransportSpec, limit: Int,
    country: Option[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"spotify new-releases limit=$limit country=${country.getOrElse("*")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(NewReleasesPartition(limit, country))
  override def createReaderFactory(): PartitionReaderFactory =
    new NewReleasesReaderFactory(spec, required)
}

class NewReleasesReaderFactory(spec: TransportSpec, required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[NewReleasesPartition]
    new PartitionReader[InternalRow] {
      // one transport + client per reader — the expensive init happens
      // executor-side, once per partition (SURVEY §7.3)
      private val client = new SpotifyClient(spec.create())
      private val albums = client.getNewReleases(part.limit, part.country)
        .take(part.limit).iterator
      private var current: JsonNode = _
      override def next(): Boolean = {
        if (!albums.hasNext) return false
        current = albums.next(); true
      }
      override def get(): InternalRow = InternalRow.fromSeq(
        required.fieldNames.toIndexedSeq.map(f =>
          JsonRows.albumField(current, part.country, f)))
      override def close(): Unit = ()
    }
  }
}

/** JsonNode → Catalyst value extraction shared by both readers; the
  * null/default rules mirror the parity layer (`popularity` defaults 0
  * per `extract.py:240`, absent strings surface as NULL).
  */
private[connector] object JsonRows {
  private def utf8(n: JsonNode): AnyRef =
    if (n == null || n.isMissingNode || n.isNull) null
    else UTF8String.fromString(n.asText)

  def albumField(a: JsonNode, country: Option[String], name: String): Any =
    name match {
      case "country" => country.map(UTF8String.fromString).orNull
      case "album_id" => utf8(a.path("id"))
      case "album_name" => utf8(a.path("name"))
      case "album_type" => utf8(a.path("type"))
      case "release_date" => utf8(a.path("release_date"))
      case "total_tracks" => a.path("total_tracks").asInt(0)
      case "popularity" => a.path("popularity").asInt(0)
      case "image_url" =>
        a.path("images").elements.asScala.toSeq.headOption
          .map(i => utf8(i.path("url"))).orNull
      case "spotify_url" => utf8(a.path("external_urls").path("spotify"))
      case other => throw new IllegalArgumentException(other)
    }

  def featureField(f: JsonNode, name: String): Any = name match {
    case "track_id" => utf8(f.path("id"))
    case "danceability" => f.path("danceability").asDouble(0.0)
    case "energy" => f.path("energy").asDouble(0.0)
    case "loudness" => f.path("loudness").asDouble(0.0)
    case "tempo" => f.path("tempo").asDouble(0.0)
    case other => throw new IllegalArgumentException(other)
  }
}

class AudioFeaturesScanBuilder(opts: Map[String, String]) extends ScanBuilder
  with SupportsPushDownRequiredColumns {
  private var required: StructType = SpotifyTables.audioFeatures
  override def pruneColumns(s: StructType): Unit = required = s
  override def build(): Scan = {
    val ids = opts.get("ids").map(_.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    new AudioFeaturesScan(TransportSpec.fromOptions(opts), ids, required)
  }
}

case class AudioFeaturesPartition(ids: Seq[String]) extends InputPartition

class AudioFeaturesScan(spec: TransportSpec, ids: Seq[String],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"spotify audio-features n_ids=${ids.size}"
  // the ≤100 batch contract (extract.py:131-133) IS the partitioning:
  // each partition's reader issues exactly one batched call
  override def planInputPartitions(): Array[InputPartition] =
    ids.grouped(100).map(g => AudioFeaturesPartition(g): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AudioFeaturesReaderFactory(spec, required)
}

class AudioFeaturesReaderFactory(spec: TransportSpec, required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[AudioFeaturesPartition]
    new PartitionReader[InternalRow] {
      private val client = new SpotifyClient(spec.create())
      // ONE transport call for the whole ≤100-id partition; null
      // entries are dropped (transform.py:106's rule, at the source)
      private val feats = client.getAudioFeatures(part.ids)
        .filter(f => !f.isNull && !f.isMissingNode).iterator
      private var current: JsonNode = _
      override def next(): Boolean = {
        if (!feats.hasNext) return false
        current = feats.next(); true
      }
      override def get(): InternalRow = InternalRow.fromSeq(
        required.fieldNames.toIndexedSeq.map(f =>
          JsonRows.featureField(current, f)))
      override def close(): Unit = ()
    }
  }
}
