package graft.spotify

import org.apache.spark.sql.types._

/** Explicit schemas for the Spotify pipeline (SURVEY.md §1.2–1.4).
  *
  * The reference infers every schema dynamically (pandas dtype inference,
  * `.get`-with-default — `scripts/transform.py:44-57`); at 100 TB,
  * `spark.read.json` inference is a full extra pass over the data, so this
  * engine pins one `StructType` per table. `release_date` stays a string:
  * Spotify precision varies (`YYYY` | `YYYY-MM` | `YYYY-MM-DD`,
  * `scripts/extract.py:238`) and parsing to DateType would corrupt it.
  */
object Schemas {

  private def s(name: String, nullable: Boolean = true) =
    StructField(name, StringType, nullable)

  val artistRef: StructType = StructType(Seq(s("id"), s("name")))

  val mainArtistDetails: StructType = StructType(Seq(
    s("id"), s("name"),
    StructField("popularity", IntegerType),
    StructField("genres", ArrayType(StringType)),
    StructField("followers", StructType(Seq(StructField("total", LongType))))))

  val track: StructType = StructType(Seq(
    s("id"), s("name"),
    StructField("track_number", IntegerType),
    StructField("duration_ms", LongType),
    StructField("explicit", BooleanType),
    StructField("artists", ArrayType(artistRef)),
    StructField("external_urls", StructType(Seq(s("spotify"))))))

  val release: StructType = StructType(Seq(
    s("album_id"), s("album_name"), s("album_type"), s("release_date"),
    StructField("total_tracks", IntegerType),
    StructField("popularity", IntegerType),
    StructField("artists", ArrayType(artistRef)),
    StructField("main_artist_details", mainArtistDetails),
    StructField("tracks", ArrayType(track)),
    s("image_url"), s("spotify_url"),
    StructField("available_markets", ArrayType(StringType))))

  val audioFeature: StructType = StructType(Seq(
    s("id"),
    StructField("danceability", DoubleType),
    StructField("energy", DoubleType),
    StructField("loudness", DoubleType),
    StructField("tempo", DoubleType)))

  val category: StructType = StructType(Seq(s("id"), s("name"), s("href")))

  /** The raw extraction document (`scripts/extract.py:271-276`): one
    * pretty-printed JSON object per run — read with
    * `.option("multiLine", true)`.
    */
  val raw: StructType = StructType(Seq(
    s("extraction_timestamp"),
    StructField("releases", ArrayType(release)),
    StructField("audio_features", ArrayType(audioFeature)),
    StructField("categories", ArrayType(category))))

  /** Flat `albums` table (12 cols — `scripts/transform.py:44-57`). */
  val albums: StructType = StructType(Seq(
    s("album_id"), s("album_name"), s("album_type"), s("release_date"),
    StructField("total_tracks", IntegerType),
    StructField("popularity", IntegerType, nullable = false),
    s("main_artist_id"), s("main_artist_name"),
    s("artist_genres", nullable = false),
    s("image_url"), s("spotify_url"), s("extraction_date", nullable = false)))

  /** Flat `tracks` table (9 cols — `scripts/transform.py:78-88`). */
  val tracks: StructType = StructType(Seq(
    s("track_id"), s("track_name"), s("album_id"),
    s("artists", nullable = false),
    StructField("track_number", IntegerType),
    StructField("duration_ms", LongType),
    StructField("explicit", BooleanType, nullable = false),
    s("spotify_url"), s("extraction_date", nullable = false)))

  /** Flat `audio_features` table (6 cols — `scripts/transform.py:107-114`). */
  val audioFeatures: StructType = StructType(Seq(
    s("track_id"),
    StructField("danceability", DoubleType),
    StructField("energy", DoubleType),
    StructField("loudness", DoubleType),
    StructField("tempo", DoubleType),
    s("extraction_date", nullable = false)))

  /** `categories` is always produced empty (`scripts/transform.py:177`). */
  val categories: StructType = StructType(Seq(s("id"), s("name"), s("href")))
}
