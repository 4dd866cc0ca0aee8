package graft.spotify

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Golden tests for every default/null rule in SURVEY.md §1.3 against the
  * checked-in fixture (FIXTURES.md §1).
  */
class TransformsSpec extends SparkSpec {

  val D = Some("2024-06-01")
  lazy val raw = Pipeline.readRaw(spark, fixturePath("spotify_raw_fixture.json"))

  test("albums: 12 columns, one row per release") {
    val a = Transforms.albums(raw, D)
    assert(a.columns.toSeq == Schemas.albums.fieldNames.toSeq)
    assert(a.count() == 2)
  }

  test("albums: straight projection and artist fields") {
    val r = Transforms.albums(raw, D).filter("album_id = 'alb1'").head
    assert(r.getAs[String]("album_name") == "First Album")
    assert(r.getAs[String]("release_date") == "2024-03-15")
    assert(r.getAs[Int]("total_tracks") == 2)
    assert(r.getAs[Int]("popularity") == 77)
    assert(r.getAs[String]("main_artist_id") == "art1")
    assert(r.getAs[String]("main_artist_name") == "Main Artist")
    assert(r.getAs[String]("artist_genres") == "rock, indie pop")
    assert(r.getAs[String]("extraction_date") == "2024-06-01")
  }

  test("albums edge: empty artists -> null main ids; null details -> '' genres; missing popularity -> 0") {
    val r = Transforms.albums(raw, D).filter("album_id = 'alb2'").head
    assert(r.getAs[String]("main_artist_id") == null)
    assert(r.getAs[String]("main_artist_name") == null)
    assert(r.getAs[String]("artist_genres") == "")
    assert(r.getAs[Int]("popularity") == 0)
    assert(r.getAs[String]("image_url") == null)
    assert(r.getAs[String]("release_date") == "1999") // variable precision kept
  }

  test("tracks: explode carries album_id; 9 columns") {
    val t = Transforms.tracks(raw, D)
    assert(t.columns.toSeq == Schemas.tracks.fieldNames.toSeq)
    assert(t.count() == 3)
    assert(t.filter("album_id = 'alb1'").count() == 2)
  }

  test("tracks: null artist name -> 'Unknown Artist'; missing explicit -> false; empty artists -> ''") {
    val t = Transforms.tracks(raw, D)
    val trk2 = t.filter("track_id = 'trk2'").head
    assert(trk2.getAs[String]("artists") == "Unknown Artist, Second Artist")
    assert(!trk2.getAs[Boolean]("explicit"))
    val trk1 = t.filter("track_id = 'trk1'").head
    assert(trk1.getAs[Boolean]("explicit"))
    assert(trk1.getAs[String]("spotify_url") == "https://open.spotify.com/track/trk1")
    val trk3 = t.filter("track_id = 'trk3'").head
    assert(trk3.getAs[String]("artists") == "")
  }

  test("audio_features: null entries filtered, id renamed") {
    val f = Transforms.audioFeatures(raw, D)
    assert(f.columns.toSeq == Schemas.audioFeatures.fieldNames.toSeq)
    assert(f.count() == 2) // 3 entries, one null
    val r = f.filter("track_id = 'trk1'").head
    assert(r.getAs[Double]("danceability") == 0.61)
    assert(r.getAs[Double]("tempo") == 120.5)
  }

  test("merge: left join keeps all tracks, suffix-drop leaves 9+4 columns") {
    val t = Transforms.tracks(raw, D)
    val f = Transforms.audioFeatures(raw, D)
    val m = Transforms.mergeTracksFeatures(t, f)
    assert(m.count() == t.count()) // left join, unique feature ids
    assert(m.columns.length == 13)
    assert(m.columns.count(_ == "extraction_date") == 1)
    val orphan = m.filter("track_id = 'trk3'").head
    assert(orphan.isNullAt(orphan.fieldIndex("danceability")))
    val hit = m.filter("track_id = 'trk1'").head
    assert(hit.getAs[Double]("energy") == 0.8)
  }

  test("transform_all: five tables, categories always empty") {
    val all = Transforms.all(spark, raw, D)
    assert(all.keySet == Set("albums", "tracks", "audio_features",
      "categories", "tracks_with_features"))
    assert(all("categories").isEmpty)
  }

  test("empty dataset (offline fallback) produces empty tables, not errors") {
    import java.nio.file.{Files, Paths}
    val p = Files.createTempFile("empty_raw", ".json")
    Files.writeString(p, Pipeline.emptyRawJson)
    val all = Transforms.all(spark, Pipeline.readRaw(spark, p.toString), D)
    assert(all.values.forall(_.isEmpty))
  }
}
