package graft.spotify

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over randomly generated raw documents
  * (SURVEY.md §5.3): whatever the input shape, the transform rules hold.
  * Uses plain ScalaCheck generators with fixed seeds (deterministic runs;
  * scalatestplus bridge isn't in the offline dependency cache).
  */
class TransformsPropSpec extends SparkSpec {

  private val genArtist: Gen[Row] = for {
    id <- Gen.identifier.map(_.take(8))
    name <- Gen.option(Gen.alphaStr.map(_.take(12)))
  } yield Row(id, name.orNull)

  private val genTrack: Gen[Row] = for {
    id <- Gen.identifier.map(_.take(10))
    name <- Gen.alphaStr.map(_.take(16))
    num <- Gen.chooseNum(1, 20)
    dur <- Gen.chooseNum(1000L, 400000L)
    explicit <- Gen.option(Gen.oneOf(true, false))
    nArtists <- Gen.chooseNum(0, 2)
    artists <- Gen.listOfN(nArtists, genArtist)
    url <- Gen.option(Gen.const("http://t"))
  } yield Row(id, name, num, dur, explicit.map(Boolean.box).orNull,
    artists, url.map(u => Row(u)).orNull)

  private val genAlbum: Gen[Row] = for {
    id <- Gen.identifier.map(_.take(10))
    name <- Gen.alphaStr.map(_.take(20))
    nArtists <- Gen.chooseNum(0, 3)
    artists <- Gen.listOfN(nArtists, genArtist)
    details <- Gen.option(for {
      ng <- Gen.chooseNum(0, 4)
      g <- Gen.listOfN(ng, Gen.alphaLowerStr.map(_.take(6)))
    } yield Row("aid", "aname", 5, g, Row(10L)))
    nTracks <- Gen.chooseNum(1, 5)
    tracks <- Gen.listOfN(nTracks, genTrack)
    pop <- Gen.option(Gen.chooseNum(0, 100))
  } yield Row(id, name, "album", "2020-01-01", tracks.size,
    pop.map(Int.box).orNull, artists, details.orNull, tracks, null,
    "http://alb", List("US"))

  private val genDoc: Gen[List[Row]] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, genAlbum))

  private def rawDf(albums: List[Row]) = {
    val row = Row("2024-01-01T00:00:00Z", albums, List.empty[Row], List.empty[Row])
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), Schemas.raw)
  }

  test("invariants hold over 25 random raw documents") {
    (0 until 25).foreach { i =>
      val albums = genDoc(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator produced no sample for seed $i"))
      val raw = rawDf(albums)
      val t = Transforms.tracks(raw, Some("2024-01-01"))
      val a = Transforms.albums(raw, Some("2024-01-01"))
      val f = Transforms.audioFeatures(raw, Some("2024-01-01"))
      val m = Transforms.mergeTracksFeatures(t, f)
      val trackRows = t.collect()
      val albumRows = a.collect()
      // one album row per release; one track row per nested track
      assert(albumRows.length == albums.size)
      assert(trackRows.length == albums.map(_.getAs[List[Row]](8).size).sum)
      // left-join with unique feature ids never duplicates or drops tracks
      assert(m.count() == trackRows.length)
      // every track's album_id exists in albums (FK integrity)
      val albumIds = albumRows.map(_.getAs[String]("album_id")).toSet
      assert(trackRows.forall(r => albumIds.contains(r.getAs[String]("album_id"))))
      // defaulted columns are never null
      assert(trackRows.forall(r => r.getAs[String]("artists") != null))
      assert(trackRows.forall(r => !r.isNullAt(r.fieldIndex("explicit"))))
      assert(albumRows.forall(r => !r.isNullAt(r.fieldIndex("popularity"))))
      assert(albumRows.forall(r => r.getAs[String]("artist_genres") != null))
    }
  }
}
