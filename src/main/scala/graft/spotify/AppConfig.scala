package graft.spotify

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** YAML + env-var configuration with dot-path lookup — the surface of
  * `config/config.py:44-172` (load YAML, overlay environment variables,
  * `get("a.b.c", default)`), without its checked-in credentials
  * (`config/config.yaml:5-6` — never copied).
  *
  * Env overrides use the reference's names: `SPOTIFY_CLIENT_ID`,
  * `SPOTIFY_CLIENT_SECRET` map onto `spotify.client_id` /
  * `spotify.client_secret` (`config/config.py:96-104`).
  */
final class AppConfig(root: Map[String, Any], env: Map[String, String]) {

  private val envMap = Map(
    "spotify.client_id" -> "SPOTIFY_CLIENT_ID",
    "spotify.client_secret" -> "SPOTIFY_CLIENT_SECRET",
    "output.base_dir" -> "SPOTIFY_OUTPUT_DIR",
    "output.format" -> "SPOTIFY_OUTPUT_FORMAT")

  /** Null YAML values (e.g. `country: null` in the defaults) count as
    * absent — flatMap(Option(_)) so callers never NPE on `.toString`.
    */
  def get(path: String): Option[Any] =
    envMap.get(path).flatMap(env.get)
      .orElse(lookup(root, path.split('.').toList).flatMap(Option(_)))

  def getString(path: String, default: String = ""): String =
    get(path).map(_.toString).getOrElse(default)

  def getInt(path: String, default: Int): Int =
    get(path).map(_.toString.toInt).getOrElse(default)

  def getBoolean(path: String, default: Boolean): Boolean =
    get(path).map(_.toString.toBoolean).getOrElse(default)

  private def lookup(m: Map[String, Any], path: List[String]): Option[Any] =
    path match {
      case Nil => None
      case key :: Nil => m.get(key)
      case key :: rest => m.get(key) match {
        case Some(sub: Map[String @unchecked, Any @unchecked]) =>
          lookup(sub, rest)
        case _ => None
      }
    }
}

object AppConfig {

  /** Defaults mirroring `config/config.yaml` (minus credentials). */
  val defaults: Map[String, Any] = Map(
    "output" -> Map(
      "base_dir" -> "data", "format" -> "csv",
      "raw_dir" -> "raw", "processed_dir" -> "processed",
      "final_dir" -> "final"),
    "parameters" -> Map("limit" -> 10, "country" -> null),
    "transformations" -> Map("merge_tracks_features" -> true))

  def load(path: Option[String] = None,
      env: Map[String, String] = sys.env): AppConfig = {
    val fromFile = path.filter(p => Files.exists(Paths.get(p))).map { p =>
      val yaml = new org.yaml.snakeyaml.Yaml()
      toScala(yaml.load[Any](Files.readString(Paths.get(p))))
        .asInstanceOf[Map[String, Any]]
    }.getOrElse(Map.empty[String, Any])
    new AppConfig(deepMerge(defaults, fromFile), env)
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toList
    case other => other
  }

  private def deepMerge(base: Map[String, Any],
      over: Map[String, Any]): Map[String, Any] =
    (base.keySet ++ over.keySet).map { k =>
      k -> ((base.get(k), over.get(k)) match {
        case (Some(b: Map[String @unchecked, Any @unchecked]),
              Some(o: Map[String @unchecked, Any @unchecked])) =>
          deepMerge(b, o)
        case (_, Some(o)) => o
        case (Some(b), None) => b
        case _ => null
      })
    }.toMap
}
