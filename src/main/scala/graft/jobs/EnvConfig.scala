package graft.jobs

import java.nio.file.{Files, Paths}

/** Runtime environment configuration — the reference's configparser INI
  * lifecycle (`S1:23-40` = `/root/reference/PySpark_Scripts/
  * stage_1_hcp_channel_all_hardcode.py`: `read_config_file` +
  * `check_config_section`; `S1:50-91`: per-env `config.get(env, key)`
  * lookups, some holding JSON objects that are sub-key-indexed, e.g.
  * `json.loads(config.get(env, "athena_database"))['normalized']`).
  *
  * The port keeps env switching a RUNTIME decision, as deployed users
  * expect: one `configuration.ini` with a section per environment, the
  * environment chosen by job argument — not a compile-time case class.
  * The parsed result feeds the existing [[ChannelJobs.JobConfig]], so the
  * job code is untouched.
  *
  * Supported INI subset (exactly what the reference file shape uses):
  * `[section]` headers, `key = value` / `key: value` options (keys
  * lowercased, configparser-style), `#`/`;` full-line comments, blank
  * lines. Values run to end of line (no inline comments — configparser's
  * default since Python 3).
  */
object EnvConfig {

  /** A parsed INI: sections of lowercased option keys. */
  final class IniConfig private[EnvConfig] (
      val sections: Map[String, Map[String, String]]) {
    /** configparser `has_section`. */
    def hasSection(env: String): Boolean = sections.contains(env)
    /** configparser `config.get(env, key)` — throws on a missing key, like
      * the original's NoOptionError. */
    def get(env: String, key: String): String =
      sections.getOrElse(env,
          throw new NoSuchElementException(s"no section [$env]"))
        .getOrElse(key.toLowerCase,
          throw new NoSuchElementException(s"no option '$key' in [$env]"))
    /** `json.loads(config.get(env, key))[sub]` — the reference's pattern
      * for JSON-valued options (folder_names, athena_database). Values are
      * flat string→string objects there; this parses exactly that shape. */
    def getJson(env: String, key: String, sub: String): String = {
      val obj = get(env, key)
      val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      pair.findAllMatchIn(obj)
        .map(m => m.group(1) -> m.group(2)).toMap
        .getOrElse(sub, throw new NoSuchElementException(
          s"no JSON key '$sub' in option '$key' of [$env]"))
    }
  }

  /** `read_config_file` (S1:23-31): parse the INI at `path`. */
  def readConfigFile(path: String): IniConfig =
    parse(Files.readString(Paths.get(path)))

  def parse(text: String): IniConfig = {
    val section = """\[([^\]]+)\]""".r
    var current: Option[String] = None
    val acc = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, String]]
    text.linesIterator.map(_.trim).filter(_.nonEmpty)
      .filterNot(l => l.startsWith("#") || l.startsWith(";"))
      .foreach {
        case section(name) =>
          current = Some(name)
          acc.getOrElseUpdate(name, scala.collection.mutable.Map.empty)
        case line =>
          val sec = current.getOrElse(throw new IllegalArgumentException(
            s"option before any [section]: '$line'"))
          val idx = {
            val eq = line.indexOf('='); val co = line.indexOf(':')
            if (eq < 0) co else if (co < 0) eq else math.min(eq, co)
          }
          if (idx <= 0) throw new IllegalArgumentException(
            s"not a key/value line: '$line'")
          acc(sec).update(line.take(idx).trim.toLowerCase,
            line.drop(idx + 1).trim)
      }
    new IniConfig(acc.view.mapValues(_.toMap).toMap)
  }

  /** `check_config_section` (S1:33-40) — message verbatim from the
    * reference, so ops runbooks keyed on it keep matching. */
  def checkConfigSection(config: IniConfig, env: String): Unit =
    if (!config.hasSection(env))
      throw new IllegalArgumentException(
        "Environment details doesn't exist in configuration file")

  /** Build the job's [[ChannelJobs.JobConfig]] from the section for `env`:
    * `out_dir` is required (the reference's bucket_name analogue); the
    * rest default exactly as the case class does. */
  def jobConfig(config: IniConfig, env: String): ChannelJobs.JobConfig = {
    checkConfigSection(config, env)
    def opt(key: String, dflt: String): String =
      config.sections(env).getOrElse(key, dflt)
    ChannelJobs.JobConfig(
      outDir = config.get(env, "out_dir"),
      script = opt("script", "stage_1_channel_all"),
      layer = opt("layer", "normalized"),
      batchId = opt("batch_id", "b1"),
      outputFiles = opt("output_files", "8").toInt)
  }

  /** Argument resolution, mirroring `getResolvedOptions(sys.argv,
    * ['environment', ...])` (S1:1263-1270): `--config <ini-path>
    * --environment <env>` → the runtime JobConfig. */
  def fromArgs(args: Array[String]): ChannelJobs.JobConfig = {
    val kv = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val path = kv.getOrElse("config", throw new IllegalArgumentException(
      "--config <path> is required"))
    val env = kv.getOrElse("environment", throw new IllegalArgumentException(
      "--environment <env> is required"))
    jobConfig(readConfigFile(path), env)
  }
}
