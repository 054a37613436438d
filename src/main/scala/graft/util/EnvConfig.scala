package graft.util

import graft.sources.JdbcWarehouse

/** dotenv-style configuration resolution — the reference wires its
  * connection setup from module-level constants (ingest.py:9-13:
  * DB_USER / DB_PASSWORD / DB_HOST / DB_PORT / DB_NAME;
  * publish.py:146-149: credentials file + spreadsheet id). The
  * deployable equivalent is a KEY=VALUE config file with real
  * environment variables taking precedence (the dotenv convention), so
  * the same build runs against dev and prod warehouses without edits.
  *
  * Syntax: `KEY=VALUE` per line; blank lines and `#` comments ignored;
  * optional `export ` prefix; optional single or double quotes around
  * the value (stripped when they enclose the whole value).
  */
object EnvConfig {

  def parse(lines: Iterable[String]): Map[String, String] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        val line = if (l.startsWith("export ")) l.stripPrefix("export ").trim else l
        line.indexOf('=') match {
          case i if i > 0 =>
            Some(line.take(i).trim -> unquote(line.drop(i + 1).trim))
          case _ => None
        }
      }
      .toMap

  def load(path: String): Map[String, String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines().toSeq)
    finally src.close()
  }

  /** Environment wins over the file — a deploy can override one key
    * without touching the checked-in config.
    */
  def resolve(key: String, file: Map[String, String],
              env: Map[String, String] = sys.env): Option[String] =
    env.get(key).orElse(file.get(key))

  private def unquote(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  /** Build the JDBC warehouse from config, mirroring the reference's
    * connection constants: either an explicit DB_URL, or the
    * postgres-shaped composition of DB_HOST/DB_PORT/DB_NAME
    * (ingest.py:9-13; the reference's port 6666 comes from its
    * docker-compose). DB_USER/DB_PASSWORD pass through as connection
    * properties when present.
    */
  def jdbcWarehouse(cfg: Map[String, String],
                    env: Map[String, String] = sys.env): JdbcWarehouse = {
    def get(k: String) = resolve(k, cfg, env)
    val url = get("DB_URL").getOrElse {
      val host = get("DB_HOST").getOrElse("localhost")
      val port = get("DB_PORT").getOrElse("5432")
      val name = get("DB_NAME").getOrElse(
        throw new IllegalArgumentException("config: DB_URL or DB_NAME required"))
      s"jdbc:postgresql://$host:$port/$name"
    }
    val driver = get("DB_DRIVER").getOrElse("org.postgresql.Driver")
    val props =
      get("DB_USER").map("user" -> _).toMap ++
        get("DB_PASSWORD").map("password" -> _).toMap
    new JdbcWarehouse(url, driver, props)
  }
}
