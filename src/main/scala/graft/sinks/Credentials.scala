package graft.sinks

/** Pluggable connection-credential sourcing for the JDBC sink (SURVEY
  * §2.1 S12): the reference never bakes DB credentials into config — it
  * fetches them from a parameter store at startup, validates the full
  * set, and fails the run with the missing names when any is absent
  * (`Lambda/lambda_function.py:44-62`, `Utils/S3.py:219-242`). The
  * production shape is a provider INTERFACE: the sink asks for
  * credentials by logical name, and the deployment decides where they
  * come from (a secrets service, environment, a mounted file). This
  * module is that seam — deliberately free of any vendor SDK: a secrets
  * service is just a `String => Option[String]` at this boundary.
  */
object Credentials {

  /** One secret backend. Implementations must return None (not throw)
    * for an absent key — absence handling is [[dbCreds]]' job, which
    * reports EVERY missing name at once like the reference's
    * validation, not just the first. */
  trait SecretSource {
    def get(key: String): Option[String]
  }

  /** Environment-variable source (`os.environ` fallbacks in the
    * reference's config loading). */
  final class EnvSource(env: Map[String, String] = sys.env) extends SecretSource {
    def get(key: String): Option[String] = env.get(key)
  }

  /** Fixed in-memory source — test fixtures and programmatic config. */
  final class MapSource(m: Map[String, String]) extends SecretSource {
    def get(key: String): Option[String] = m.get(key)
  }

  /** Java-properties-file source (the mounted-secrets-file deployment
    * shape). The file is re-read per lookup; wrap in [[CachedSource]]
    * for the once-per-process behavior. */
  final class PropertiesFileSource(path: String) extends SecretSource {
    def get(key: String): Option[String] = {
      val f = new java.io.File(path)
      if (!f.exists()) None
      else {
        val p = new java.util.Properties()
        val in = new java.io.FileInputStream(f)
        try p.load(in) finally in.close()
        Option(p.getProperty(key))
      }
    }
  }

  /** Process-lifetime memoization — the reference resolves SSM
    * parameters once per Lambda container, outside the handler, so a
    * thousand batches don't mean a thousand secret-store round trips.
    * Absent keys are NOT cached (a secret created after startup is
    * found on the next ask, matching the retry-the-run recovery). */
  final class CachedSource(underlying: SecretSource) extends SecretSource {
    private val cache = new scala.collection.concurrent.TrieMap[String, String]()
    def get(key: String): Option[String] =
      cache.get(key).orElse {
        val v = underlying.get(key)
        v.foreach(cache.put(key, _))
        v
      }
  }

  /** Resolved connection credentials, ready for the sink: `url` plus
    * the driver properties Spark's JDBC source and [[JdbcSink.connect]]
    * both accept. `toString` masks the password like the reference's
    * logging (`lambda_function.py:53`). */
  final case class DbCreds(url: String, user: Option[String] = None,
      password: Option[String] = None) {
    def properties: java.util.Properties = {
      val p = new java.util.Properties()
      user.foreach(p.setProperty("user", _))
      password.foreach(p.setProperty("password", _))
      p
    }
    override def toString: String =
      s"DbCreds($url, user=${user.getOrElse("-")}, " +
        s"password=${password.map(p => "*" * p.length).getOrElse("-")})"
  }

  /** Assemble [[DbCreds]] from a source, reporting ALL missing keys at
    * once (the reference collects `missing` before raising,
    * `lambda_function.py:56-62`). `userKey`/`passwordKey` are optional
    * by design — embedded engines (Derby here) authenticate by path. */
  def dbCreds(src: SecretSource, urlKey: String,
      userKey: Option[String] = None, passwordKey: Option[String] = None): DbCreds = {
    val wanted = Seq(urlKey) ++ userKey ++ passwordKey
    val missing = wanted.filter(src.get(_).isEmpty)
    require(missing.isEmpty,
      s"missing required credential parameters: ${missing.mkString(", ")}")
    DbCreds(src.get(urlKey).get, userKey.flatMap(src.get), passwordKey.flatMap(src.get))
  }
}
