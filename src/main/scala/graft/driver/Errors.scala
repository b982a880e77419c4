package graft.driver

/** Typed failure classification for the per-file ETL path (SURVEY §3.2 —
  * `Lambda/lambda_function.py:397-446` + `Utils/sql.py:81-105`): the
  * reference maps every per-file failure to a typed response —
  * `s3_error` 404 (missing object, don't retry), `mysql_error` 500
  * (sink, might retry), `data_structure_error` 400 (missing key, don't
  * retry), `unexpected_error` 500 — and the batch loop continues past
  * the bad file. The Spark analogs, classified by walking the cause
  * chain of whatever the action surfaced:
  *
  * | reference            | engine trigger                                  | type · code · retry |
  * |----------------------|--------------------------------------------------|---------------------|
  * | NoSuchBucket/Key     | missing path (`PATH_NOT_FOUND`, FileNotFound)    | source_error · 404 · no |
  * | mysql.connector.Error| `java.sql.SQLException` from the sink            | sink_error · 500 · yes |
  * | KeyError             | malformed record (FAILFAST), unresolved column   | data_structure_error · 400 · no |
  * | Exception            | anything else                                    | unexpected_error · 500 · no |
  */
object Errors {

  /** One classified failure — the `format_error_response` analog. */
  final case class Classified(
      errorType: String, statusCode: Int, retryable: Boolean, message: String)

  /** Outcome of one file in a batch run ([[Pipeline.processFiles]]):
    * either landed `rows`, or a classified error. The reference's
    * file_key/bucket context is the `file` field. */
  final case class FileOutcome(
      file: String, ok: Boolean, rows: Long,
      errorType: Option[String], statusCode: Int, retryable: Boolean,
      message: Option[String])

  private def chain(e: Throwable): List[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16).toList

  def classify(e: Throwable): Classified = {
    val cs = chain(e)
    def msg = Option(e.getMessage).getOrElse(e.getClass.getName)
    def anyMsg(token: String) =
      cs.exists(c => Option(c.getMessage).exists(_.contains(token)))
    if (cs.exists(_.isInstanceOf[java.io.FileNotFoundException]) ||
        anyMsg("PATH_NOT_FOUND"))
      Classified("source_error", 404, retryable = false, msg)
    else if (cs.exists(_.isInstanceOf[java.sql.SQLException]))
      Classified("sink_error", 500, retryable = true, msg)
    else if (anyMsg("MALFORMED_RECORD") || anyMsg("FAILED_READ_FILE") ||
        anyMsg("UNRESOLVED_COLUMN") || anyMsg("FIELD_NOT_FOUND") ||
        cs.exists(_.isInstanceOf[com.fasterxml.jackson.core.JsonProcessingException]))
      Classified("data_structure_error", 400, retryable = false, msg)
    else Classified("unexpected_error", 500, retryable = false, msg)
  }
}
