package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.annotation.tailrec

/**
 * Paginated HTTP API source — the reference's HTTPReader
 * (goetl `readers/http.go:256-790`): offset / page / cursor
 * pagination, bearer/basic/api-key auth, bounded retries with
 * exponential backoff, 429/5xx-aware.
 *
 * Architecture: the page WALK is driver-side (pagination is inherently
 * sequential — each page may determine the next), but page BODIES land
 * in a Dataset and all parsing/flattening runs distributed via
 * `spark.read.json`. For APIs with precomputable page addresses use
 * [[Http.parallelPages]], which fans page fetches out across the
 * cluster — one task per page.
 *
 * The transport is pluggable ([[Http.Fetcher]]) so pagination/retry
 * logic is unit-testable without a network (this environment has no
 * egress; [[Http.javaNetFetcher]] is the production default).
 */
object Http {

  final case class Response(status: Int, body: String,
                            headers: Map[String, String] = Map.empty)

  /** Transport abstraction; must be deterministic per URL for retries. */
  trait Fetcher extends Serializable {
    def fetch(url: String, headers: Map[String, String]): Response
  }

  /** Production transport on java.net.http (JDK built-in, no deps). */
  def javaNetFetcher(timeoutMs: Long = 30000): Fetcher = new Fetcher {
    def fetch(url: String, headers: Map[String, String]): Response = {
      val client = java.net.http.HttpClient.newHttpClient()
      var b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
      headers.foreach { case (k, v) => b = b.header(k, v) }
      val resp = client.send(b.GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      import scala.jdk.CollectionConverters._
      Response(resp.statusCode(), resp.body(),
        resp.headers().map().asScala.map { case (k, v) =>
          k -> v.asScala.mkString(",") }.toMap)
    }
  }

  /** Auth modes (reference `readers/http.go:558-587`). */
  sealed trait Auth { def headers: Map[String, String] }
  case object NoAuth extends Auth { def headers = Map.empty }
  final case class Bearer(token: String) extends Auth {
    def headers = Map("Authorization" -> s"Bearer $token")
  }
  final case class BasicAuth(user: String, password: String) extends Auth {
    def headers = Map("Authorization" -> ("Basic " + java.util.Base64.getEncoder
      .encodeToString(s"$user:$password".getBytes("UTF-8"))))
  }
  final case class ApiKey(header: String, key: String) extends Auth {
    def headers = Map(header -> key)
  }

  /** Pagination strategies (reference `readers/http.go:408-461`, `:724-790`). */
  sealed trait Pagination
  /** `?offset=N&limit=page` — stop on short/empty page. */
  final case class Offset(offsetParam: String = "offset",
                          limitParam: String = "limit",
                          pageSize: Int = 100) extends Pagination
  /** `?page=N` (1-based) — stop on empty page. */
  final case class Page(pageParam: String = "page") extends Pagination
  /** Opaque cursor extracted from the body by `nextCursor`. */
  final case class Cursor(cursorParam: String = "cursor",
                          nextCursor: String => Option[String]) extends Pagination

  final case class RetryConfig(maxAttempts: Int = 3, baseBackoffMs: Long = 1000,
                               sleeper: Long => Unit = Thread.sleep)

  /** Retry with exponential backoff on 429/5xx (reference
   *  `readers/http.go:464-501`). */
  @tailrec
  def fetchWithRetry(fetcher: Fetcher, url: String, headers: Map[String, String],
                     retry: RetryConfig, attempt: Int = 1): Response = {
    val r =
      try fetcher.fetch(url, headers)
      catch {
        case e: Exception if attempt < retry.maxAttempts => Response(-1, e.getMessage)
      }
    if ((r.status == 429 || r.status >= 500 || r.status < 0) && attempt < retry.maxAttempts) {
      retry.sleeper(retry.baseBackoffMs * (1L << (attempt - 1)))
      fetchWithRetry(fetcher, url, headers, retry, attempt + 1)
    } else r
  }

  private def addParam(url: String, k: String, v: String): String =
    url + (if (url.contains("?")) "&" else "?") + k + "=" + v

  /**
   * Walk all pages; returns raw page bodies. Driver-side by necessity
   * (each page can gate the next); bounded by `maxPages`.
   */
  def fetchPages(baseUrl: String, pagination: Pagination,
                 auth: Auth = NoAuth,
                 fetcher: Fetcher,
                 retry: RetryConfig = RetryConfig(),
                 maxPages: Int = 1000,
                 isEmpty: String => Boolean = b => b.trim.isEmpty || b.trim == "[]"): Seq[String] = {
    val out = Seq.newBuilder[String]
    var stop = false
    var page = 0
    var cursor: Option[String] = None
    while (!stop && page < maxPages) {
      val url = pagination match {
        case Offset(op, lp, size) =>
          addParam(addParam(baseUrl, op, (page * size).toString), lp, size.toString)
        case Page(pp) => addParam(baseUrl, pp, (page + 1).toString)
        case Cursor(cp, _) =>
          cursor.fold(baseUrl)(c => addParam(baseUrl, cp, c))
      }
      val resp = fetchWithRetry(fetcher, url, auth.headers, retry)
      if (resp.status != 200 || isEmpty(resp.body)) stop = true
      else {
        out += resp.body
        pagination match {
          case Cursor(_, next) =>
            cursor = next(resp.body)
            if (cursor.isEmpty) stop = true
          case _ => ()
        }
        page += 1
      }
    }
    out.result()
  }

  /** Paged fetch → DataFrame: bodies are JSONL (one record per line);
   *  parsing and flattening run distributed via `spark.read.json`. */
  def read(spark: SparkSession, baseUrl: String, pagination: Pagination,
           auth: Auth = NoAuth,
           fetcher: Fetcher,
           retry: RetryConfig = RetryConfig(),
           maxPages: Int = 1000): DataFrame = {
    import spark.implicits._
    val bodies = fetchPages(baseUrl, pagination, auth, fetcher, retry, maxPages)
    // One dataset element per JSON record: spark.read.json treats each
    // element as a single document.
    spark.read.json(spark.createDataset(bodies.flatMap(_.split("\n"))))
  }

  /**
   * Parallel variant for precomputable page addresses (offset/page
   * pagination with a known total): page fetches fan out across the
   * cluster, one task per page — the scale path for bulk API pulls.
   */
  def parallelPages(spark: SparkSession, urls: Seq[String],
                    auth: Auth = NoAuth,
                    fetcher: Fetcher,
                    retry: RetryConfig = RetryConfig()): DataFrame = {
    import spark.implicits._
    val headers = auth.headers
    val bodies = spark.createDataset(urls)
      .mapPartitions(_.flatMap(u =>
        fetchWithRetry(fetcher, u, headers, retry).body.split("\n")))
    spark.read.json(bodies)
  }
}
