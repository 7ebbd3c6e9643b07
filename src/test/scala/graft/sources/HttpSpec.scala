package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HttpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Serves 3 pages of JSONL then empties; records every URL. */
  private class FakeApi extends Http.Fetcher {
    val urls = collection.mutable.Buffer.empty[String]
    def fetch(url: String, headers: Map[String, String]): Http.Response = {
      urls += url
      val offset = "offset=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toInt).getOrElse(0)
      if (offset >= 6) Http.Response(200, "")
      else Http.Response(200,
        (offset until offset + 2).map(i => s"""{"id":$i,"v":"row$i"}""").mkString("\n"))
    }
  }

  test("offset pagination walks pages until empty and parses distributed") {
    val api = new FakeApi
    val df = Http.read(spark, "http://api/items",
      Http.Offset(pageSize = 2), fetcher = api, maxPages = 10)
    assert(df.count() == 6)
    assert(api.urls.head == "http://api/items?offset=0&limit=2")
    assert(api.urls.size == 4) // 3 full pages + 1 empty
  }

  test("cursor pagination follows body-provided cursors") {
    val fetcher = new Http.Fetcher {
      def fetch(url: String, headers: Map[String, String]): Http.Response =
        if (!url.contains("cursor=")) Http.Response(200, """{"id":1}""")
        else if (url.contains("cursor=c1")) Http.Response(200, """{"id":2}""")
        else Http.Response(200, "")
    }
    val bodies = Http.fetchPages("http://api/x",
      Http.Cursor(nextCursor = b => if (b.contains("\"id\":1")) Some("c1") else None),
      fetcher = fetcher)
    assert(bodies.size == 2)
  }

  test("retry backs off on 429/5xx and succeeds within budget") {
    var calls = 0
    val sleeps = collection.mutable.Buffer.empty[Long]
    val flaky = new Http.Fetcher {
      def fetch(url: String, headers: Map[String, String]): Http.Response = {
        calls += 1
        if (calls < 3) Http.Response(429, "slow down") else Http.Response(200, "ok")
      }
    }
    val r = Http.fetchWithRetry(flaky, "http://api", Map.empty,
      Http.RetryConfig(maxAttempts = 5, baseBackoffMs = 10,
        sleeper = ms => sleeps += ms))
    assert(r.status == 200 && calls == 3)
    assert(sleeps.toSeq == Seq(10L, 20L)) // exponential
  }

  test("auth modes produce expected headers") {
    assert(Http.Bearer("tok").headers == Map("Authorization" -> "Bearer tok"))
    assert(Http.BasicAuth("u", "p").headers("Authorization").startsWith("Basic "))
    assert(Http.ApiKey("X-Key", "k").headers == Map("X-Key" -> "k"))
  }

  test("parallelPages fans fetches out as a distributed job") {
    val fetcher = new Http.Fetcher {
      def fetch(url: String, headers: Map[String, String]): Http.Response =
        Http.Response(200, s"""{"page":"${url.takeRight(1)}"}""")
    }
    val df = Http.parallelPages(spark,
      (1 to 4).map(i => s"http://api/p$i"), fetcher = fetcher)
    assert(df.count() == 4)
  }
}
