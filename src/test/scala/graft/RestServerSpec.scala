package graft

import graft.api.RestServer
import graft.rag.RagConfig
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** Drives the REST façade over a real socket: index → list → stats → query →
  * retrieve → delete (the reference's api/app.py surface). */
class RestServerSpec extends SparkSpec {

  private lazy val server = {
    val s = new RestServer(spark, Files.createTempDirectory("reststore").toString,
      RagConfig(entitySimilarityThreshold = 0.5, finalTopK = 3))
    s.start(); s
  }
  private lazy val base = s"http://127.0.0.1:${server.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def delete(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())

  test("full REST lifecycle: documents -> stats -> query -> delete") {
    val docs =
      """[
        |{"id": "einstein", "text": "Albert Einstein\nEinstein published relativity in 1905.",
        | "triplets": [["Albert Einstein", "published", "theory of relativity"]]},
        |{"id": "curie", "text": "Marie Curie\nCurie discovered radium.",
        | "triplets": [["Marie Curie", "discovered", "radium"]]}
        |]""".stripMargin
    val ins = post("/graphs/resttest/documents", docs)
    assert(ins.statusCode() == 200, ins.body())
    assert(ins.body().contains("\"passages\":2"))

    assert(get("/graphs").body().contains("resttest"))
    val stats = get("/graphs/resttest/stats")
    assert(stats.body().contains("\"entities\":4"), stats.body())

    val q = post("/graphs/resttest/query",
      """{"question": "Who discovered radium?"}""")
    assert(q.statusCode() == 200, q.body())
    assert(q.body().contains("\"answer\""))
    assert(q.body().contains("curie"), q.body())

    val r = post("/graphs/resttest/retrieve",
      """{"question": "Who published relativity?"}""")
    assert(r.statusCode() == 200)
    assert(r.body().contains("einstein"), r.body())
    assert(r.body().contains("\"expansion_history\""))

    assert(delete("/graphs/resttest").statusCode() == 200)
    assert(!get("/graphs").body().contains("resttest"))
  }

  test("unknown route gives a JSON 404; malformed body gives JSON 500") {
    assert(get("/nope").statusCode() == 404)
    val bad = post("/graphs/g/query", "{not json")
    assert(bad.statusCode() == 500)
    assert(bad.body().contains("error"))
  }
}
