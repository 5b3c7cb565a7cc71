package graft.sources

import graft.ops.Normalize
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** REST API dimension ingestion (SURVEY.md §2.1 S5).
  *
  * The reference's HRM operator does an OAuth2 password-grant token POST,
  * then GETs a JSON payload, takes its `DATA` array, renames src→des
  * columns, and loads it (hrm_to_ods.py:56-67,108-157). API dims are small
  * by construction (they fit one HTTP response), so the fetch is
  * driver-side; Spark's JSON reader infers the schema and everything
  * downstream is an ordinary DataFrame. At scale the same call sites stay
  * valid — only big sources need distributed extraction.
  */
object Api {

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30)).build()

  def get(url: String, headers: Map[String, String] = Map.empty): String = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
      .timeout(Duration.ofSeconds(60)) // read timeout: a stalled server must not wedge the run
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    require(resp.statusCode() / 100 == 2, s"GET $url -> HTTP ${resp.statusCode()}")
    resp.body()
  }

  def postForm(url: String, form: Map[String, String],
               headers: Map[String, String] = Map.empty): String = {
    val body = form.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(60))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    require(resp.statusCode() / 100 == 2, s"POST $url -> HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** OAuth2 password grant: POST the token endpoint, pull `access_token`
    * out of the JSON response (hrm_to_ods.py:56-67). */
  def oauthToken(tokenUrl: String, username: String, password: String,
                 extra: Map[String, String] = Map.empty): String = {
    val json = postForm(tokenUrl,
      Map("grant_type" -> "password", "username" -> username, "password" -> password) ++ extra)
    val m = """"access_token"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json)
    m.map(_.group(1)).getOrElse(
      throw new IllegalStateException(s"no access_token in token response from $tokenUrl"))
  }

  /** S5 — authenticated JSON dimension fetch: GET with bearer token, take
    * the `dataField` array, infer schema, apply src→des renames. */
  def jsonDim(spark: SparkSession, url: String, token: Option[String] = None,
              dataField: String = "DATA",
              renameMap: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val headers = token.map(t => Map("Authorization" -> s"Bearer $t")).getOrElse(Map.empty)
    val body = get(url, headers)
    val wrapped: Dataset[String] = Seq(body).toDS()
    val full = spark.read.json(wrapped)
    val data =
      if (full.columns.contains(dataField))
        full.select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col(dataField)).as("r")).select("r.*")
      else full
    Normalize.rename(data, renameMap)
  }
}
