package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkSpec
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** S5 — OAuth2 token + JSON dimension fetch against a local HTTP stub. */
class ApiSpec extends SparkSpec {

  private def handler(status: Int, body: String, check: HttpExchange => Boolean = _ => true): HttpHandler =
    (ex: HttpExchange) => {
      val (code, resp) = if (check(ex)) (status, body) else (401, """{"error":"unauthorized"}""")
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/token", handler(200, """{"access_token":"tok-123","token_type":"bearer"}"""))
    s.createContext("/employees", handler(200,
      """{"STATUS":"OK","DATA":[
        |{"EmployeeCode":"E1","FullName":"An","unit":"U1"},
        |{"EmployeeCode":"E2","FullName":"Binh","unit":"U2"}]}""".stripMargin,
      ex => Option(ex.getRequestHeaders.getFirst("Authorization")).contains("Bearer tok-123")))
    s.start()
    s
  }
  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"

  test("oauthToken extracts access_token from password grant") {
    assert(Api.oauthToken(s"$base/token", "u", "p") == "tok-123")
  }

  test("jsonDim: bearer auth, DATA array extraction, src→des renames") {
    val tok = Api.oauthToken(s"$base/token", "u", "p")
    val df = Api.jsonDim(spark, s"$base/employees", Some(tok),
      renameMap = Map("EmployeeCode" -> "employee_code", "FullName" -> "full_name"))
    assert(df.columns.sorted.toSeq == Seq("employee_code", "full_name", "unit"))
    assert(canon(df.select("employee_code", "full_name")) ==
      Seq(Seq("E1", "An"), Seq("E2", "Binh")))
  }

  test("jsonDim without token against auth-checking endpoint fails loudly") {
    val e = intercept[IllegalArgumentException] { Api.jsonDim(spark, s"$base/employees") }
    assert(e.getMessage.contains("401"))
  }
}
