package graft.serve

/** Static OpenAPI 3.1 document for the serving surface.
  *
  * The reference gets `/openapi.json` + `/docs` for free from FastAPI
  * (`/root/reference/app/main.py:14-18`); a user exploring the reference API
  * hits `/docs` first. This mirrors that discovery surface: routes, query
  * parameters, defaults, and descriptions are transcribed from the route
  * declarations (`app/api/timeseries.py:17-49`, `app/api/aggregations.py:
  * 24-113`, `app/api/options.py:17-21`, `app/api/health.py:9-10`), and the
  * error statuses from the shared exception mapping (validation → 400,
  * request-parse → 422, lookup/aggregation → 502, options dependency → 503).
  *
  * The document is assembled once at class-load with the same [[Json]]
  * writer the endpoints use — no schema library, nothing computed per
  * request. Response bodies are described at the object level (the full
  * field-by-field model lives in [[Responses]] and is pinned by
  * HttpApiSpec); parameters are complete because that is what a client
  * needs to form a request.
  */
private[serve] object OpenApi {

  private def param(
      name: String, typ: String, required: Boolean, desc: String,
      default: Option[String] = None): String = {
    val schema = Json.obj(
      (Seq("type" -> Json.str(typ)) ++
        default.map(d => "default" -> d)): _*)
    Json.obj(
      "name" -> Json.str(name),
      "in" -> Json.str("query"),
      "required" -> Json.bool(required),
      "description" -> Json.str(desc),
      "schema" -> schema)
  }

  private def op(
      summary: String, params: Seq[String], errors: Seq[Int]): String = {
    val responses =
      Seq(200 -> "Successful Response") ++ errors.map {
        case 400 => 400 -> "Validation error (bad parameter combination)"
        case 422 => 422 -> "Request parse error (unparseable query parameter)"
        case 502 => 502 -> "Upstream lookup or aggregation error"
        case 503 => 503 -> "Options dependency unavailable"
        case c => c -> "Error"
      }
    Json.obj("get" -> Json.obj(
      "summary" -> Json.str(summary),
      "parameters" -> Json.arr(params),
      "responses" -> Json.obj(responses.map { case (code, desc) =>
        code.toString -> Json.obj(
          "description" -> Json.str(desc),
          "content" -> Json.obj("application/json" -> Json.obj(
            "schema" -> Json.obj("type" -> Json.str("object")))))
      }: _*)))
  }

  private val hydrophone =
    param("hydrophone", "string", required = true, "Hydrophone slug, e.g. bush_point.")
  private val start =
    param("start", "string", required = true, "Inclusive start datetime in ISO 8601.")
  private val end =
    param("end", "string", required = true, "Exclusive end datetime in ISO 8601.")
  private val deltaT =
    param("delta_t", "integer", required = false, "Seconds per sample.",
      default = Some("1"))
  private val validate =
    param("validate", "boolean", required = false,
      "Whether to validate the requested combination and time window first.",
      default = Some("true"))
  private val deltaF =
    param("delta_f", "string", required = true,
      "Archived PSD selector such as 3oct, 12oct, or 500hz.")
  private val intervalRequired =
    param("interval", "string", required = true,
      "Aggregation bucket: 10s, 1m, 5m, 15m, 1h, 1d, or auto.")
  private val startDate =
    param("start_date", "string", required = true, "Start date in YYYY-MM-DD.")
  private val numDays =
    param("num_days", "integer", required = true, "Number of days to include.")

  private val dataErrors = Seq(400, 422, 502, 503)

  /** The serialized document; stable for the life of the process. */
  val json: String = Json.obj(
    "openapi" -> Json.str("3.1.0"),
    "info" -> Json.obj(
      "title" -> Json.str("Graft Ambient Sound Analysis API"),
      "version" -> Json.str("0.1.0"),
      "description" -> Json.str(
        "Spark-native serving surface with route, parameter, and " +
        "response-shape parity to the reference Ambient Sound Analysis API.")),
    "paths" -> Json.obj(
      "/health" -> op("Service liveness.", Nil, Nil),
      "/options" -> op(
        "List archived coverage options, optionally for one hydrophone.",
        Seq(param("hydrophone", "string", required = false,
          "Optional hydrophone name, e.g. bush_point.")),
        Seq(400, 502, 503)),
      "/timeseries/broadband" -> op(
        "Raw broadband timeseries for a time window.",
        Seq(hydrophone, start, end, deltaT, validate), dataErrors),
      "/timeseries/psd" -> op(
        "Raw PSD timeseries (one row per timestamp, one column per band).",
        Seq(hydrophone, start, end, deltaT, deltaF, validate), dataErrors),
      "/aggregations/broadband" -> op(
        "Broadband series aggregated into time buckets for plotting.",
        Seq(hydrophone, start, end, intervalRequired, deltaT, validate),
        dataErrors),
      "/aggregations/psd" -> op(
        "Time-frequency heatmap matrix aggregated into time buckets.",
        Seq(hydrophone, start, end, intervalRequired, deltaF, deltaT, validate),
        dataErrors),
      "/aggregations/daily-summary" -> op(
        "Typical-day summary (mean/min/max/count per time-of-day bucket).",
        Seq(hydrophone, startDate, numDays,
          param("band_low", "integer", required = false,
            "Inclusive low band for averaging.", default = Some("63")),
          param("band_high", "integer", required = false,
            "Inclusive high band for averaging.", default = Some("8000")),
          param("interval", "string", required = false,
            "Aggregation bucket for the second-of-day summary: 10s, 1m, 5m, " +
            "15m, 1h, 1d, or auto.", default = Some(Json.str("auto")))),
        dataErrors),
      "/aggregations/daily-broadband-summary" -> op(
        "One true broadband average per day across the date window.",
        Seq(hydrophone, startDate, numDays), dataErrors)))

  /** Minimal self-contained docs page (the reference's `/docs` is Swagger UI
    * loaded from a CDN; this environment serves the same discovery role
    * without external assets). */
  val docsHtml: String = {
    val rows = Seq(
      "/health" -> "Service liveness.",
      "/options" -> "Archived coverage options per hydrophone.",
      "/timeseries/broadband" -> "Raw broadband timeseries.",
      "/timeseries/psd" -> "Raw PSD timeseries.",
      "/aggregations/broadband" -> "Bucketed broadband series.",
      "/aggregations/psd" -> "Time-frequency heatmap.",
      "/aggregations/daily-summary" -> "Typical-day summary.",
      "/aggregations/daily-broadband-summary" -> "Per-day broadband average.")
      .map { case (p, d) => s"<tr><td><code>GET $p</code></td><td>$d</td></tr>" }
      .mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><title>Graft Ambient Sound Analysis API</title></head>
       |<body>
       |<h1>Graft Ambient Sound Analysis API</h1>
       |<p>Machine-readable schema: <a href="/openapi.json">/openapi.json</a></p>
       |<table border="1" cellpadding="4">
       |<tr><th>Endpoint</th><th>Description</th></tr>
       |$rows
       |</table>
       |</body></html>
       |""".stripMargin
  }
}
