package graft.sources

import java.io.{FileInputStream, InputStream}
import java.net.http.{HttpClient, HttpResponse}
import java.security.KeyStore
import java.time.Duration
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLParameters, TrustManagerFactory}

/** Wire-level configuration for the live clients ([[EsHttpClient]],
  * [[ClickHouseHttpClient]]), threaded from the DSv2 source options down
  * to every executor-side connection:
  *
  *   - `tlsTruststore` / `tlsTruststorePassword`: a PKCS12 (or `.jks`)
  *     trust store holding the CA/server certificates the client accepts —
  *     the private-CA deployment posture a managed ES/CH cluster ships
  *     with. Absent ⇒ the JVM's default trust (public CAs).
  *   - `tlsKeystore` / `tlsKeystorePassword`: the client's OWN key pair
  *     for mutual TLS — presented when the server requests a certificate.
  *   - `compression=gzip`: CH insert bodies ship `Content-Encoding: gzip`
  *     and CH queries ask for compressed responses
  *     (`enable_http_compression=1`) — at 100 TB the insert/scan fan-out's
  *     wire bytes are the cluster's egress bill, and CSV/TSV compresses
  *     5-10×. Responses are ALWAYS sniffed for `Content-Encoding: gzip`
  *     regardless (decode support costs nothing; a server that compresses
  *     unasked still decodes correctly).
  *
  * The paths are EXECUTOR-LOCAL files (ship them with `--files`, the
  * standard certificate distribution for a Spark cluster); the spec is a
  * small serializable value riding the scan/write plumbing, never the
  * keys themselves.
  */
private[graft] final case class LiveWire(
    truststore: Option[String] = None,
    truststorePassword: Option[String] = None,
    keystore: Option[String] = None,
    keystorePassword: Option[String] = None,
    gzip: Boolean = false,
    username: Option[String] = None,
    password: Option[String] = None,
    /** Point-in-time keep-alive (`pitKeepAlive` option, ES time-unit
      * grammar, default 1m): every PIT request refreshes it, so it only
      * needs to outlast the LONGEST GAP between one task's page
      * requests — but a production scan whose downstream can stall
      * (backpressure, GC) raises it: a PIT expiring mid-scan surfaces as
      * a search_context_missing task failure whose retries reuse the
      * same dead snapshot id. Validated against the ES duration grammar
      * at parse so a typo cannot 400 every drain at runtime.
      */
    pitKeepAlive: String = "1m") {
  def tlsConfigured: Boolean = truststore.isDefined || keystore.isDefined
  /** The SSLContext cache key: TLS material only (gzip/auth orthogonal). */
  private[sources] def tlsKey: LiveWire =
    copy(gzip = false, username = None, password = None, pitKeepAlive = "1m")

  /** The `Authorization: Basic` header value when credentials are set —
    * the reference authenticates BOTH clients this way (elastic.go:29-30
    * [ext] Username/Password; clickhouse.go:40-43 [ext] Auth{Username,
    * Password}); ES and CH's HTTP interfaces both accept basic auth.
    */
  def basicAuth: Option[String] = username.map { u =>
    val raw = s"$u:${password.getOrElse("")}"
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      raw.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  // secrets must never reach logs through a serialized factory/partition
  // toString (Spark prints plan nodes and task descriptions freely)
  override def toString: String =
    s"LiveWire(truststore=$truststore, keystore=$keystore, gzip=$gzip, " +
      s"username=$username, passwords=<redacted>)"
}

private[graft] object LiveWire {
  val default: LiveWire = LiveWire()

  /** Parse the wire options off a DSv2 option map (both live sources). */
  def fromOptions(get: String => Option[String]): LiveWire = LiveWire(
    truststore = get("tlsTruststore"),
    truststorePassword = get("tlsTruststorePassword"),
    keystore = get("tlsKeystore"),
    keystorePassword = get("tlsKeystorePassword"),
    gzip = get("compression").map(_.trim.toLowerCase) match {
      case Some("gzip")        => true
      case None | Some("none") => false
      case Some(other) =>
        throw new IllegalArgumentException(
          s"unsupported compression '$other' (supported: gzip, none)")
    },
    username = get("username"),
    password = get("password"),
    pitKeepAlive = get("pitKeepAlive").map { v =>
      val t = v.trim
      require(t.matches("\\d+(d|h|m|s|ms|micros|nanos)"),
        s"pitKeepAlive must be an ES duration like 1m/5m/90s, got: $v")
      t
    }.getOrElse("1m"))
}

/** Shared JDK-HttpClient factory for the live wire clients
  * ([[EsHttpClient]], [[ClickHouseHttpClient]]): one place that applies
  * the TLS floor the reference's ClickHouse connection enforces
  * (clickhouse.go:41-47 [ext] — `tls.Config{MinVersion: TLS1.2}`) and the
  * [[LiveWire]] trust/identity material. `https` endpoints negotiate TLS
  * 1.3 or 1.2 and nothing older; plain `http` URLs (the loopback stubs)
  * are untouched — SSL parameters only apply when a connection actually
  * upgrades to TLS.
  */
private[graft] object LiveHttp {

  /** Protocols the clients will accept on an https endpoint — the
    * reference's `MinVersion: tls.VersionTLS12` as an explicit allowlist
    * (an allowlist can't silently regress when the JVM's defaults change).
    */
  val TlsProtocols: Array[String] = Array("TLSv1.3", "TLSv1.2")

  // One SSLContext per distinct TLS material per JVM (executors construct
  // a client per task; the handshake context — keystore parse, trust
  // chain — must not be rebuilt per page loop).
  private val contexts = new java.util.concurrent.ConcurrentHashMap[LiveWire, SSLContext]()

  private def loadStore(path: String, password: Option[String]): KeyStore = {
    // keytool has defaulted to PKCS12 since JDK 9; legacy .jks by extension
    val ks = KeyStore.getInstance(if (path.toLowerCase.endsWith(".jks")) "JKS" else "PKCS12")
    val in = new FileInputStream(path)
    try ks.load(in, password.map(_.toCharArray).orNull) finally in.close()
    ks
  }

  private def buildContext(w: LiveWire): SSLContext = {
    val trustManagers = w.truststore.map { path =>
      val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(loadStore(path, w.truststorePassword))
      tmf.getTrustManagers
    }.orNull
    val keyManagers = w.keystore.map { path =>
      val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
      val pass = w.keystorePassword.map(_.toCharArray).getOrElse(Array.emptyCharArray)
      kmf.init(loadStore(path, w.keystorePassword), pass)
      kmf.getKeyManagers
    }.orNull
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(keyManagers, trustManagers, null)
    ctx
  }

  // One JDK HttpClient per (timeout, wire) per JVM: the client owns the
  // connection pool, so sharing it across an executor's tasks reuses
  // kept-alive sockets and TLS sessions — per-task construction would pay
  // a fresh handshake for every page loop (at mTLS cost), and the JDK
  // client has no close() on 17 anyway, so per-task instances just pile
  // up pools until GC. HttpClient is documented thread-safe; the auth
  // header is per-request, not per-client, so credential isolation holds.
  private val clients = new java.util.concurrent.ConcurrentHashMap[(Long, LiveWire), HttpClient]()

  def newClient(timeoutMs: Long, wire: LiveWire = LiveWire.default): HttpClient =
    clients.computeIfAbsent((timeoutMs, wire.tlsKey), { case (t, w) =>
      val params = new SSLParameters()
      params.setProtocols(TlsProtocols)
      val builder = HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(t))
        .sslParameters(params)
      if (w.tlsConfigured)
        builder.sslContext(contexts.computeIfAbsent(w.tlsKey, buildContext(_)))
      builder.build()
    })

  /** Did the server gzip this response? (JDK HttpClient never negotiates
    * or decodes content codings itself — the caller owns both sides.)
    */
  def isGzipResponse(res: HttpResponse[_]): Boolean =
    res.headers().firstValue("Content-Encoding").map[Boolean](_.equalsIgnoreCase("gzip"))
      .orElse(false)

  /** Decode one fully-buffered response body, gunzipping when the server
    * said so — for the bounded bodies (search pages, aggregate rows,
    * error messages). Unbounded row streams wrap the raw InputStream
    * instead ([[ClickHouseHttpClient.queryStream]]).
    */
  def bodyString(res: HttpResponse[Array[Byte]]): String = {
    val bytes =
      if (isGzipResponse(res)) gunzip(res.body())
      else res.body()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  def gzipBytes(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(math.max(64, bytes.length / 4))
    val out = new GZIPOutputStream(bos, 1 << 13)
    out.write(bytes); out.close()
    bos.toByteArray
  }

  /** Wrap a response stream for line consumption, gunzipping on the fly
    * when the server compressed it — stays INCREMENTAL either way (a
    * GZIPInputStream inflates as bytes arrive; it never buffers the
    * response).
    */
  def lineStream(res: HttpResponse[InputStream]): java.io.BufferedReader = {
    val raw = if (isGzipResponse(res)) new GZIPInputStream(res.body(), 1 << 13) else res.body()
    new java.io.BufferedReader(
      new java.io.InputStreamReader(raw, java.nio.charset.StandardCharsets.UTF_8))
  }
}
