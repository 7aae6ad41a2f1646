package graft.sources

import java.net.http.HttpClient
import java.time.Duration

import javax.net.ssl.SSLParameters

/** Shared JDK-HttpClient factory for the live wire clients
  * ([[EsHttpClient]], [[ClickHouseHttpClient]]): one place that applies
  * the TLS floor the reference's ClickHouse connection enforces
  * (clickhouse.go:41-47 [ext] — `tls.Config{MinVersion: TLS1.2}`).
  * `https` endpoints negotiate TLS 1.3 or 1.2 and nothing older; plain
  * `http` URLs (the loopback stubs) are untouched — SSL parameters only
  * apply when a connection actually upgrades to TLS.
  */
private[graft] object LiveHttp {

  /** Protocols the clients will accept on an https endpoint — the
    * reference's `MinVersion: tls.VersionTLS12` as an explicit allowlist
    * (an allowlist can't silently regress when the JVM's defaults change).
    */
  val TlsProtocols: Array[String] = Array("TLSv1.3", "TLSv1.2")

  def newClient(timeoutMs: Long): HttpClient = {
    val params = new SSLParameters()
    params.setProtocols(TlsProtocols)
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .sslParameters(params)
      .build()
  }
}
