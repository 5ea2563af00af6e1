package graft.sources

/** A fetched media file: raw bytes + the filename downstream kind-dispatch
  * branches on (`UrlMeta.kindOf`). */
final case class FetchedFile(content: Array[Byte], filename: String)

/** Mid-stream size-cap violation — the reference's 413 (`main.py:290-294`):
  * raised as soon as the RUNNING byte count passes the cap, before the
  * body finishes downloading. */
final class FetchTooLargeException(val size: Long, val max: Long)
  extends RuntimeException(
    s"File too large. Maximum size is ${max / 1024 / 1024}MB (got > $size bytes)")

/** Transport/status failure — the reference's 400 wrap of
  * `requests.exceptions.RequestException` (`main.py:299-300`). */
final class FetchFailedException(msg: String, cause: Throwable)
  extends RuntimeException(s"Failed to download file from URL: $msg", cause)

/** The NETWORK half of the reference's `download_file_from_url`
  * (`main.py:256-303`) — previously only the pure filename-inference rules
  * were implemented (`UrlMeta`); this is the fetch itself, with the same
  * observable semantics:
  *
  *  - 30 s timeout (connect AND read — `requests.get(timeout=30)`),
  *  - streaming 8192-byte chunks (`iter_content(chunk_size=8192)`),
  *  - the 10 MB cap enforced MID-STREAM on the running size — an
  *    over-size body aborts after ~10 MB on the wire, it is never
  *    buffered to completion (`main.py:288-294`),
  *  - non-2xx → failure (`raise_for_status`), transport errors wrapped
  *    (`main.py:299-300`),
  *  - filename: content-disposition → URL basename → content-type guess
  *    (delegated to `UrlMeta.inferFilename`, the shared rules).
  *
  * Exercised end-to-end against a loopback HTTP server in `UrlFetchSpec`
  * (the sandbox has no egress, but the code path is the prod path). At
  * 10^12 docs the bulk-fetch tier calls this per `media_ref` inside
  * `mapPartitions` — connection reuse/async fan-out layer on top, the
  * cap/timeout/naming semantics stay exactly these. */
object UrlFetch {

  def fetch(url: String, maxBytes: Long = UrlMeta.MaxFileSize,
      timeoutMs: Int = 30000): FetchedFile =
    fetchFollowing(url, nameUrl = url, maxBytes, timeoutMs, redirectsLeft = 5)

  private def open(url: String, timeoutMs: Int): java.net.HttpURLConnection = {
    // malformed / non-http URLs surface as the SAME declared failure type
    // as transport errors (requests raises RequestException for both and
    // the reference wraps them identically, main.py:299-300)
    val conn =
      try java.net.URI.create(url).toURL.openConnection()
      catch { case e @ (_: IllegalArgumentException | _: java.net.MalformedURLException) =>
        throw new FetchFailedException(s"invalid URL '$url': ${e.getMessage}", e)
      }
    conn match {
      case h: java.net.HttpURLConnection =>
        h.setConnectTimeout(timeoutMs)
        h.setReadTimeout(timeoutMs)
        // same-protocol redirects handled by the JDK; cross-protocol
        // (http→https — the most common redirect on the web) handled in
        // fetchFollowing because HttpURLConnection never follows those
        h.setInstanceFollowRedirects(true)
        h
      case other =>
        throw new FetchFailedException(
          s"unsupported URL scheme for '$url' (${other.getClass.getSimpleName})", null)
    }
  }

  // nameUrl = the caller's ORIGINAL url: the reference infers the filename
  // from its `url` argument even after redirects (main.py:271-283)
  private def fetchFollowing(url: String, nameUrl: String, maxBytes: Long,
      timeoutMs: Int, redirectsLeft: Int): FetchedFile = {
    val conn = open(url, timeoutMs)
    try {
      val code =
        try conn.getResponseCode
        catch { case e: java.io.IOException => throw new FetchFailedException(e.getMessage, e) }
      if (code >= 300 && code < 400 && conn.getHeaderField("Location") != null) {
        // requests.get follows redirects transparently, including
        // http→https; replicate with a bounded manual hop
        if (redirectsLeft <= 0)
          throw new FetchFailedException(s"too many redirects for $url", null)
        val loc = java.net.URI.create(url)
          .resolve(conn.getHeaderField("Location")).toString
        return fetchFollowing(loc, nameUrl, maxBytes, timeoutMs, redirectsLeft - 1)
      }
      if (code < 200 || code >= 300)
        throw new FetchFailedException(s"HTTP $code for $url", null)
      val filename = UrlMeta.inferFilename(
        Option(conn.getHeaderField("Content-Disposition")), nameUrl,
        Option(conn.getContentType))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192) // main.py:288 chunk_size
      var size = 0L
      try {
        val in = conn.getInputStream
        try {
          var n = in.read(buf)
          while (n >= 0) {
            size += n
            // cap checked on the RUNNING size, before the next read — the
            // reference aborts a too-large body mid-stream, not at the end
            if (size > maxBytes) throw new FetchTooLargeException(size, maxBytes)
            out.write(buf, 0, n)
            n = in.read(buf)
          }
        } finally in.close()
      } catch {
        case e: java.io.IOException => throw new FetchFailedException(e.getMessage, e)
      }
      FetchedFile(out.toByteArray, filename)
    } finally conn.disconnect()
  }
}
