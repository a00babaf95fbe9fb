package graft.server

import graft.NerfModel
import graft.core.Forest
import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** TCP NER server/client (T1/T2,
  * /root/reference/src/NLP/Nerf/Server.hs:31-63): the model is loaded
  * ONCE into the server process; each connection carries one
  * length-prefixed request (raw text, possibly multi-line) and receives
  * one length-prefixed response (the ENAMEX-annotated lines). The
  * reference frames messages the same way (length int + payload,
  * Server.hs:69-88); payloads here are UTF-8 text rather than Haskell
  * Binary, since the annotated-forest wire format is engine-specific.
  *
  * Connections are handled on daemon threads (the reference forks a
  * green thread per connection, Server.hs:40-48). For high-throughput
  * batch work use the Spark pipeline; this server is the interactive,
  * model-resident mode.
  */
object NerfServer {

  /** Write one length-prefixed UTF-8 frame. */
  def sendMsg(out: DataOutputStream, msg: String): Unit = {
    val bytes = msg.getBytes(UTF_8)
    out.writeInt(bytes.length)
    out.write(bytes)
    out.flush()
  }

  /** Requests are bounded by this (desync/abuse guard); responses get
    * 8× headroom — annotation inflates the payload (tags per mention),
    * and a reply the server legally produced must not be rejected by
    * the client's own reader.
    */
  val MaxRequestBytes: Int = 64 * 1024 * 1024
  val MaxResponseBytes: Int = 8 * MaxRequestBytes

  /** Read one length-prefixed UTF-8 frame. */
  def recvMsg(in: DataInputStream,
              maxBytes: Int = MaxRequestBytes): String = {
    val n = in.readInt()
    require(n >= 0 && n <= maxBytes, s"frame too large: $n (max $maxBytes)")
    val buf = new Array[Byte](n)
    in.readFully(buf)
    new String(buf, UTF_8)
  }

  /** Annotate a (possibly multi-line) request: one ENAMEX-rendered
    * sentence per input line. limit = -1 keeps trailing empty lines, so
    * the reply always has exactly as many lines as the request — a
    * line-aligned consumer must never lose rows.
    */
  def annotate(model: NerfModel, text: String): String =
    text.split("\n", -1).iterator
      .map(line => Forest.renderEnamex(model.ner(line)))
      .mkString("\n")

  /** Bind and start serving on a daemon accept thread; returns the bound
    * socket so callers (tests, mains) control lifetime and can read the
    * ephemeral port. One request per connection, mirroring the
    * reference. Any failure of the accept loop itself (not just a
    * normal close) tears the socket down — a bound-but-dead server
    * would leave clients blocking in the backlog forever.
    */
  def serve(model: NerfModel, port: Int): ServerSocket = {
    val server = new ServerSocket(port)
    val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          try {
            val worker = new Thread(() => handle(model, sock))
            worker.setDaemon(true)
            worker.start()
          } catch { case t: Throwable => sock.close(); throw t }
        }
      } catch {
        case _: java.net.SocketException => () // normal close
      } finally {
        if (!server.isClosed) server.close()
      }
    }, "nerf-server-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server
  }

  private def handle(model: NerfModel, sock: Socket): Unit =
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val req = recvMsg(in)
      sendMsg(out, annotate(model, req))
    } catch {
      case e: Exception => System.err.println(s"[server] request failed: $e")
    } finally sock.close()

  /** Client side of one request (T2,
    * /root/reference/src/NLP/Nerf/Server.hs:55-63): connect, send, read
    * the annotated reply.
    */
  def request(host: String, port: Int, text: String): String = {
    val sock = new Socket(InetAddress.getByName(host), port)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      sendMsg(out, text)
      recvMsg(in, MaxResponseBytes)
    } finally sock.close()
  }
}
