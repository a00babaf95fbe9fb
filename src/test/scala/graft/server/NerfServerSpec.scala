package graft.server

import graft.KgMain
import graft.core.Forest
import org.scalatest.funsuite.AnyFunSuite

class NerfServerSpec extends AnyFunSuite {
  lazy val model = KgMain.model

  test("server answers requests with the same annotation as local ner") {
    val server = NerfServer.serve(model, port = 0) // ephemeral
    try {
      val port = server.getLocalPort
      val sent = "coach Kira Novak in Elbonia"
      val got = NerfServer.request("127.0.0.1", port, sent)
      assert(got == Forest.renderEnamex(model.ner(sent)))
      // concurrent clients, one connection per request (reference model)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val sents = Vector("the firm Alpha Systems", "Kira Novak", "plain text")
      val results = Await.result(
        Future.sequence(sents.map(s =>
          Future(NerfServer.request("127.0.0.1", port, s)))), 30.seconds)
      sents.zip(results).foreach { case (s, r) =>
        assert(r == Forest.renderEnamex(model.ner(s)))
      }
      // multi-line request annotates each line
      val multi = NerfServer.request("127.0.0.1", port, sents.mkString("\n"))
      assert(multi.split('\n').length == sents.length)
    } finally server.close()
  }

  test("frame protocol round-trips unicode") {
    val bos = new java.io.ByteArrayOutputStream()
    NerfServer.sendMsg(new java.io.DataOutputStream(bos), "zażółć 日本 \n x")
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(NerfServer.recvMsg(in) == "zażółć 日本 \n x")
  }
}
