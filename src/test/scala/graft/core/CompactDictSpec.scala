package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CompactDictSpec extends AnyFunSuite {

  test("lookups agree with the source Map across random instances") {
    (0 until 50).foreach { trial =>
      val rnd = new scala.util.Random(trial)
      val m = (0 until rnd.nextInt(40)).map { _ =>
        val k = rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString
        k -> List.fill(rnd.nextInt(4))(rnd.alphanumeric.take(3).mkString)
      }.toMap
      val d = CompactDict.fromMap(m)
      assert(d.size == m.size)
      m.foreach { case (k, v) =>
        assert(d.getOrElse(k, Nil) == v, s"trial $trial key $k")
        assert(d.contains(k))
      }
      (0 until 20).map(_ => rnd.alphanumeric.take(6).mkString)
        .filterNot(m.contains).foreach { k =>
          assert(d.getOrElse(k, List("fallback")) == List("fallback"))
          assert(!d.contains(k))
          assert(d.get(k).isEmpty)
        }
    }
  }

  test("label order within a key is preserved (feature identity)") {
    val d = CompactDict.fromMap(Map("w" -> List("z", "a", "m", "a")))
    assert(d.getOrElse("w", Nil) == List("z", "a", "m", "a"))
  }

  test("entries iterate in sorted key order (stable model JSON)") {
    val d = CompactDict.fromMap(Map("b" -> List("1"), "a" -> List("2"), "c" -> Nil))
    assert(d.entries.map(_._1).toList == List("a", "b", "c"))
    assert(d.toMap == Map("b" -> List("1"), "a" -> List("2"), "c" -> Nil))
  }

  test("empty dict") {
    assert(CompactDict.empty.isEmpty)
    assert(CompactDict.empty.getOrElse("x", Nil) == Nil)
  }
}
