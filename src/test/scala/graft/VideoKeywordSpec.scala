package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.{Node, Serializer}
import graft.extract.TextCache

/** The serialization-free ok_embedded_video (TextCache.okEmbeddedVideo)
  * must equal the reference's serialize-then-substring check
  * (readable.py:55-64) on randomly built trees with keywords planted in
  * every possible position (tag, attr name/value, text, tails). */
class VideoKeywordSpec extends AnyFunSuite {

  private def referenceCheck(n: Node): Boolean = {
    val s = Serializer.toUnicode(n)
    s.contains("youtube") || s.contains("blip.tv") || s.contains("vimeo")
  }

  test("bottom-up keyword check ≡ serialize-and-contains (property)") {
    val rnd = new scala.util.Random(11)
    val words = Array("youtube", "blip.tv", "vimeo", "youtub", "vimeoo", "x",
      "media", "embed.youtube.com/v/1", "you", "tube")
    def randomTree(depth: Int): Node = {
      val tags = Array("div", "embed", "object", "span", "youtube")
      val n = new Node(tags(rnd.nextInt(tags.length)))
      if (rnd.nextInt(3) == 0) n.set(
        if (rnd.nextInt(5) == 0) words(rnd.nextInt(words.length)) else "src",
        words(rnd.nextInt(words.length)))
      if (rnd.nextInt(2) == 0) n.text = words(rnd.nextInt(words.length))
      if (depth > 0) {
        (0 until rnd.nextInt(3)).foreach { _ =>
          val c = randomTree(depth - 1)
          if (rnd.nextInt(2) == 0) c.tail = words(rnd.nextInt(words.length))
          n.append(c)
        }
      }
      n
    }
    (1 to 400).foreach { i =>
      val tree = randomTree(3)
      val cache = new TextCache
      assert(cache.okEmbeddedVideo(tree) == referenceCheck(tree),
        s"iteration $i: ${Serializer.toUnicode(tree).take(300)}")
    }
  }
}
