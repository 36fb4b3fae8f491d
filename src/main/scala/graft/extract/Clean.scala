package graft.extract

import graft.html.Node
import java.util.regex.Pattern

/**
 * E4 — destructive sanitize pass matching the reference's lxml `Cleaner`
 * configuration (breadability/readable.py:25-31):
 *   scripts/javascript/comments/style/links/processing_instructions = True,
 *   kill_tags = (noscript, iframe); everything else kept.
 *
 * Effects reproduced: kill <script>, <style>, <link>, <noscript>, <iframe>
 * subtrees (drop_tree — tails merged left); strip all `style` attributes;
 * strip `on*` event attributes; strip `javascript:`-scheme link attributes.
 * Comments/PIs were never materialized by our parser (equivalent trees).
 */
object Clean {

  private val KillTags = Set("script", "style", "link", "noscript", "iframe")
  private val JsScheme = Pattern.compile("""^\s*(?:javascript|jscript|vbscript):""",
    Pattern.CASE_INSENSITIVE)

  def apply(root: Node): Unit = {
    val kills = scala.collection.mutable.ArrayBuffer.empty[Node]
    def walk(n: Node): Unit = {
      if (KillTags.contains(n.tag)) { kills += n; return } // whole subtree goes
      if (n.attrs.nonEmpty) {
        val bad = n.attrs.keysIterator.filter { k =>
          k == "style" || k.startsWith("on") ||
            ((k == "href" || k == "src" || k == "action") &&
              JsScheme.matcher(n.attrs(k)).find())
        }.toList
        bad.foreach(n.attrs.remove)
      }
      n.children.toList.foreach(walk)
    }
    walk(root)
    kills.foreach { k => if (k.parent != null) k.dropTree() }
  }
}
