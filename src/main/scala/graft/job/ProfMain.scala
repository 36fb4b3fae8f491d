package graft.job
import graft.extract._
import java.nio.file.{Files, Paths}
object ProfMain {
  def main(args: Array[String]): Unit = {
    val arts = FixtureGen.Articles.map(n => Files.readAllBytes(Paths.get("src/test/resources/fixtures/articles", n)))
    (1 to 20).foreach(_ => arts.foreach { b => val a = Article.fromBytes(b); a.mainText; a.readable })
    val t0 = System.nanoTime()
    var n = 0
    while (System.nanoTime() - t0 < 30e9) { arts.foreach { b => val a = Article.fromBytes(b); a.mainText; a.readable; n += 1 } }
    println(s"docs: $n in 30s = ${n/30.0} docs/s")
  }
}
