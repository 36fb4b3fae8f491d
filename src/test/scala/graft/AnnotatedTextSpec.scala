package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.Parser
import graft.extract.{AnnotatedText, Article}
import graft.extract.AnnotatedText.Chunk

/** Transliterated from /root/reference/tests/test_annotated_text.py. */
class AnnotatedTextSpec extends AnyFunSuite {

  test("simple document (:16-24)") {
    val dom = Parser.parseFragment("<p>This is\n\tsimple\ttext.</p>")
    assert(AnnotatedText.parse(dom) == List(List(Chunk("This is\nsimple text.", null))))
  }

  test("empty paragraph skipped (:27-35)") {
    val dom = Parser.parseFragment("<div><p>Paragraph <p>\t  \n</div>")
    assert(AnnotatedText.parse(dom) == List(List(Chunk("Paragraph", null))))
  }

  test("multiple paragraphs (:38-52)") {
    val dom = Parser.parseFragment("<div><p> 1 first<p> 2\tsecond <p>3\rthird   </div>")
    assert(AnnotatedText.parse(dom) == List(
      List(Chunk("1 first", null)),
      List(Chunk("2 second", null)),
      List(Chunk("3\nthird", null))))
  }

  test("single annotation (:55-67)") {
    val dom = Parser.parseFragment("<div><p> text <em>emphasis</em> <p> last</div>")
    assert(AnnotatedText.parse(dom) == List(
      List(Chunk("text", null), Chunk("emphasis", List("em"))),
      List(Chunk("last", null))))
  }

  test("recursive annotation dedupes and sorts (:70-82)") {
    val dom = Parser.parseFragment("<div><p> text <em><i><em>emphasis</em></i></em> <p> last</div>")
    assert(AnnotatedText.parse(dom) == List(
      List(Chunk("text", null), Chunk("emphasis", List("em", "i"))),
      List(Chunk("last", null))))
  }

  test("annotations without explicit paragraph (:85-95)") {
    val dom = Parser.parseFragment("<div>text <strong>emphasis</strong>\t<b>hmm</b> </div>")
    assert(AnnotatedText.parse(dom) == List(List(
      Chunk("text", null),
      Chunk("emphasis", List("strong")),
      Chunk("hmm", List("b")))))
  }

  test("process paragraph with chunked text (:98-113)") {
    val out = graft.extract.AnnotatedText.processParagraph(List(
      (" 1", List("b", "del")),
      (" 2", List("b", "del")),
      (" 3", null),
      (" 4", null),
      (" 5", null),
      (" 6", List("em"))))
    assert(out == List(
      graft.extract.AnnotatedText.Chunk("1 2", List("b", "del")),
      graft.extract.AnnotatedText.Chunk("3 4 5", null),
      graft.extract.AnnotatedText.Chunk("6", List("em"))))
  }

  test("h1 heading folded into first paragraph (:116-128)") {
    val dom = Parser.parseDocument(Fixtures.snippet("h1_and_2_paragraphs.html"))
    val body = dom.find("body")
    assert(AnnotatedText.parse(body) == List(
      List(
        Chunk("Nadpis H1, ktorý chce byť prvý s textom ale predbehol ho \"title\"", List("h1")),
        Chunk("Toto je prvý odstavec a to je fajn.", null)),
      List(
        Chunk("Tento text je tu aby vyplnil prázdne miesto v srdci súboru.\nAj súbory majú predsa city.", null))))
  }

  test("real article golden: zdrojak_automaticke_zabezpeceni (:131-170)") {
    val article = Article.fromBytes(Fixtures.articleBytes("zdrojak_automaticke_zabezpeceni.html"))
    val at = article.mainText
    val expected = List(
      List(
        Chunk("Automatické zabezpečení", List("h1")),
        Chunk("Úroveň zabezpečení aplikace bych rozdělil do tří úrovní:", null)),
      List(
        Chunk("Aplikace zabezpečená není, neošetřuje uživatelské vstupy ani své výstupy.", List("li", "ol")),
        Chunk("Aplikace se o zabezpečení snaží, ale takovým způsobem, že na ně lze zapomenout.", List("li", "ol")),
        Chunk("Aplikace se o zabezpečení stará sama, prakticky se nedá udělat chyba.", List("li", "ol"))),
      List(
        Chunk("Jak se tyto úrovně projevují v jednotlivých oblastech?", null)),
      List(
        Chunk("XSS", List("a", "h2")),
        Chunk("Druhou úroveň představuje ruční ošetřování pomocí", null),
        Chunk("htmlspecialchars", List("a", "kbd")),
        Chunk(". Třetí úroveň zdánlivě reprezentuje automatické ošetřování v šablonách, např. v", null),
        Chunk("Nette Latte", List("a", "strong")),
        Chunk(". Proč píšu zdánlivě? Problém je v tom, že ošetření se dá obvykle snadno zakázat, např. v Latte pomocí", null),
        Chunk("{!$var}", List("code")),
        Chunk(". Viděl jsem šablony plné vykřičníků i na místech, kde být neměly. Autor to vysvětlil tak, že psaní", null),
        Chunk("{$var}", List("code")),
        Chunk("někde způsobovalo problémy, které po přidání vykřičníku zmizely, tak je začal psát všude.", null)),
      List(
        Chunk("<?php\n$safeHtml = $texy->process($content_texy);\n$content = Html::el()->setHtml($safeHtml);\n// v šabloně pak můžeme použít {$content}\n?>", List("pre"))),
      List(
        Chunk("Ideální by bylo, když by už samotná metoda", null),
        Chunk("process()", List("code")),
        Chunk("vracela instanci", null),
        Chunk("Html", List("code")),
        Chunk(".", null)))
    assert(at == expected)
  }
}
