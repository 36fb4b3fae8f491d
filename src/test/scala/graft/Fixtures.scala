package graft

import java.nio.file.{Files, Paths}

object Fixtures {
  private def read(path: String): Array[Byte] = {
    val url = getClass.getClassLoader.getResource(path)
    if (url != null) {
      val in = url.openStream()
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    } else Files.readAllBytes(Paths.get("src/test/resources/" + path))
  }

  def snippetBytes(name: String): Array[Byte] = read(s"fixtures/snippets/$name")
  def snippet(name: String): String =
    new String(snippetBytes(name), java.nio.charset.StandardCharsets.UTF_8)
  def articleBytes(name: String): Array[Byte] = read(s"fixtures/articles/$name")
  def article(name: String): String =
    new String(articleBytes(name), java.nio.charset.StandardCharsets.UTF_8)
}
