package graft

/** Shared golden-CSV comparison: byte-equal fields, except double-typed
  * fields compare at 1e-12 relative tolerance (distributed sums add in a
  * different order than pandas' sequential fold) and JSON fields compare
  * with separator spacing normalized (json.dumps vs to_json). */
object CsvGolden {

  def normJson(s: String): String =
    if (s == null) null else s.replace(": ", ":").replace(", ", ",")

  /** Split one CSV line into fields (RFC 4180 quoting). */
  def csvFields(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case _   => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  def assertLineEq(got: String, golden: String): Unit = {
    val (g, o) = (csvFields(got), csvFields(normJson(golden)))
    assert(g.size == o.size, s"field count:\n  got    $got\n  golden $golden")
    g.zip(o).foreach { case (a, b) =>
      (a.toDoubleOption, b.toDoubleOption) match {
        case (Some(x), Some(y)) if b.contains('.') || a.contains('.') =>
          assert(math.abs(x - y) <= math.abs(y) * 1e-12 + 1e-300,
            s"numeric field $a != $b in:\n  got    $got\n  golden $golden")
        case _ =>
          assert(a == b, s"field '$a' != '$b' in:\n  got    $got\n  golden $golden")
      }
    }
  }

  def assertFileEq(gotPath: String, goldenPath: String): Unit = {
    val got = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(gotPath))
    val golden = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(goldenPath))
    assert(got.size == golden.size, s"line count ${got.size} != ${golden.size}")
    got.toArray.zip(golden.toArray).foreach { case (a, g) =>
      assertLineEq(a.toString, g.toString)
    }
  }
}
