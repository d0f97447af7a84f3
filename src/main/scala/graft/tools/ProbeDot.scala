package graft.tools
object ProbeDot {
  def main(a: Array[String]): Unit = {
    val p = graft.lib.Py.compile("x.y")
    println("dot-matches-CR: " + p.matcher("x\ry").matches())
  }
}
