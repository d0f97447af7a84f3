package graft.tools
import graft.lib.Py
object DbgT {
  def main(a: Array[String]): Unit = {
    println("T1: " + Py.translate("(" + java.util.regex.Pattern.quote("NAMA") + ")\\s+([^:\\n]+)"))
    val p = Py.compile("(" + java.util.regex.Pattern.quote("NAMA") + ")\\s+([^:\\n]+)")
    println("match: " + Py.sub(p, "$1: $2", "NAMA Agus Salim"))
    val p2 = Py.compile("\\bNAME\\b", Py.I)
    println("nameFix: " + Py.subLit(p2, "NAMA", "NAME Agus"))
    println("T2: " + Py.translate("\\s+"))
    println("wsClass=" + Py.wsClass)
  }
}
