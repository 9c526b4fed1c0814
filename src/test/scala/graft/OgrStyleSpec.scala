package graft

import graft.core.OgrStyleParse._
import org.scalatest.funsuite.AnyFunSuite

class OgrStyleSpec extends AnyFunSuite {

  private val multi = """PEN(c:#FF0000,w:5px);BRUSH(fc:#0000FF)"""
  private val label = """LABEL(f:"Arial, Bold",s:12pt,t:"Hello; World")"""

  test("part count: naive semicolon counting (reference FIXME parity)") {
    assert(partCount(multi) === 2)
    assert(partCount("PEN(c:#FF0000);") === 1) // trailing ';' not counted
    // a QUOTED semicolon still counts — exact reference behavior
    assert(partCount(label) === 2)
    assert(partCount("") === 0)
  }

  test("parts split honoring quoted strings") {
    assert(part(multi, 0) === "PEN(c:#FF0000,w:5px)")
    assert(part(multi, 1) === "BRUSH(fc:#0000FF)")
    assert(part(multi, 2) === null)
    // quoted ';' does NOT split the tokenized part view
    assert(part(label, 0) === label)
    assert(part(label, 1) === null)
  }

  test("tool names and params") {
    assert(toolName(part(multi, 0)) === "PEN")
    assert(toolName(part(multi, 1)) === "BRUSH")
    assert(param(part(multi, 0), "c") === "#FF0000")
    assert(param(part(multi, 0), "W") === "5") // case-insensitive key, unit stripped
    assert(paramUnit(part(multi, 0), "w") === "px")
    assert(param(part(multi, 0), "id") === null)
    assert(param(label, "f") === "Arial, Bold") // quoted comma preserved
    assert(param(label, "t") === "Hello; World")
    assert(param(label, "s") === "12")
    assert(paramUnit(label, "s") === "pt")
    assert(paramUnit(label, "t") === "") // quoted text never unit-stripped
  }

  test("symbol tool with escaped quote") {
    val sym = """SYMBOL(id:"ogr-sym-0",a:30,s:2g)"""
    assert(toolName(sym) === "SYMBOL")
    assert(param(sym, "id") === "ogr-sym-0")
    assert(param(sym, "a") === "30")
    assert(param(sym, "s") === "2")
    assert(paramUnit(sym, "s") === "g")
  }
}
