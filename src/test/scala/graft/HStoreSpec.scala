package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.HStore

/** hstore_get_value parity with the reference parser
  * (`/root/reference/gdal/ogr/swq_op_general.cpp:107-242`; cases from
  * `autotest/ogr/ogr_sql_sqlite.py:1666-1710`).
  */
class HStoreSpec extends AnyFunSuite {
  test("valid and invalid hstore lookups match the reference") {
    assert(HStore.getValue("a=>b", "a") === "b")
    assert(HStore.getValue("a=>b", "c") === null)
    assert(HStore.getValue("a=>b,c=>d", "c") === "d")
    assert(HStore.getValue(" a => b , c => d ", "c") === "d")
    assert(HStore.getValue("\"key with space\"=>\"val,comma\"", "key with space") === "val,comma")
    assert(HStore.getValue("\"k\\\"q\"=>v", "k\"q") === "v")
    assert(HStore.getValue("garbage", "a") === null)
    assert(HStore.getValue("a=>", "a") === null) // reference: key at EOS -> NULL pair
  }

  test("SQL surface") {
    val spark = SparkTestBase.spark
    val r = spark.sql("select hstore_get_value('a=>b,c=>d', 'c'), hstore_get_value('a=>b', 'zz')").head()
    assert(r.getString(0) === "d")
    assert(r.isNullAt(1))
  }
}
