package graft.mr

import org.scalatest.funsuite.AnyFunSuite

class NativeQueriesSpec extends AnyFunSuite {

  test("wcMapSh: segments incl. empties, lowercased, like tr|awk pipeline") {
    val out = NativeQueries.wcMapSh(Iterator("Hello  World", "", "Tab\there")).toList
    assert(out === List("hello\t1", "\t1", "world\t1", "\t1", "tab\t1", "here\t1"))
  }

  test("wcReduceSh groups consecutive equal keys like uniq -c") {
    val sorted = List("\t1", "\t1", "bye\t1", "hello\t1", "hello\t1", "hello\t1")
    val out = NativeQueries.wcReduceSh(sorted.iterator).toList
    assert(out === List("\t2", "bye\t1", "hello\t3"))
  }

  test("wcMapPy drops empties (str.split), wcReducePy space-separated sums") {
    assert(NativeQueries.wcMapPy(Iterator("  a  b ", "")).toList === List("a\t1", "b\t1"))
    val out = NativeQueries.wcReducePy(Iterator("a\t1", "a\t2", "b\t1")).toList
    assert(out === List("a 3", "b 1"))
  }

  test("reduce over merged sorted runs matches test_worker_07 golden") {
    // Fixture contents from /root/reference/tests/testdata/test_worker_07/
    // maptask0000{0,1}-part00000, already merged+sorted (F6), expected
    // output per tests/test_worker_07.py:127-135.
    val merged = List("\t1", "\t1", "bye\t1", "hello\t1", "hello\t1")
    assert(NativeQueries.wcReduceSh(merged.iterator).toList === List("\t2", "bye\t1", "hello\t2"))
  }

  test("grepMap filters on lowercase containment, strips, drops blanks") {
    val out = NativeQueries.grepMap("product")(
      Iterator(" A Product line ", "no match", "", "PRODUCTION")).toList
    assert(out === List("1\tA Product line", "1\tPRODUCTION"))
  }

  test("grepReduce keeps exactly-two-field lines and prints the value") {
    val out = NativeQueries.grepReduce(
      Iterator("1\tkeep me", "malformed", "1\ta\tb", "1\t")).toList
    // "1\t" strips to "1" → 1 field → dropped, same as the reference.
    assert(out === List("keep me"))
  }
}
