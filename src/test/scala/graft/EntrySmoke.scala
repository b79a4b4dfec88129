package graft
class EntrySmoke extends SparkSpec {
  test("driver entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
