package graft

/** Eviction contract of [[TableCache]] (round-16 verdict nit 1): the
  * memo must not pin sessions or their plans forever in a
  * multi-session server. Three legs:
  *
  *   1. deterministic release: `invalidate(session)` drops exactly
  *      that session's entries, leaving siblings untouched;
  *   2. GC path: once a session is collected (simulated by clearing
  *      the weak refs — a real collection needs the soft-held frame
  *      to go first, which a unit test cannot force), the next
  *      `resolve` purges its entries;
  *   3. isolation: two sessions resolving the same (dir, table) get
  *      distinct entries (per-session resolution scopes).
  */
class TableCacheLifecycleSpec extends SparkSpec {

  private def df(s: org.apache.spark.sql.SparkSession) = {
    import scala.jdk.CollectionConverters._
    s.createDataFrame(
      List(org.apache.spark.sql.Row(1)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.IntegerType))))
  }

  test("invalidate(session) drops that session's entries only") {
    val a = spark.newSession()
    val b = spark.newSession()
    TableCache.resolve(a, "/dir1", "t1")(df(a))
    TableCache.resolve(a, "/dir1", "t2")(df(a))
    TableCache.resolve(b, "/dir1", "t1")(df(b))
    assert(TableCache.sessionKeyCount(a) == 2)
    assert(TableCache.sessionKeyCount(b) == 1)
    TableCache.invalidate(a)
    assert(TableCache.sessionKeyCount(a) == 0)
    assert(TableCache.sessionKeyCount(b) == 1)
    TableCache.invalidate(b)
  }

  test("entries of a collected session are purged on the next resolve") {
    val dead = spark.newSession()
    val live = spark.newSession()
    TableCache.resolve(dead, "/dir2", "t1")(df(dead))
    TableCache.resolve(live, "/dir2", "t1")(df(live))
    assert(TableCache.sessionKeyCount(dead) == 1)
    TableCache.testClearSessionRefs(dead)
    // any resolve sweeps cleared keys
    TableCache.resolve(live, "/dir2", "t2")(df(live))
    assert(TableCache.sessionKeyCount(dead) == 0)
    assert(TableCache.sessionKeyCount(live) == 2)
    TableCache.invalidate(live)
  }

  test("same (dir, table) in two sessions resolves per session") {
    val a = spark.newSession()
    val b = spark.newSession()
    val fa = TableCache.resolve(a, "/dir3", "t")(df(a))
    val fb = TableCache.resolve(b, "/dir3", "t")(df(b))
    assert(!(fa eq fb), "two sessions must not share a resolution")
    // and each memoizes: the loader runs at most once per key
    var loads = 0
    val again = TableCache.resolve(a, "/dir3", "t") { loads += 1; df(a) }
    assert(again eq fa)
    assert(loads == 0)
    TableCache.invalidate(a)
    TableCache.invalidate(b)
  }
}
