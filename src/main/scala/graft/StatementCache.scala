package graft

/** Session-scoped parsed-statement cache shared by every query front-end.
  *
  * The reference keeps an LRU of parsed execution plans per statement
  * text so repeated invocations skip the parser
  * (engine/src/main/java/com/arcadedb/query/sql/parser/StatementCache.java:34);
  * here the cached artifact is the immutable AST — compilation against a
  * (SparkSession, dir, catalog, function registry) stays per-call because
  * those can differ between invocations of the same text, while the parse
  * of a given (dialect, text) pair cannot.
  *
  * All front-end ASTs are immutable case-class trees, so a cached value
  * can be re-compiled concurrently without copying. Entries are evicted
  * in LRU access order past [[MaxEntries]]; hit/miss counters exist so a
  * spec can pin "second invocation skips parsing" without resorting to
  * object identity on the AST (though identity holds too).
  */
object StatementCache {
  private final val MaxEntries = 256

  private val lru =
    new java.util.LinkedHashMap[(String, String), AnyRef](64, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), AnyRef]): Boolean = size() > MaxEntries
    }
  private val hitsC   = new java.util.concurrent.atomic.AtomicLong
  private val missesC = new java.util.concurrent.atomic.AtomicLong

  /** Return the cached AST for (dialect, text), parsing on first sight.
    * The parse runs outside the lock: a concurrent duplicate parse of the
    * same text is possible but harmless (last write wins, values equal). */
  def cached[T <: AnyRef](dialect: String, text: String)(parse: => T): T = {
    val key   = (dialect, text)
    val prior = lru.synchronized(lru.get(key))
    if (prior ne null) { hitsC.incrementAndGet(); prior.asInstanceOf[T] }
    else {
      val v = parse
      missesC.incrementAndGet()
      lru.synchronized(lru.put(key, v))
      v
    }
  }

  def hits: Long   = hitsC.get
  def misses: Long = missesC.get
  def clear(): Unit = lru.synchronized(lru.clear())
}
