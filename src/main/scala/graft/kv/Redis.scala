package graft.kv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Redis command-surface front-end — the Spark re-expression of the
  * reference's Redis protocol plugin (reference redisw/src/main/java/com/
  * arcadedb/redis/RedisNetworkExecutor.java:189 — GET/SET/GETDEL/EXISTS/
  * INCR/INCRBY/INCRBYFLOAT/DECR/DECRBY and the hash-field HGET/HSET/HDEL
  * family over bucket-indexed documents).
  *
  * The reference executes commands one-by-one against its page store; a
  * Spark KV store is a keyed table, so the idiomatic scale design is
  * BATCHED: a command script becomes a (seq, key, field, op, arg) changeset
  * that folds into the current state with ONE shuffle — per (key, field)
  * the ops are sorted by sequence and reduced left-to-right with the
  * `aggregate` higher-order function (no driver loop, no per-command
  * write). Last-writer-wins and read-modify-write (INCR) semantics both
  * fall out of the ordered fold, and at 100 TB the whole batch is a single
  * hash-partition pass over the keyspace.
  *
  * State schema: (key: String, field: String|null, value: String) — plain
  * KV rows have field = null, hash-object rows (HSET) carry the field.
  */
object Redis {

  // NOT private: the encoder's generated (janino) code must call the
  // field accessors reflectively from outside this object — a private
  // case class forces a per-run codegen failure + interpreted fallback
  final case class Op(seq: Long, key: String, field: String, op: String, arg: String)

  /** Tokenize one command: whitespace-separated, single quotes protect spaces. */
  private def tokens(cmd: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val cur = new StringBuilder
    var q = false
    for (c <- cmd.trim) c match {
      case '\'' => q = !q
      case c0 if c0.isWhitespace && !q => if (cur.nonEmpty) { out += cur.toString; cur.clear() }
      case c0 => cur += c0
    }
    if (cur.nonEmpty) out += cur.toString
    out.toList
  }

  private def parse(seq: Long, cmd: String): Op = tokens(cmd) match {
    case List(c, k, v) if c.equalsIgnoreCase("SET")     => Op(seq, k, null, "SET", v)
    case List(c, k) if c.equalsIgnoreCase("DEL")        => Op(seq, k, null, "DEL", null)
    case List(c, k) if c.equalsIgnoreCase("GETDEL")     => Op(seq, k, null, "DEL", null)
    case List(c, k) if c.equalsIgnoreCase("INCR")       => Op(seq, k, null, "INCRBY", "1")
    case List(c, k) if c.equalsIgnoreCase("DECR")       => Op(seq, k, null, "INCRBY", "-1")
    case List(c, k, n) if c.equalsIgnoreCase("INCRBY")  => Op(seq, k, null, "INCRBY", n)
    case List(c, k, n) if c.equalsIgnoreCase("DECRBY")  => Op(seq, k, null, "INCRBY", "-" + n.stripPrefix("-"))
    case List(c, k, n) if c.equalsIgnoreCase("INCRBYFLOAT") => Op(seq, k, null, "INCRFLOAT", n)
    case List(c, k, f, v) if c.equalsIgnoreCase("HSET") => Op(seq, k, f, "SET", v)
    case List(c, k, f) if c.equalsIgnoreCase("HDEL")    => Op(seq, k, f, "DEL", null)
    case other => throw new IllegalArgumentException(s"unsupported command: $cmd")
  }

  /** Fold a command script into the state in one distributed pass.
    * `state` columns: key, field, value. Returns the new state. */
  def applyBatch(spark: SparkSession, state: DataFrame, commands: Seq[String]): DataFrame = {
    import spark.implicits._
    val ops = commands.zipWithIndex.map { case (c, i) => parse(i + 1L, c) }.toDS()
      .select($"seq", $"key", $"field", $"op", $"arg")
    val base = state.select(
      col("key"), col("field"), lit(0L).as("seq"), lit("SET").as("op"), col("value").as("arg"))
    val all = base.unionByName(ops.select(col("key"), col("field"), col("seq"), col("op"), col("arg")))
    // per (key, field): sort ops by seq (array_sort on the struct orders by
    // its first element) and fold left-to-right
    all.groupBy(col("key"), col("field"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("seq"), col("op"), col("arg")))),
        lit(null).cast("string"),
        (acc, x) =>
          when(x.getField("op") === "SET", x.getField("arg"))
            .when(x.getField("op") === "DEL", lit(null).cast("string"))
            .when(x.getField("op") === "INCRBY",
              (coalesce(acc.cast("long"), lit(0L)) + x.getField("arg").cast("long")).cast("string"))
            .when(x.getField("op") === "INCRFLOAT",
              (coalesce(acc.cast("double"), lit(0.0)) + x.getField("arg").cast("double")).cast("string"))
            .otherwise(acc)
      ).as("value"))
      .filter(col("value").isNotNull) // deleted / never-set keys vanish
  }

  /** GET / HGET: point lookup (FetchFromRids-shaped at scale — a keyed
    * filter the scan pushes down). */
  def get(state: DataFrame, key: String, field: Option[String] = None): DataFrame =
    state.filter(col("key") === key &&
      field.map(f => col("field") === f).getOrElse(col("field").isNull))
      .select(col("value"))

  /** EXISTS: 0/1 per the Redis contract. */
  def exists(state: DataFrame, key: String): DataFrame =
    state.filter(col("key") === key)
      .agg(when(count(lit(1)) > 0, 1L).otherwise(0L).as("n"))
}
