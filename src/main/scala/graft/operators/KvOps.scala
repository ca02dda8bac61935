package graft.operators

import graft.{Q, Tables}
import graft.kv.Redis
import org.apache.spark.sql.functions._

/** Redis-command-surface queries (reference redisw/ module): a command
  * script folds into keyed state in one distributed pass; the oracle
  * reproduces the final state declaratively.
  */
object KvOps {

  val all: Seq[Q] = Seq(

    // ---- the full op surface in one batch: SET/DEL/GETDEL overwrite
    //      ordering, INCR read-modify-write, hash-field HSET/HDEL ----
    Q("q_redis_batch",
      """SELECT key, field, value FROM (
        |  SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS key,
        |         CAST(NULL AS VARCHAR) AS field,
        |         CASE WHEN n_nationkey = 5 THEN 'ARCADIA' ELSE n_name END AS value
        |  FROM nation WHERE n_nationkey NOT IN (7, 9)
        |  UNION ALL SELECT 'hits', NULL, '6'
        |  UNION ALL SELECT 'cfg', 'mode', 'fast'
        |  UNION ALL SELECT 'cfg', 'level', '3'
        |) ORDER BY key, field NULLS FIRST""".stripMargin) { (s, d) =>
      val initial = Tables.nation(s, d).select(
        concat(lit("n:"), col("n_nationkey").cast("string")).as("key"),
        lit(null).cast("string").as("field"),
        col("n_name").as("value"))
      Redis.applyBatch(s, initial, Seq(
        "SET n:5 GRAFTLAND",
        "DEL n:7",
        "INCR hits",
        "INCRBY hits 5",
        "HSET cfg mode fast",
        "HSET cfg level 3",
        "HSET cfg tmp x",
        "HDEL cfg tmp",
        "SET n:5 ARCADIA",   // later seq overwrites GRAFTLAND
        "GETDEL n:9"))
        .orderBy(col("key"), col("field").asc_nulls_first)
    },

    // ---- keyed point lookup after a fold (GET = FetchFromRids shape) ----
    Q("q_redis_get",
      """SELECT n_name AS value FROM nation WHERE n_nationkey = 12""".stripMargin) { (s, d) =>
      val initial = Tables.nation(s, d).select(
        concat(lit("n:"), col("n_nationkey").cast("string")).as("key"),
        lit(null).cast("string").as("field"),
        col("n_name").as("value"))
      Redis.get(Redis.applyBatch(s, initial, Seq("SET other 1")), "n:12")
    }
  )
}
