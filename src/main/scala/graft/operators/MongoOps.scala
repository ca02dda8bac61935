package graft.operators

import graft.{Q, Tables}
import graft.mongo.Mongo

/** End-to-end MongoDB query-language queries (reference mongodbw/ module):
  * each Spark side parses a real find/aggregate JSON document and compiles
  * to one DataFrame plan; the oracle is the equivalent SQL over the same
  * parquet tables.
  */
object MongoOps {

  val all: Seq[Q] = Seq(

    // ---- find(filter, projection).sort().limit(): operator + $or surface ----
    Q("q_mongo_find",
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 150000
        |  AND (o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_custkey < 100)
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin) { (s, d) =>
      Mongo.find(Tables.orders(s, d),
        """{"o_orderstatus": "O",
          |  "o_totalprice": {"$gt": 150000},
          |  "$or": [{"o_orderpriority": {"$in": ["1-URGENT", "2-HIGH"]}},
          |          {"o_custkey": {"$lt": 100}}]}""".stripMargin,
        """{"o_orderkey": 1, "o_totalprice": 1, "o_orderpriority": 1}""",
        """{"o_totalprice": -1, "o_orderkey": 1}""",
        limit = 50)
    },

    // ---- find with $regex / $nin / $mod ----
    Q("q_mongo_regex",
      """SELECT c_custkey, c_name FROM customer
        |WHERE regexp_matches(c_name, '00[0-4]$') AND c_custkey % 3 = 1
        |  AND c_mktsegment NOT IN ('MACHINERY', 'BUILDING')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Mongo.find(Tables.customer(s, d),
        """{"c_name": {"$regex": "00[0-4]$"},
          |  "c_custkey": {"$mod": [3, 1]},
          |  "c_mktsegment": {"$nin": ["MACHINERY", "BUILDING"]}}""".stripMargin,
        """{"c_custkey": 1, "c_name": 1}""",
        """{"c_custkey": 1}""")
    },

    // ---- aggregate: $match → $group (decimal-exact $sum/$avg) → $sort ----
    Q("q_mongo_agg_group",
      """SELECT o_orderpriority AS _id, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) / count(o_totalprice) AS avg_price
        |FROM orders WHERE o_orderstatus <> 'P'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Mongo.aggregate(Tables.orders(s, d),
        """[{"$match": {"o_orderstatus": {"$ne": "P"}}},
          |  {"$group": {"_id": "$o_orderpriority",
          |              "n": {"$sum": 1},
          |              "total": {"$sum": "$o_totalprice"},
          |              "avg_price": {"$avg": "$o_totalprice"}}},
          |  {"$sort": {"_id": 1}}]""".stripMargin)
    },

    // ---- aggregate: $lookup + $unwind (fused to a join) + $project exprs ----
    Q("q_mongo_lookup",
      """SELECT o_orderkey, upper(c_name) AS customer, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 300000 AND c_mktsegment = 'BUILDING'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Mongo.aggregate(Tables.orders(s, d),
        """[{"$match": {"o_totalprice": {"$gt": 300000}}},
          |  {"$lookup": {"from": "customer", "localField": "o_custkey",
          |               "foreignField": "c_custkey", "as": "cust"}},
          |  {"$unwind": "$cust"},
          |  {"$match": {"cust.c_mktsegment": "BUILDING"}},
          |  {"$project": {"o_orderkey": 1,
          |                "customer": {"$toUpper": "$cust.c_name"},
          |                "o_totalprice": 1}},
          |  {"$sort": {"o_orderkey": 1}}]""".stripMargin,
        tables = Map("customer" -> Tables.customer(s, d)))
    },

    // ---- write commands: insert / update($set+$inc / upsert) / delete
    //      mapped onto MutableTable (reference MongoDBDatabaseWrapper
    //      insertDocument:442 / updateDocuments:546 / deleteDocuments:505);
    //      the oracle computes the same final state declaratively ----
    Q("q_mongo_write",
      """SELECT n_nationkey,
        |  CASE WHEN rk >= 3 THEN 'UPDATED' ELSE n_name END AS n_name,
        |  CASE WHEN rk >= 3 THEN rk + 10 ELSE rk END AS n_regionkey
        |FROM (SELECT n_nationkey, n_name, n_regionkey AS rk
        |      FROM nation WHERE n_nationkey <> 0)
        |UNION ALL SELECT 98, 'NEWLAND', 7
        |UNION ALL SELECT 99, 'ATLANTIS', 9
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val t = graft.sources.MutableTable.copyOf(
        s, Tables.nation(s, d), s"/tmp/graft_state/mongo_write_${d.replaceAll("[^A-Za-z0-9]", "_")}")
      // updateMany: $set + $inc on a filter
      Mongo.updateCmd(s, t, """{"n_regionkey": {"$gte": 3}}""",
        """{"$set": {"n_name": "UPDATED"}, "$inc": {"n_regionkey": 10}}""")
      // plain insert
      Mongo.insertCmd(s, t,
        """{"n_nationkey": 98, "n_name": "NEWLAND", "n_regionkey": 7}""")
      // upsert: the filter misses, so the document seeds from q + $set
      Mongo.updateCmd(s, t, """{"n_nationkey": {"$eq": 99}}""",
        """{"$set": {"n_name": "ATLANTIS", "n_regionkey": 9}}""",
        multi = true, upsert = true)
      // deleteMany on a precise filter
      Mongo.deleteCmd(s, t, """{"n_nationkey": 0}""")
      t.df.select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    },

    // ---- aggregate: computed $project + $unwind over a $split array ----
    Q("q_mongo_unwind",
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(lang || '-' || source, '-')) AS word FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Mongo.aggregate(Tables.documents(s, d),
        """[{"$project": {"word": {"$split": [{"$concat": ["$lang", "-", "$source"]}, "-"]}}},
          |  {"$unwind": "$word"},
          |  {"$group": {"_id": "$word", "n": {"$sum": 1}}},
          |  {"$project": {"word": "$_id", "n": 1}},
          |  {"$sort": {"word": 1}}]""".stripMargin)
    }
  )
}
