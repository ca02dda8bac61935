package graft.sources

import org.apache.spark.sql.SparkSession

/** Full backup / restore of a set of tables (reference
  * integration/src/main/java/com/arcadedb/integration/backup/Backup.java
  * and restore/Restore.java). The reference zips page files of the
  * single-node store; a distributed engine snapshots THROUGH the
  * distributed FS it reads — each table copies as parquet (a distributed
  * job, not a driver stream) plus a tiny manifest listing table names and
  * row counts for integrity checks at restore time.
  */
object Backup {

  /** Snapshot `tables` (name → dir) into `backupDir/<name>`, with a
    * manifest at `backupDir/_manifest`. */
  def backup(spark: SparkSession, tables: Map[String, String], backupDir: String): Unit = {
    import spark.implicits._
    val counts = tables.toSeq.sorted.map { case (name, dir) =>
      val df = spark.read.parquet(dir)
      df.write.mode("overwrite").parquet(s"$backupDir/$name")
      (name, df.count())
    }
    counts.toDF("table", "rows").coalesce(1)
      .write.mode("overwrite").parquet(s"$backupDir/_manifest")
  }

  /** The backup's manifest: (table, rows). */
  def manifest(spark: SparkSession, backupDir: String) =
    spark.read.parquet(s"$backupDir/_manifest")

  /** Restore tables from `backupDir` into `targets` (name → dir),
    * verifying each restored count against the manifest. */
  def restore(spark: SparkSession, backupDir: String, targets: Map[String, String]): Unit = {
    val expected = manifest(spark, backupDir).collect()
      .map(r => r.getAs[String]("table") -> r.getAs[Long]("rows")).toMap
    targets.foreach { case (name, dir) =>
      require(expected.contains(name), s"table $name not in backup")
      val snap = spark.read.parquet(s"$backupDir/$name")
        .localCheckpoint(eager = true) // target dir may BE the snapshot source's origin
      val n = snap.count()
      require(n == expected(name), s"backup of $name corrupt: $n != ${expected(name)}")
      snap.write.mode("overwrite").parquet(dir)
    }
  }
}
