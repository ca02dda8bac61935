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

  /** Filesystem-level snapshot of table directories — the TRANSACTION
    * fast path (reference TransactionContext page snapshots, not the
    * BACKUP DATABASE statement: that one stays a distributed job with a
    * row-count manifest, [[backup]]). A tx snapshot copies the parquet
    * files as files: no Spark jobs, no schema pass — byte-identical
    * restore. State dirs are single-FS by construction here; on a
    * cluster the same operation is a DFS directory copy. */
  def snapshotFiles(tables: Map[String, String], snapDir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(snapDir)
    deleteRecursive(root)
    tables.foreach { case (name, dir) =>
      val src = java.nio.file.Paths.get(dir)
      val dst = root.resolve(name)
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.list(src).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .foreach(f => java.nio.file.Files.copy(f, dst.resolve(f.getFileName.toString)))
    }
  }

  /** Inverse of [[snapshotFiles]]: clear each target dir, copy the
    * snapshot's files back, and drop Spark's cached file listings for the
    * restored paths. */
  def restoreFiles(spark: SparkSession, snapDir: String,
      targets: Map[String, String]): Unit = {
    import scala.jdk.CollectionConverters._
    targets.foreach { case (name, dir) =>
      val src = java.nio.file.Paths.get(snapDir).resolve(name)
      require(java.nio.file.Files.isDirectory(src), s"table $name not in tx snapshot")
      val dst = java.nio.file.Paths.get(dir)
      deleteRecursive(dst)
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.list(src).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .foreach(f => java.nio.file.Files.copy(f, dst.resolve(f.getFileName.toString)))
      spark.catalog.refreshByPath(dir)
    }
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
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
