package graft.udf

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Durable function registry: the managed UDF/TVF surface persisted as its
  * own CREATE DDL, replayable into any session.
  *
  * The reference's materializations exist precisely so functions OUTLIVE
  * the session that created them — `macros/udf/function.sql:4-7` guards the
  * create against a pre-existing same-name relation because the function is
  * expected to already be in the warehouse on the next run. Spark gives that
  * durability two ways, and this registry is the half that works everywhere:
  *
  *   - **Metastore persistence** (`temporary = false` against a Hive-backed
  *     catalog): `CREATE FUNCTION` becomes a catalog object a brand-new
  *     SparkSession — a new JVM, a new SparkContext — re-resolves with no
  *     bootstrap at all. Proven end-to-end by `graft.tools.PersistenceMain`
  *     (two full session lifecycles against one Derby metastore).
  *   - **Registry replay** (this object): with the default in-memory
  *     catalog there is nothing durable behind the session, so the managed
  *     DDL itself is the artifact — one `NNNN_<name>.sql` file per object,
  *     written in dependency order, replayed by [[bootstrap]] at session
  *     start. This is also the disaster-recovery path for a metastore
  *     rebuild, and it is exactly the reference's own thesis (functions as
  *     version-controlled SQL files) made executable.
  *
  * Files are plain DDL, not a bespoke serialization: the registry can be
  * inspected, diffed, and replayed by `spark-sql -f` without this library.
  */
object Registry {

  /** Writes each DDL as `NNNN_<sanitized-name>.sql` under `dir` (created if
    * missing), index-prefixed so [[bootstrap]]'s sorted replay preserves the
    * caller's dependency order (a TVF whose body calls a scalar UDF must be
    * created after it — Spark analyzes the body at CREATE time). The save
    * REPLACES the registry: stale `.sql` files from a previous save are
    * removed first, so a shrunk or reordered managed set never leaves
    * orphan DDL for [[bootstrap]] to replay (the registry is a projection
    * of the managed set, not an append log).
    */
  def save(dir: String, entries: Seq[(String, String)]): Unit = {
    // the index prefix is what makes lexicographic file sort equal the
    // caller's dependency order — past its width the two orders diverge
    // and replay could create a TVF before the UDF it references, so an
    // oversized managed set is refused rather than silently mis-ordered
    require(entries.size <= 999999,
      s"registry index prefix is 6 digits (${entries.size} entries given); " +
      "widen the prefix before saving a larger managed set")
    val root = Paths.get(dir)
    Files.createDirectories(root)
    list(dir).foreach(Files.delete)
    entries.zipWithIndex.foreach { case ((name, ddl), i) =>
      val safe = name.replaceAll("[^A-Za-z0-9_.]", "_")
      Files.writeString(root.resolve(f"$i%06d_$safe.sql"), ddl): Unit
    }
  }

  /** The saved DDL scripts in replay order. */
  def list(dir: String): Seq[Path] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val stream = Files.list(root)
      try stream.iterator.asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".sql"))
        .sortBy(_.getFileName.toString)
      finally stream.close()
    }
  }

  /** Replays every saved DDL into `spark` (sorted file order = saved
    * dependency order) and returns how many ran. `CREATE OR REPLACE` DDL is
    * idempotent, so bootstrapping an already-bootstrapped session is safe.
    */
  def bootstrap(spark: SparkSession, dir: String): Int = {
    val scripts = list(dir)
    scripts.foreach(p => spark.sql(Files.readString(p)): Unit)
    scripts.size
  }

  /** Convenience: materialize a spec'd surface into `spark` AND persist its
    * DDL to the registry in one step, so the in-session state and the
    * durable artifact cannot drift.
    */
  def materializeAndSave(
      spark: SparkSession,
      dir: String,
      udfs: Seq[UdfSpec],
      tvfs: Seq[TvfSpec],
      database: Option[String] = None,
      temporary: Boolean = true): Unit = {
    // a replay into a FRESH session must also recreate the namespace the
    // functions land in — the DDL files alone are the whole bootstrap
    val dbEntry = database.filter(_ => !temporary)
      .map(db => s"database_$db" -> s"CREATE DATABASE IF NOT EXISTS $db").toSeq
    val entries = dbEntry ++
      udfs.map(s => s.name -> Materializer.createFunctionSql(s, database, temporary)) ++
      tvfs.map(s => s.name -> Materializer.createTableFunctionSql(s, database, temporary))
    udfs.foreach(Materializer.materializeFunction(spark, _, database, temporary))
    tvfs.foreach(Materializer.materializeTableFunction(spark, _, database, temporary))
    save(dir, entries)
  }
}
