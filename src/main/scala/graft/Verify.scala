package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (dev tool for
    // iterating on one query without the full 2-minute dump; the driver
    // passes exactly two args, so its behavior is unchanged)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.ui.explainMode", "formatted")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Write timestamps as TIMESTAMP_NTZ (isAdjustedToUTC=false): the oracle
    // computes naive timestamps from DuckDB's read of the testdata, and a
    // UTC-adjusted parquet column would read back tz-aware — same instant,
    // different representation. Session tz is UTC so the cast is wall-clock
    // preserving, including inside arrays/structs.
    def toNtz(dt: DataType): DataType = dt match {
      case TimestampType => TimestampNTZType
      case ArrayType(et, n) => ArrayType(toNtz(et), n)
      case StructType(fs) =>
        StructType(fs.map(f => f.copy(dataType = toNtz(f.dataType))))
      case MapType(k, v, n) => MapType(toNtz(k), toNtz(v), n)
      case other => other
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val ntz = df.select(df.schema.fields.map { f =>
          val t = toNtz(f.dataType)
          if (t == f.dataType) col(f.name) else col(f.name).cast(t).as(f.name)
        }.toSeq: _*)
        ntz.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free this query's lineage-cut blocks (checkpoint or persist)
      // before the next query runs — 131 queries of accumulated scratch
      // state would otherwise squat in the block manager
      Materialize.releaseAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
