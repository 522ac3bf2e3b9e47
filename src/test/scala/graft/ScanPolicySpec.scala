package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Registry, T}

/** Malformed-input policy twins for scan_csv_malformed: the oracled op
  * proves PERMISSIVE routing; these assert the corrupt set is exactly the
  * constructed one and that FAILFAST refuses the same file outright.
  */
class ScanPolicySpec extends AnyFunSuite {
  import TestSession._

  test("scan_csv_malformed: corrupt set is exactly the constructed rows") {
    val byStatus = Registry.queries("scan_csv_malformed")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = T.nation(spark, sf).count()
    val nCorrupt = T.nation(spark, sf).filter(col("n_nationkey") % 5 === 0).count()
    assert(byStatus("corrupt") == nCorrupt)
    assert(byStatus("good") == total - nCorrupt)
    // corrupt rows carry the raw line; good rows parse every typed field
    val parsed = spark.read.schema(StructType(Seq(
        StructField("k", IntegerType), StructField("name", StringType),
        StructField("v", IntegerType), StructField("_corrupt_record", StringType))))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(T.scratch("nation_badcsv"))
    assert(parsed.filter(col("_corrupt_record").isNotNull && col("v").isNotNull).count() == 0)
    assert(parsed.filter(col("_corrupt_record").isNull && col("v").isNull).count() == 0)
  }

  test("FAILFAST twin: strict mode throws on the first malformed row") {
    // the op has written the file above; FAILFAST must refuse it
    Registry.queries("scan_csv_malformed")(spark, sf).collect()
    val strict = spark.read.schema(StructType(Seq(
        StructField("k", IntegerType), StructField("name", StringType),
        StructField("v", IntegerType))))
      .option("mode", "FAILFAST")
      .csv(T.scratch("nation_badcsv"))
    assertThrows[Exception](strict.collect())
  }

  test("sink_dynamic_overwrite: non-target partitions keep their exact files") {
    // run the op end-to-end (full write + dynamic backfill), fingerprint
    // the untouched partitions, then re-issue ONLY the dynamic backfill
    // write: same file names + lengths = the backfill never rewrote them —
    // the idempotent-backfill guarantee the oracle's aggregate view cannot
    // see (a static-mode overwrite would instead truncate the table)
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    Registry.queries("sink_dynamic_overwrite")(spark, sf).collect()
    val root = T.scratch("lineitem_backfill")
    def fingerprint(flag: String): Set[(String, Long)] =
      Files.list(Paths.get(root, s"l_returnflag=$flag")).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> Files.size(p)).toSet
    val before = Seq("N", "R").map(f => f -> fingerprint(f)).toMap
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      T.lineitem(spark, sf)
        .filter(col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") + 1000.0).as("l_quantity"), col("l_returnflag"))
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(root)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    for (f <- Seq("N", "R"))
      assert(fingerprint(f) == before(f),
        s"dynamic overwrite rewrote untouched partition l_returnflag=$f")
  }
}
