package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink format coverage: the reference wraps any Iterable and
  * consumes via plain Python (SURVEY §2.1 — csv.DictWriter in its ETL
  * example); here the engine round-trips parquet/csv/json natively. */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  test("csv round-trip preserves rows and schema") {
    val df = Relational.t(spark, sf0001, "nation")
    df.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.count() == df.count())
    assert(back.columns.sorted.sameElements(df.columns.sorted))
  }

  test("json lines round-trip preserves values") {
    val df = Relational.t(spark, sf0001, "region")
    df.write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json")
    val a = df.orderBy("r_regionkey").collect().map(_.getString(1)).toList
    val b = back.orderBy("r_regionkey").collect()
      .map(_.getAs[String]("r_name")).toList
    assert(a == b)
  }

  test("xml round-trip preserves values (Spark 4 native XML source)") {
    // Spark 4 folded the spark-xml connector into core — one more
    // interchange format the engine reads/writes without extra deps.
    // XML has no long/string distinction on read, so compare through
    // explicit casts of the inferred columns.
    val df = Relational.t(spark, sf0001, "region")
      .select(col("r_regionkey").cast("long").as("r_regionkey"),
        col("r_name"))
    df.write.mode("overwrite").option("rowTag", "region")
      .format("xml").save(s"$tmp/region_xml")
    val back = spark.read.option("rowTag", "region")
      .format("xml").load(s"$tmp/region_xml")
      .select(col("r_regionkey").cast("long"), col("r_name").cast("string"))
      .orderBy("r_regionkey").collect()
      .map(r => (r.getLong(0), r.getString(1))).toList
    val expected = df.orderBy("r_regionkey").collect()
      .map(r => (r.getLong(0), r.getString(1))).toList
    assert(back == expected && back.nonEmpty)
  }

  test("orc round-trip preserves values and pushes filters to the scan") {
    val df = Relational.t(spark, sf0001, "supplier")
    df.write.mode("overwrite").orc(s"$tmp/supplier_orc")
    val back = spark.read.orc(s"$tmp/supplier_orc")
      .filter(col("s_nationkey") === 3)
    val expected = df.filter(col("s_nationkey") === 3)
      .orderBy("s_suppkey").collect().map(_.getLong(0)).toList
    assert(back.orderBy("s_suppkey").collect()
      .map(_.getAs[Long]("s_suppkey")).toList == expected)
    // ORC supports predicate pushdown like parquet — the filter must
    // reach the scan, not evaluate post-read
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("s_nationkey"), plan)
  }

  test("events ts normalization: NTZ-micros and raw-nanos encodings land on identical timestamps") {
    // events.parquet has shipped `ts` two ways across testdata
    // generations (Relational.events): TIMESTAMP(NANOS) surfacing as
    // an epoch-nanos Long under the legacy reader, and naive
    // TIMESTAMP(MICROS) surfacing as TIMESTAMP_NTZ. Both physical
    // encodings must normalize to the SAME plain TIMESTAMP rows —
    // this pins the NTZ branch so a testdata flip can never land on
    // untested code.
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-03-01T10:15:30.123456", 7L, "click", 1.5, "{}"),
      (2L, "2024-07-04T23:59:59.999999", 8L, "view", 2.5, "{}"))
    val base = rows.toDF("event_id", "s", "user_id", "event_type", "value", "props")
    base.withColumn("ts", to_timestamp_ntz(col("s"))).drop("s")
      .write.mode("overwrite").parquet(s"$tmp/ntz/events.parquet")
    base.withColumn("ts",
        unix_micros(to_timestamp(col("s"))) * 1000).drop("s")
      .write.mode("overwrite").parquet(s"$tmp/nanos/events.parquet")
    val ntz = Relational.events(spark, s"$tmp/ntz")
    val nanos = Relational.events(spark, s"$tmp/nanos")
    // the written encodings really are the two branch triggers
    assert(spark.read.parquet(s"$tmp/ntz/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(spark.read.parquet(s"$tmp/nanos/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    // both normalize to plain TIMESTAMP…
    assert(ntz.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(nanos.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // …with identical, UTC-pinned absolute instants (the session tz
    // is UTC; a tz-shifting cast would break this equality)
    def vals(df: org.apache.spark.sql.DataFrame): List[Long] =
      df.orderBy("event_id").select(unix_micros(col("ts")))
        .collect().map(_.getLong(0)).toList
    val expect = rows.map { case (_, s2, _, _, _, _) =>
      val i = java.time.LocalDateTime.parse(s2)
        .toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }.toList
    assert(vals(ntz) == expect)
    assert(vals(nanos) == expect)
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    val df = Relational.t(spark, sf0001, "region")
    df.write.mode("overwrite").parquet(s"$tmp/evo/v1")
    df.withColumn("r_tier", col("r_regionkey") % 2)
      .write.mode("overwrite").parquet(s"$tmp/evo/v2")
    val back = spark.read.option("mergeSchema", "true")
      .parquet(s"$tmp/evo/v1", s"$tmp/evo/v2")
    assert(back.columns.contains("r_tier"))
    assert(back.count() == 2 * df.count())
    // rows from the pre-evolution files surface the new column as null
    assert(back.filter(col("r_tier").isNull).count() == df.count())
  }

  test("compaction: fragmented parquet rewrites to few sorted files, content intact") {
    val df = Relational.t(spark, sf0001, "orders")
    // fragment: 64 shuffled partitions → 64 small files
    df.repartition(64).write.mode("overwrite").parquet(s"$tmp/frag")
    val fragFiles = spark.read.parquet(s"$tmp/frag").inputFiles.length
    assert(fragFiles >= 32, s"fragmentation setup produced only $fragFiles files")
    val n = Sinks.compactParquet(spark, s"$tmp/frag", s"$tmp/compacted",
      targetFileBytes = 512L << 20, sortCols = Seq("o_orderkey"))
    assert(n == 1, s"everything fits one target file, chose $n")
    val back = spark.read.parquet(s"$tmp/compacted")
    assert(back.inputFiles.length == 1)
    // content identical
    assert(back.count() == df.count())
    val a = back.agg(org.apache.spark.sql.functions.sum("o_totalprice")).head.getDouble(0)
    val b = df.agg(org.apache.spark.sql.functions.sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(a - b) < 1e-6)
    // sorted layout: every read split is internally key-ordered (limit
    // + collect would depend on partition interleaving order, which
    // Dataset.limit does not contractually fix)
    val allSorted = back.select("o_orderkey").rdd
      .mapPartitions { it =>
        val keys = it.map(_.getLong(0)).toArray
        Iterator.single(keys.sameElements(keys.sorted))
      }.collect()
    assert(allSorted.forall(identity), "compacted file not internally sorted")
  }

  test("compaction refuses outDir == inDir (overwrite-while-reading loses data)") {
    val df = Relational.t(spark, sf0001, "region")
    df.write.mode("overwrite").parquet(s"$tmp/selfcompact")
    intercept[IllegalArgumentException] {
      Sinks.compactParquet(spark, s"$tmp/selfcompact", s"$tmp/selfcompact")
    }
    // relative vs qualified spelling of the same dir is also caught
    intercept[IllegalArgumentException] {
      Sinks.compactParquet(spark, s"$tmp/selfcompact", s"$tmp/../${new java.io.File(tmp).getName}/selfcompact")
    }
    // source intact after the refusals
    assert(spark.read.parquet(s"$tmp/selfcompact").count() == df.count())
  }

  test("partitioned parquet write prunes partitions on read") {
    val df = Relational.t(spark, sf0001, "orders")
      .withColumn("status", col("o_orderstatus"))
    df.write.mode("overwrite").partitionBy("status").parquet(s"$tmp/orders_part")
    val back = spark.read.parquet(s"$tmp/orders_part").filter(col("status") === "F")
    val plan = back.queryExecution.executedPlan.toString
    assert(back.count() == df.filter(col("o_orderstatus") === "F").count())
    // partition filter must prune at the source, not post-scan
    assert(plan.contains("PartitionFilters: [isnotnull(status"), plan)
  }
}
