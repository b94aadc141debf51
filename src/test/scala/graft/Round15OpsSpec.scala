package graft

import org.apache.spark.sql.functions._
import graft.warehouse.StarWarehouse

/** Round-7-of-build additions: the batched intl warehouse load must be
  * bit-equal to sequential per-batch upserts — same fact rows, same
  * surrogate-id sequences (batch-2-first-seen keys extend batch 1's id
  * range), same dims. */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def intlBatch(rows: Seq[(String, String, String, String, String,
      Int, Double, Double, String)]) =
    rows.toDF("sale_id", "ts0", "date_key", "customer", "sku",
        "pcs", "rate", "gross_amt", "currency")
      .withColumn("ts", to_timestamp(col("ts0")))
      .drop("ts0")

  // batch 2 overlaps batch 1 on s2 (bumped rate = the UPDATE arm),
  // introduces a new customer AND a new sku (append-only id sequences),
  // and carries an in-batch duplicate sale_id (keep-latest arm)
  private def b1 = intlBatch(Seq(
    ("s1", "2024-01-01 10:00:00", "2024-01-01", "alice", "sku_a", 2, 10.0, 20.0, "INR"),
    ("s2", "2024-01-02 10:00:00", "2024-01-02", "bob", "sku_b", 1, 5.0, 5.0, "INR"),
    ("s3", "2024-01-03 10:00:00", "2024-01-03", "carol", "sku_a", 3, 7.0, 21.0, "INR")))

  private def b2 = intlBatch(Seq(
    ("s2", "2024-01-02 10:00:00", "2024-01-02", "bob", "sku_b", 1, 1005.0, 5.0, "INR"),
    ("s4", "2024-01-04 10:00:00", "2024-01-04", "dave", "sku_c", 4, 2.0, 8.0, "INR"),
    ("s4", "2024-01-04 10:00:00", "2024-01-04", "dave", "sku_c", 4, 3.0, 8.0, "INR")))

  private def dump(wh: StarWarehouse): (List[String], List[String], List[String]) = (
    wh.read("fact_international_sales")
      .select(concat_ws("|", col("sale_id"), col("date_key"),
        col("customer_id"), col("product_id"), col("pcs"), col("rate"),
        col("gross_amt"))).as[String].collect().toList.sorted,
    wh.read("dim_customers").select(concat_ws("|",
      col("customer_id"), col("customer_name"))).as[String]
      .collect().toList.sorted,
    wh.read("dim_products").select(concat_ws("|",
      col("product_id"), col("sku"))).as[String].collect().toList.sorted)

  test("batched intl load ≡ sequential upserts (fact, dims, id sequences)") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val seqRoot = "target/tmp/r15_seq_wh"
    val batRoot = "target/tmp/r15_bat_wh"
    Seq(seqRoot, batRoot).foreach(r =>
      fs.delete(new org.apache.hadoop.fs.Path(r), true))

    val whSeq = new StarWarehouse(spark, seqRoot)
    whSeq.upsertFactInternationalSales(b1)
    whSeq.upsertFactInternationalSales(b2)

    val whBat = new StarWarehouse(spark, batRoot)
    whBat.upsertFactInternationalSalesBatches(Seq(b1, b2))

    assert(dump(whBat) === dump(whSeq))
    // and the id fold really extends batch 1's range in sorted order:
    // alice/bob/carol = 1..3 (batch-1 sorted), dave = 4
    val custs = whBat.read("dim_customers")
      .select("customer_id", "customer_name")
      .as[(Long, String)].collect().toMap
    assert(custs === Map(1L -> "alice", 2L -> "bob", 3L -> "carol",
      4L -> "dave"))
    val prods = whBat.read("dim_products")
      .select("product_id", "sku").as[(Long, String)].collect().toMap
    assert(prods === Map(1L -> "sku_a", 2L -> "sku_b", 3L -> "sku_c"))
    // UPDATE arm: s2 carries batch 2's bumped rate
    val s2rate = whBat.read("fact_international_sales")
      .filter(col("sale_id") === "s2").select("rate")
      .as[Double].collect().toList
    assert(s2rate === List(1005.0))
  }

  test("batched load onto an EXISTING warehouse matches sequential too") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val seqRoot = "target/tmp/r15_seq2_wh"
    val batRoot = "target/tmp/r15_bat2_wh"
    Seq(seqRoot, batRoot).foreach(r =>
      fs.delete(new org.apache.hadoop.fs.Path(r), true))
    // seed both warehouses with batch 1 the same way, then apply batch 2
    // + a batch 3 (reusing b1 rows = pure replay no-op) differently
    val whSeq = new StarWarehouse(spark, seqRoot)
    whSeq.upsertFactInternationalSales(b1)
    whSeq.upsertFactInternationalSales(b2)
    whSeq.upsertFactInternationalSales(b1)
    val whBat = new StarWarehouse(spark, batRoot)
    whBat.upsertFactInternationalSales(b1)
    whBat.upsertFactInternationalSalesBatches(Seq(b2, b1))
    assert(dump(whBat) === dump(whSeq))
  }
}
