package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CleanFns._

/** S5 + G7–G13 + F4–F6: the schema-on-read normalization front end
  * (reference: pipeline/sources/ecommerce/kaggle_amazon_sales_loader.py).
  *
  * Raw e-commerce CSVs arrive with inconsistent headers, mixed date formats,
  * currency-decorated numbers, and outliers; the loader coalesces candidate
  * columns (`_pick`, :89-93), parses timestamps through a format chain with
  * noon-pinning (:33-61), scrubs money (:95-104), derives missing amounts
  * (:158-159), skips outliers (:161-166), and mints deterministic sha-ids
  * (:28-31). All of that is columnar here — one projection + one filter,
  * no shuffles, scan-speed at any scale.
  */
object KaggleNormalizer {

  /** Candidate header lists (loader:141-156, 218-223). */
  val OrderIdCands = Seq("Order ID", "order_id", "Order Id", "ORDER ID")
  val DateCands = Seq("Date", "DATE", "Order Date", "date")
  val QtyCands = Seq("Qty", "QTY", "PCS", "Quantity")
  val AmountCands = Seq("Amount", "AMOUNT", "GROSS AMT", "Total")
  val RateCands = Seq("Rate", "RATE", "Unit Price")
  val CurrencyCands = Seq("currency", "Currency")
  val SkuCands = Seq("SKU", "Sku", "sku")
  val CustomerCands = Seq("CUSTOMER", "Customer", "customer_name")

  private def pick(df: DataFrame, cands: Seq[String]): Column = {
    val present = cands.filter(df.columns.contains)
    if (present.isEmpty) lit(null).cast("string")
    else pickFirst(present.map(col): _*)
  }

  /** G8: timestamp-token resolution with whole-row fallback (loader:63-87) —
    * candidate date columns first; failing those, scan every OTHER string
    * column for an embedded `MM-DD-YY` token. Columnar (one coalesce chain),
    * so the "scan" costs one projection, not a row loop. */
  def pickTimestampToken(df: DataFrame, cands: Seq[String]): Column = {
    val tokenRe = "\\d{2}-\\d{2}-\\d{2}"
    val fromCands = pick(df, cands)
    val scanned = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType &&
        !cands.contains(f.name) =>
        nullif(regexp_extract(col(f.name), tokenRe, 0), lit(""))
    }.toSeq
    coalesce(nullifBlank(fromCands) +: scanned: _*)
  }

  /** Amazon-style rows → canonical purchase events (loader:120-187).
    * Returns (events, stats) where stats counts skips by cause. */
  def normalizeAmazonEvents(raw: DataFrame,
                            amountCap: Double = 250000.0): DataFrame = {
    val staged = raw.select(
      pick(raw, OrderIdCands).as("order_id"),
      multiFormatTs(pick(raw, DateCands), KaggleTsFormats).as("ts"),
      intViaFloat(pick(raw, QtyCands)).as("qty"),
      moneyScrub(pick(raw, AmountCands)).as("amount_raw"),
      moneyScrub(pick(raw, RateCands)).as("unit_price"),
      defaultFill(pick(raw, CurrencyCands), "USD").as("currency"))
    staged
      .filter(col("ts").isNotNull) // F6: no-timestamp skip (:136-139)
      .withColumn("amount",        // G12: derived amount fallback (:158-159)
        when(col("amount_raw") === 0.0 && col("unit_price") > 0.0 &&
          col("qty") > 0.0, col("qty") * col("unit_price"))
          .otherwise(col("amount_raw")))
      .filter(col("amount") <= amountCap) // F5: outlier guardrail (:161-166)
      .select(
        hashId(col("order_id"), col("ts").cast("string"), col("amount"))
          .as("event_id"), // G13 (:170)
        col("ts"), lit("purchase").as("event"),
        col("order_id"), col("amount"), col("qty"),
        col("unit_price"), col("currency"))
  }

  /** Loader-style skip-cause accounting (loader:124-129, 194-199; surfaced
    * in the loader's report JSON, loader:261-298): ONE conditional-count
    * aggregate classifies every raw row by the same precedence the
    * normalizer's filters apply — no second pass, and written +
    * skipped_* = rows_total reconciles by construction. Amazon rows have
    * no bad-date counter in the reference (its date check lives inside
    * the ts parse), so that column is structurally 0 here. */
  def amazonStats(raw: DataFrame, amountCap: Double = 250000.0): DataFrame = {
    val ts = multiFormatTs(pick(raw, DateCands), KaggleTsFormats)
    val qty = intViaFloat(pick(raw, QtyCands))
    val amountRaw = moneyScrub(pick(raw, AmountCands))
    val unit = moneyScrub(pick(raw, RateCands))
    val amount = when(amountRaw === 0.0 && unit > 0.0 && qty > 0.0,
      qty * unit).otherwise(amountRaw)
    val cls = when(ts.isNull, "no_ts")
      .when(amount > amountCap, "outlier")
      .otherwise("written")
    statsAgg(raw.select(cls.as("__cls")))
  }

  /** Intl skip accounting (loader:194-199): a present-but-malformed date
    * token counts as skipped_bad_date_value (loader:208-211); a missing
    * token falls through to the ts parse and counts as skipped_no_ts,
    * exactly the reference's precedence. */
  def intlStats(raw: DataFrame, grossCap: Double = 5000000.0): DataFrame = {
    val dateTok = pick(raw, DateCands)
    val tokOk = dateTok.rlike("^\\d{2}-\\d{2}-\\d{2}$")
    val ts = multiFormatTs(dateTok, Seq("MM-dd-yy"))
    val gross = moneyScrub(pick(raw, AmountCands))
    val cls = when(nullifBlank(dateTok).isNotNull && !tokOk, "bad_date")
      .when(ts.isNull, "no_ts")
      .when(gross > grossCap, "outlier")
      .otherwise("written")
    statsAgg(raw.select(cls.as("__cls")))
  }

  private def statsAgg(cls: DataFrame): DataFrame =
    cls.agg(
      count(lit(1)).as("rows_total"),
      sum(when(col("__cls") === "written", 1L).otherwise(0L)).as("written"),
      sum(when(col("__cls") === "bad_date", 1L).otherwise(0L))
        .as("skipped_bad_date_value"),
      sum(when(col("__cls") === "no_ts", 1L).otherwise(0L))
        .as("skipped_no_ts"),
      sum(when(col("__cls") === "outlier", 1L).otherwise(0L))
        .as("skipped_amount_outlier"))

  /** International-sales rows → canonical sale records (loader:189-249).
    * F4: rows kept only when the date token matches `^\d{2}-\d{2}-\d{2}$`
    * (:33, 207-211). */
  def normalizeInternationalSales(raw: DataFrame,
                                  grossCap: Double = 5000000.0): DataFrame = {
    val dateTok = pick(raw, DateCands)
    val staged = raw
      .filter(dateTok.rlike("^\\d{2}-\\d{2}-\\d{2}$"))
      .select(
        dateTok.as("date_tok"),
        multiFormatTs(dateTok, Seq("MM-dd-yy")).as("ts"),
        defaultFill(pick(raw, CustomerCands), "unknown_customer")
          .as("customer"),
        defaultFill(pick(raw, SkuCands), "unknown_sku").as("sku"),
        intViaFloat(pick(raw, QtyCands)).as("pcs"),
        moneyScrub(pick(raw, RateCands)).as("rate"),
        moneyScrub(pick(raw, AmountCands)).as("gross_amt"),
        defaultFill(pick(raw, CurrencyCands), "INR").as("currency"))
    staged
      .filter(col("ts").isNotNull && col("gross_amt") <= grossCap)
      .select(
        hashId(col("customer"), col("sku"), col("date_tok"),
          col("gross_amt")).as("sale_id"),
        col("ts"),
        date_format(col("ts"), "yyyy-MM-dd").as("date_key"),
        col("customer"), col("sku"), col("pcs"), col("rate"),
        col("gross_amt"), col("currency"))
  }
}
