package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Baseline relational competence over the driver's TPC-H-ish tables.
  * Every aggregate that feeds the DuckDB oracle uses decimal arithmetic
  * internally (exact, order-insensitive) — but the OUTPUT physical type is
  * pinned to plain DOUBLE on both sides: Spark's decimal sums widen
  * precision differently than DuckDB's (28,2 vs 38,2), and the driver's
  * hash normalizes the two parquet decimal encodings differently even when
  * the values are identical (round-1 verdict). An exact decimal converted
  * to its nearest double is deterministic IEEE on both engines, so the
  * float64 bits — and their hash — match exactly. Timestamps in outputs
  * are formatted as strings for the same reason (INT96 vs INT64 µs). */
object RelationalQueries {

  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** Pricing summary (TPC-H Q1 shape): group-aggregate with decimal sums.
    * Scale: pure map-side-combinable agg over a pruned 5-column scan. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("decimal(18,2)").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_discount").cast("decimal(18,2)").as("disc"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("qty")).cast("double").as("sum_qty"),
        sum(col("price")).cast("double").as("sum_base_price"),
        sum(col("price") * (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") - col("disc")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Top-10 revenue orders in a date window (TPC-H Q3 shape): selective
    * join + agg + deterministic top-k (ties broken by key). Scale: filter
    * pushdown on both scans, shuffle only surviving orders. */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = read(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val li = read(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("rev"))
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev")).as("rev_dec")) // exact decimal for the ordering
      .orderBy(col("rev_dec").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate"),
        col("rev_dec").cast("double").as("revenue"))
  }

  /** Revenue per nation (TPC-H Q5 shape): fact table joined to broadcast
    * dimension chain customer→nation→region. Scale: dims are tiny →
    * explicit broadcast keeps the plan shuffle-free on the build side;
    * only the fact-side agg shuffles. */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val customer = read(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nation = read(spark, dir, "nation")
    val region = read(spark, dir, "region")
    val orders = read(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("price")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(cast(l_quantity AS decimal(18,2)))::DOUBLE AS sum_qty,
        |  sum(cast(l_extendedprice AS decimal(18,2)))::DOUBLE AS sum_base_price,
        |  sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2))))::DOUBLE AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |  sum(rev)::DOUBLE AS revenue FROM (
        |  SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
        |    cast(l.l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l.l_discount AS decimal(18,2))) AS rev
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1997-01-01')
        |GROUP BY 1, o_orderdate ORDER BY sum(rev) DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT r.r_name, n.n_name,
        |  sum(cast(o.o_totalprice AS decimal(18,2)))::DOUBLE AS revenue,
        |  count(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
