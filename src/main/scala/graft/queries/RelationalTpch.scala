package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Kernels
import graft.tables.Tables
import Relational.{WoeLn, WoeShare, VolText, PchartP, PchartUcl, PchartLcl,
  ModularityText, AssortText, olsSelect, manifestOracleSql}

/** TPC-H queries expressible over the driver testdata (the 13 of 22
  * whose columns exist), each with its DuckDB oracle.
  *
  * Split from the single Relational object (r16 maintainability pass):
  * entries and oracle SQL are byte-identical and compose back into the
  * driver map through [[Relational]].
  */
object RelationalTpchQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // TPC-H Q5 (local supplier volume): the 6-way join optimizer
    // stressor — customer x orders x lineitem x supplier x nation x
    // region with the customer-nation = supplier-nation correlation
    // predicate. Declared as plain DataFrame joins: Catalyst prunes
    // columns into every scan, pushes the region/date filters down,
    // and broadcasts the three dimension tables (nation/region tiny,
    // supplier SF-bounded) so only the orders-lineitem join shuffles.
    // Revenue sums round 2dp; ordering on the rounded value with the
    // nation tie-break.
    "q185_tpch_q5" -> ((s, d) => {
      val asia = Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey") &&
            expr("o_orderdate >= timestamp'1996-01-01'") &&
            expr("o_orderdate < timestamp'1997-01-01'"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q3 (shipping priority, adapted to the testdata schema:
    // o_orderpriority stands in for the absent o_shippriority): the
    // classic filter-pushdown + join-order stressor — segment filter
    // on customer (pushed to the scan), date filters on both orders
    // and lineitem, 3-way join, per-order revenue rollup, top 10.
    // Revenue follows the q185 float contract (round(sum, 2)); the
    // total order is (rounded revenue DESC, l_orderkey).
    "q206_tpch_q3" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(expr("o_orderdate < timestamp'1997-06-01'"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(expr("l_shipdate > timestamp'1997-06-01'"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)),

    // TPC-H Q10 (returned-item reporting, adapted: the testdata
    // customer has no address/phone/comment columns): customers who
    // returned items in a quarter, ranked by lost revenue. The
    // one-quarter date band prunes orders before the join; returnflag
    // prunes lineitem at the scan; nation is a broadcast dim.
    "q207_tpch_q10" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(expr("o_orderdate >= timestamp'1997-10-01'") &&
                expr("o_orderdate < timestamp'1998-01-01'"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)),

    // TPC-H Q6 (forecasting revenue change): the pure scan-pushdown
    // showcase — three filters that must all reach the parquet scan
    // (PushedFilters on l_shipdate/l_discount/l_quantity; ReadSchema
    // prunes to 4 columns) feeding one global aggregate, no shuffle
    // beyond the 1-row combine. The discount band compares the SAME
    // parquet doubles against identically-parsed literals on both
    // engines, so the boundary is bit-safe; revenue follows the q185
    // 2dp contract.
    "q220_tpch_q6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(expr("l_shipdate >= timestamp'1997-01-01'") &&
                expr("l_shipdate < timestamp'1998-01-01'") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_rows"),
             round(sum(col("l_extendedprice") * col("l_discount")), 2)
               .as("revenue"))
        .orderBy("n_rows")),

    // TPC-H Q13 (customer distribution): the LEFT-join-then-histogram
    // shape — orders per customer including ZERO-order customers
    // (count(o_orderkey) over a left join counts non-null matches, so
    // no-order customers land in the c_count = 0 bucket), with the
    // classic filtered-join condition (exclude one priority class
    // INSIDE the join, not after it — a post-filter would drop the
    // zero bucket). Exact integers throughout.
    "q221_tpch_q13" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q19 (discounted revenue, adapted to the testdata schema:
    // brand × size-band × quantity-band branches stand in for the
    // absent container/shipmode columns): the DISJUNCTIVE-predicate
    // stressor — three OR branches that each touch BOTH join sides,
    // so the optimizer must keep the join keys clean and push what it
    // can (the p_brand IN superset and quantity range are pushable;
    // the per-branch conjunctions evaluate post-join). q185 float
    // contract on revenue.
    "q222_tpch_q19" -> ((s, d) => {
      val branch1 = col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
      val branch2 = col("p_brand") === "Brand#2" &&
        col("p_size").between(10, 30) && col("l_quantity").between(10, 20)
      val branch3 = col("p_brand") === "Brand#3" &&
        col("p_size").between(20, 50) && col("l_quantity").between(20, 30)
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(branch1 || branch2 || branch3)
        .agg(count(lit(1)).as("n_rows"),
             round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
               .as("revenue"))
        .orderBy("n_rows")
    }),

    // TPC-H Q22 (global sales opportunity, adapted: nation buckets
    // stand in for phone country codes): customers whose balance
    // exceeds the average POSITIVE balance and who never ordered.
    // The threshold is the boundary trap: comparing a double balance
    // against a float average would flip boundary customers on ulp
    // noise, so the comparison is EXACT integer cross-multiplication
    // — cents·n > sum_cents — over exact cents totals. The no-order
    // test is a left-anti join (never NOT IN, which at 100 TB is a
    // broadcast-nested-loop trap and null-hostile).
    "q223_tpch_q22" -> ((s, d) => {
      val cents = expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
      val cust = graft.ops.Staging.stage(
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), cents.as("__cents")))
      val pos = cust.filter(col("__cents") > 0)
        .agg(sum("__cents").as("__sum"), count(lit(1)).as("__n"))
      cust.crossJoin(broadcast(pos))
        .filter(col("__cents") * col("__n") > col("__sum"))
        .join(Tables.orders(s, d).select(col("o_custkey")),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_custs"), sum("__cents").as("total_cents"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("n_custs"), col("total_cents"))
        .orderBy("nation")
    }),

    // TPC-H Q7 (volume shipping): bidirectional nation-pair trade by
    // ship year — the DOUBLE-dim-alias join (nation joined twice
    // under different roles) plus a symmetric pair predicate. q185
    // float contract; the year comes from l_shipdate on both sides.
    "q224_tpch_q7" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("__ck"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(expr("l_shipdate >= timestamp'1996-01-01'") &&
                expr("l_shipdate < timestamp'1998-01-01'"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("__sk"))
        .join(n2, col("c_nationkey") === col("__ck"))
        .filter((col("supp_nation") === "NATION_1" &&
                 col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" &&
                 col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
                 year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 (national market share): NATION_3's share of ASIA's
    // PROMO-part order volume per year. The share is a ratio of two
    // float sums (both computed over identical row sets) rounded at
    // 6dp — the q14 rule holds because the true ratio can't sit on an
    // exact decimal half.
    "q225_tpch_q8" -> ((s, d) => {
      val vol = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
              col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
        .select(year(col("o_orderdate")).as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("__v"),
          col("n_name"))
      vol.groupBy("o_year")
        .agg(round(sum(when(col("n_name") === "NATION_3", col("__v"))
               .otherwise(lit(0.0))) / sum(col("__v")), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q14 (promotion effect): PROMO share of monthly revenue —
    // the conditional-aggregate-over-one-scan shape; months anchored
    // by date_format (identical string grid both engines).
    "q226_tpch_q14" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(expr("l_shipdate >= timestamp'1997-01-01'") &&
                expr("l_shipdate < timestamp'1997-07-01'"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(round(sum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount")))
              .otherwise(lit(0.0))) * 100.0 /
             sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("promo_pct"))
        .orderBy("month")),

    // TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    // the maximum WITH ties — the filter compares against the 1-row
    // max of the identical raw double revenue (the q204 argmax
    // contract: same doubles, same max, same selected rows), display
    // rounds at 2dp.
    "q227_tpch_q15" -> ((s, d) => {
      val rev = graft.ops.Staging.stage(
        Tables.lineitem(s, d)
          .filter(expr("l_shipdate >= timestamp'1997-01-01'") &&
                  expr("l_shipdate < timestamp'1997-04-01'"))
          .groupBy("l_suppkey")
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("__rev")))
      rev.crossJoin(broadcast(rev.agg(max("__rev").as("__mx"))))
        .filter(col("__rev") === col("__mx"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
                round(col("__rev"), 2).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 (small-quantity-order revenue): lineitems under 20%
    // of their part's average quantity. The threshold is the float
    // trap: qty < 0.2·avg flips boundary rows on division ulps, so
    // the comparison is EXACT — qty·5·cnt < sum_qty with integral-
    // double quantities (exact in IEEE) and exact counts, cross-
    // multiplied. Yearly-average display division by 7.0 at 2dp.
    "q228_tpch_q17" -> ((s, d) => {
      val pavg = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("__pk"))
        .agg(sum("l_quantity").as("__sq"), count(lit(1)).as("__cnt"))
      Tables.lineitem(s, d)
        .join(pavg, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity") * 5.0 * col("__cnt") < col("__sq"))
        .agg(count(lit(1)).as("n_rows"),
             round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
        .orderBy("n_rows")
    }),

    // TPC-H Q18 (large-volume customers): the group-having semi-join
    // stressor — orders whose line quantities sum past a threshold,
    // re-joined to customer and lineitem for the detail rollup. The
    // HAVING frame is one exchange on l_orderkey; its key set then
    // semi-joins the fact scan. Quantities are integral doubles, so
    // their sums are exact in IEEE and the >300 threshold is
    // boundary-safe; ordering is on the 2dp-rounded total price with
    // the order key as tie-break.
    "q200_tpch_q18" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("__q"))
        .filter(col("__q") > 300)
        .select(col("l_orderkey").as("__bk"))
      Tables.lineitem(s, d)
        .join(big, col("l_orderkey") === col("__bk"), "left_semi")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),
  )

  val oracles: Map[String, String] = Map(

    "q185_tpch_q5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q200_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |JOIN big USING (l_orderkey)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q224_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q225_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(sum(CASE WHEN n_name = 'NATION_3'
        |                 THEN l_extendedprice * (1 - l_discount)
        |                 ELSE 0.0 END)
        |        / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem, part, orders, customer, nation, region
        |WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q226_tpch_q14" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |  round(sum(CASE WHEN p_type = 'PROMO'
        |                 THEN l_extendedprice * (1 - l_discount)
        |                 ELSE 0.0 END) * 100.0
        |        / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01'
        |GROUP BY 1 ORDER BY month""".stripMargin,

    "q227_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(l_extendedprice * (1 - l_discount)) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1),
        |mx AS (SELECT max(r) AS m FROM rev)
        |SELECT s_suppkey, s_name, round(r, 2) AS total_revenue
        |FROM rev, mx
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r = m
        |ORDER BY s_suppkey""".stripMargin,

    "q228_tpch_q17" ->
      """WITH p AS (
        |  SELECT l_partkey AS pk, sum(l_quantity) AS sq,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN p ON l_partkey = pk
        |WHERE l_quantity * 5.0 * cnt < sq
        |ORDER BY n_rows""".stripMargin,

    "q221_tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q222_tpch_q19" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 30)
        |ORDER BY n_rows""".stripMargin,

    "q223_tpch_q22" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |t AS (
        |  SELECT CAST(sum(cents) AS BIGINT) AS s,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM c WHERE cents > 0)
        |SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_custs,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM c, t
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE cents * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name ORDER BY nation""".stripMargin,

    "q220_tpch_q6" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24
        |ORDER BY n_rows""".stripMargin,

    "q206_tpch_q3" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q207_tpch_q10" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1997-10-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
  )
}
