package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Tables._

/** Core relational query surface — the host-engine capabilities the
  * reference delegates to DuckDB (SURVEY.md §2.2), re-expressed as
  * idiomatic Spark DataFrame ops so Catalyst plans them natively
  * (pushdown, partial aggregation, broadcast joins, AQE).
  *
  * Every query has a total ORDER BY so row order is deterministic, and
  * all double aggregates go through exact decimal arithmetic
  * (see [[graft.Tables.dsum]]) so Spark and the DuckDB oracle agree
  * bit-for-bit regardless of aggregation order.
  */
object CoreQueries {
  private def one: Column = lit(1).cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation -------------------------------------------------
    "q01_pricing_summary" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
            * (one + dec2(col("l_tax")))).cast(DoubleType).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    "q06_forecast_revenue" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n"))
    },
    // Three exact distincts in ONE aggregate would go through
    // Catalyst's multi-DISTINCT Expand rewrite: every input row
    // triples before the exchange — the dominant cost at 100× (the
    // round-8 verdict's one plan-weak query). The scale-safe shape is
    // one two-level partial aggregation per distinct (map-side combine
    // on (flag, key), then a 6-row count) joined on the tiny group
    // key; the fact table is scanned once per distinct but never
    // expanded, and each scan's exchange carries only distinct keys.
    "q09_distinct_agg" -> { (s, d) =>
      val li = lineitem(s, d)
      // COUNT(DISTINCT …) skips rows with a null key; distinct() would
      // keep them, so drop nulls first to preserve SQL semantics.
      // Each distinct is its own two-level aggregation over a
      // COLUMN-PRUNED scan (2-3 columns each) with map-side dedup
      // before its exchange — the shape Catalyst also derives if the
      // branches are phrased over a shared (flag, pk, sk) pre-group
      // (it prunes the unused key straight back out); a materialized
      // shared scan was measured slower (the distinct-triples frame
      // is corpus-sized, so persisting it costs more than the extra
      // pruned scans save).
      def distinctCount(alias: String, keys: String*) =
        li.filter(keys.map(col(_).isNotNull).reduce(_ && _))
          .select("l_returnflag", keys: _*).distinct()
          .groupBy("l_returnflag").agg(count(lit(1)).as(alias))
      val nParts = distinctCount("n_parts", "l_partkey")
      val nSupps = distinctCount("n_supps", "l_suppkey")
      val nPartSupp = distinctCount("n_part_supp", "l_partkey", "l_suppkey")
      val nRows = li.groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
      nParts.join(nSupps, "l_returnflag")
        .join(nPartSupp, "l_returnflag")
        .join(nRows, "l_returnflag")
        .select("l_returnflag", "n_parts", "n_supps", "n_part_supp", "n_rows")
        .orderBy("l_returnflag")
    },
    "q22_case_having" -> { (s, d) =>
      orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy("o_orderstatus", "bucket")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .filter(col("n") > 10)
        .orderBy("o_orderstatus", "bucket")
    },

    // ---- filter shapes (reference O10a-d) ----------------------------
    "q02_filter_shapes" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity").between(5, 10)
          && col("l_returnflag") =!= "A"
          && col("l_linestatus").isin("O", "F")
          && col("l_shipdate") >= lit("2000-01-01").cast("timestamp")
          && (col("l_discount") < 0.03 || col("l_tax") >= 0.07)
          && col("l_orderkey").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_tax", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- joins -------------------------------------------------------
    "q03_top_unshipped" -> { (s, d) =>
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(o("o_orderkey"), o("o_orderdate"))
        .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    "q04_order_priority" -> { (s, d) =>
      // EXISTS via left-semi join (reference host engine capability)
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      o.join(lineitem(s, d), o("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    "q05_region_revenue" -> { (s, d) =>
      val r = region(s, d)
      val n = nation(s, d)
      val c = customer(s, d)
      val o = orders(s, d)
      val l = lineitem(s, d)
      val su = supplier(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey")
          && c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    },
    "q07_anti_join" -> { (s, d) =>
      val bigOrders = orders(s, d).filter(col("o_totalprice") > 150000)
      customer(s, d)
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_without_big_order"),
          dsum(col("c_acctbal")).as("acctbal_total"))
        .orderBy("c_mktsegment")
    },
    "q08_outer_join" -> { (s, d) =>
      val suppByNation = supplier(s, d).groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      val custByNation = customer(s, d).groupBy(col("c_nationkey").as("nk2"))
        .agg(count(lit(1)).as("n_cust"))
      suppByNation
        .join(custByNation, col("nk") === col("nk2"), "full_outer")
        .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy("nationkey")
    },
    "q23_in_subquery" -> { (s, d) =>
      orders(s, d).createOrReplaceTempView("q23_orders")
      customer(s, d).createOrReplaceTempView("q23_customer")
      s.sql("""
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM q23_orders
        WHERE o_custkey IN (SELECT c_custkey FROM q23_customer
                            WHERE c_acctbal > 9000)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
    "q24_correlated_exists" -> { (s, d) =>
      orders(s, d).createOrReplaceTempView("q24_orders")
      lineitem(s, d).createOrReplaceTempView("q24_lineitem")
      s.sql("""
        SELECT o_orderpriority, COUNT(*) AS n
        FROM q24_orders o
        WHERE EXISTS (SELECT 1 FROM q24_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },

    // ---- grouping sets / rollup / cube -------------------------------
    "q10_rollup" -> { (s, d) =>
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    },
    "q11_cube" -> { (s, d) =>
      orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    },
    "q12_grouping_sets" -> { (s, d) =>
      lineitem(s, d).createOrReplaceTempView("q12_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM q12_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    },

    // ---- window functions -------------------------------------------
    // The window key (l_returnflag) has THREE distinct values, so the
    // naive single-window form funnels the whole table through 3
    // reducer tasks (guide §2.5 — skew; fatal at 100 TB). Split:
    // the rank-like trio keeps its window but the `rn <= 5` filter now
    // lets Spark's WindowGroupLimit prune each map partition to its
    // top-5 rows BEFORE the exchange (ntile in the same window blocked
    // that rule — it needs the full partition count, so its presence
    // forced every row through the sort). ntile(4) is instead computed
    // EXACTLY from the per-flag row count n (Spark's NTile: the first
    // n % 4 buckets hold n div 4 + 1 rows, the rest n div 4), attached
    // by a 3-row broadcast join. Bit-identical output — pinned by the
    // unchanged oracle.
    "q13_window_rank" -> { (s, d) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      val li = lineitem(s, d)
      val ranked = li
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .filter(col("rn") <= 5)
      val counts = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      ranked.join(broadcast(counts), Seq("l_returnflag"))
        // NTile(4) closed form over (rn, n); the `otherwise` branch is
        // reachable only when n >= 4 (cut = n when n < 4), so the
        // `div bs` there never sees bs = 0
        .withColumn("quartile",
          when(col("rn") <= expr("(n % 4) * (n div 4 + 1)"),
            expr("(rn + n div 4) div (n div 4 + 1)"))
            .otherwise(expr(
              "n % 4 + (rn - (n % 4) * (n div 4 + 1) + n div 4 - 1)" +
                " div (n div 4)"))
            .cast("int"))
        .select("l_returnflag", "l_orderkey", "l_linenumber",
          "l_extendedprice", "rn", "rk", "drk", "quartile")
        .orderBy("l_returnflag", "rn")
    },
    "q14_window_analytic" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"),
          first("event_type").over(w).as("first_type"),
          last("event_type").over(wFull).as("last_type"))
        .orderBy("user_id", "event_id")
    },
    "q15_window_frames" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val recent = w.rowsBetween(-3, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          sum(dec2(col("value"))).over(running).cast(DoubleType)
            .as("running_total"),
          (sum(dec2(col("value"))).over(recent).cast(DoubleType) /
            count(col("value")).over(recent)).as("moving_avg"))
        .orderBy("user_id", "event_id")
    },
    // Same 3-key-window skew fix as q13, for the RANGE frame: the
    // count-up-to-quantity is a cumulative count over the tiny
    // (flag, quantity) value grid — partial-agg the table map-side to
    // the grid (~150 rows), cumsum the grid, broadcast it back onto
    // the rows (guide §2.5 two-level aggregation). The range frame
    // includes peers, which is exactly what grouping by the quantity
    // VALUE gives, so every row's count is bit-identical (unchanged
    // oracle pins it); the 3-task full-table sort is gone at every
    // scale.
    "q25_window_range" -> { (s, d) =>
      val li = lineitem(s, d)
      val wg = Window.partitionBy("l_returnflag").orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = li.groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("c"))
        .select(col("l_returnflag"), col("l_quantity"),
          sum("c").over(wg).as("n_upto_qty"))
      li.select("l_returnflag", "l_orderkey", "l_linenumber",
          "l_quantity")
        .join(broadcast(cum), Seq("l_returnflag", "l_quantity"))
        .select("l_returnflag", "l_orderkey", "l_linenumber",
          "l_quantity", "n_upto_qty")
        .orderBy("l_returnflag", "l_quantity", "l_orderkey",
          "l_linenumber")
    },

    // ---- sort / limit / top-k ---------------------------------------
    "q16_topk" -> { (s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // ---- set operations ---------------------------------------------
    "q17_setops" -> { (s, d) =>
      val seg = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val big = orders(s, d).filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("custkey"))
      val both = seg.intersect(big).withColumn("tag", lit("both"))
      val segOnly = seg.except(big).withColumn("tag", lit("seg_only"))
      both.unionByName(segOnly)
        .select("tag", "custkey")
        .orderBy("tag", "custkey")
    },

    // ---- scalar functions -------------------------------------------
    "q18_string_funcs" -> { (s, d) =>
      part(s, d)
        .filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          substring(col("p_type"), 1, 3).as("type3"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "widget", "gadget").as("renamed"),
          trim(lit("  pad  ")).as("trimmed"))
        .orderBy("p_partkey")
    },
    "q19_date_funcs" -> { (s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")).as("days_to_2002"))
        .filter(col("yr") === 1997)
        .orderBy("o_orderkey")
    },
    "q20_math_funcs" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("qty_dev"),
          floor(col("l_extendedprice") / 1000).cast(LongType).as("price_k"),
          ceil(col("l_discount") * 100).cast(LongType).as("disc_pct_ceil"),
          floor(col("l_tax") * 100).cast(LongType).as("tax_pct_floor"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"),
          (col("l_orderkey") % 7).as("key_mod7"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    "q21_json" -> { (s, d) =>
      // widened: per-row JSON parsing downstream of the 1-partition
      // scan (the r19 widen rule's winning shape)
      graft.Tables.widen(events(s, d))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .filter(col("k") > 50)
        .orderBy("event_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q06_forecast_revenue" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 24""",
    "q09_distinct_agg" -> """
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q22_case_having" -> """
      SELECT o_orderstatus,
             CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 150000 THEN 'medium'
                  ELSE 'large' END AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY 1, 2 HAVING COUNT(*) > 10
      ORDER BY o_orderstatus, bucket""",
    "q02_filter_shapes" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, l_returnflag
      FROM lineitem
      WHERE l_quantity BETWEEN 5 AND 10
        AND l_returnflag <> 'A'
        AND l_linestatus IN ('O','F')
        AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        AND (l_discount < 0.03 OR l_tax >= 0.07)
        AND l_orderkey IS NOT NULL
      ORDER BY l_orderkey, l_linenumber""",
    "q03_top_unshipped" -> """
      SELECT o_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10""",
    "q04_order_priority" -> """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q05_region_revenue" -> """
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY n_name ORDER BY n_name""",
    "q07_anti_join" -> """
      SELECT c_mktsegment, COUNT(*) AS n_without_big_order,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_total
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q08_outer_join" -> """
      SELECT COALESCE(s.nk, c.nk2) AS nationkey,
             COALESCE(s.n_supp, 0) AS n_supp,
             COALESCE(c.n_cust, 0) AS n_cust
      FROM (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
            FROM supplier GROUP BY s_nationkey) s
      FULL OUTER JOIN (SELECT c_nationkey AS nk2, COUNT(*) AS n_cust
            FROM customer GROUP BY c_nationkey) c
        ON s.nk = c.nk2
      ORDER BY nationkey""",
    "q23_in_subquery" -> """
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q24_correlated_exists" -> """
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q10_rollup" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q11_cube" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q12_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q13_window_rank" -> """
      SELECT * FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
          ROW_NUMBER() OVER w AS rn,
          RANK() OVER w AS rk,
          DENSE_RANK() OVER w AS drk,
          NTILE(4) OVER w AS quartile
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
      ) WHERE rn <= 5
      ORDER BY l_returnflag, rn""",
    "q14_window_analytic" -> """
      SELECT user_id, event_id, value,
        LAG(value, 1) OVER w AS prev_value,
        LEAD(value, 1) OVER w AS next_value,
        FIRST_VALUE(event_type) OVER w AS first_type,
        LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      ORDER BY user_id, event_id""",
    "q15_window_frames" -> """
      SELECT user_id, event_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
          (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_total,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
          (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        / COUNT(value) OVER
          (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_avg
      FROM events
      ORDER BY user_id, event_id""",
    "q25_window_range" -> """
      SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_upto_qty
      FROM lineitem
      ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""",
    "q16_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20""",
    "q17_setops" -> """
      SELECT 'both' AS tag, custkey FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000)
      UNION ALL
      SELECT 'seg_only' AS tag, custkey FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000)
      ORDER BY tag, custkey""",
    "q18_string_funcs" -> """
      SELECT p_partkey,
        UPPER(p_name) AS uname,
        LOWER(p_brand) AS lbrand,
        SUBSTRING(p_type, 1, 3) AS type3,
        LENGTH(p_name) AS name_len,
        CONCAT_WS('-', p_brand, p_type) AS brand_type,
        REGEXP_REPLACE(p_name, 'widget', 'gadget', 'g') AS renamed,
        TRIM('  pad  ') AS trimmed
      FROM part
      WHERE p_name LIKE '%widget%'
      ORDER BY p_partkey""",
    "q19_date_funcs" -> """
      SELECT o_orderkey,
        YEAR(o_orderdate) AS yr,
        MONTH(o_orderdate) AS mo,
        DAYOFMONTH(o_orderdate) AS dom,
        QUARTER(o_orderdate) AS qtr,
        strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
        DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
      FROM orders
      WHERE YEAR(o_orderdate) = 1997
      ORDER BY o_orderkey""",
    "q20_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
        ABS(l_quantity - 25) AS qty_dev,
        CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
        CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        CAST(FLOOR(l_tax * 100) AS BIGINT) AS tax_pct_floor,
        SQRT(l_quantity) AS qty_sqrt,
        l_quantity * l_quantity AS qty_sq,
        l_orderkey % 7 AS key_mod7
      FROM lineitem
      WHERE l_orderkey % 100 = 0
      ORDER BY l_orderkey, l_linenumber""",
    "q21_json" -> """
      SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
      FROM events
      WHERE CAST(props->>'k' AS BIGINT) > 50
      ORDER BY event_id"""
  )
}
