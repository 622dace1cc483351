#!/usr/bin/env python3
"""Prototype the w/a/j/s/p-series oracles in DuckDB before writing Scala.
Run: python3 tools/proto_analytics.py [sfdir]"""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["events", "orders", "customer", "supplier", "nation", "documents"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

ORACLES = {
    "w01_lag_delta": """
SELECT event_id, ROUND(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
FROM events ORDER BY event_id LIMIT 200""",
    "w02_moving_avg": """
SELECT event_id, ROUND(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS mavg
FROM events ORDER BY event_id LIMIT 200""",
    "w03_cumulative": """
SELECT event_id, ROUND(sum(value) OVER w, 2) AS cum_value, row_number() OVER w AS rn
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_id LIMIT 200""",
    "w04_rank_tiles": """
SELECT event_id, rank() OVER w AS rnk, dense_rank() OVER w AS drnk, ntile(4) OVER w AS tile
FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
ORDER BY event_id LIMIT 200""",
    "w05_range_frame": """
SELECT event_id, ROUND(sum(value) OVER (PARTITION BY event_type
  ORDER BY epoch_us(ts) // 1000000
  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 2) AS sum_10min
FROM events ORDER BY event_id LIMIT 200""",
    "a01_hll_audit": """
SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS within_10pct
FROM events GROUP BY event_type ORDER BY event_type""",
    "a02_quantile_audit": """
SELECT event_type, ROUND(quantile_cont(value, 0.5), 2) AS p50_exact, TRUE AS within_tol
FROM events GROUP BY event_type ORDER BY event_type""",
    "j01_anti_join": """
SELECT c_mktsegment, count(*) AS n_childless FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "j02_banded_range_join": """
SELECT a.user_id, count(*) AS n_pairs
FROM events a JOIN events b ON a.user_id = b.user_id
  AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
  AND epoch_us(b.ts) // 1000000 - epoch_us(a.ts) // 1000000 <= 300
GROUP BY a.user_id ORDER BY a.user_id""",
    "j03_full_outer": """
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nationkey""",
    "j04_top_per_group": """
SELECT o_orderpriority, rnk, o_orderkey, ROUND(o_totalprice, 2) AS price FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""",
    "j05_pivot_status": """
SELECT o_orderpriority,
  count(*) FILTER (o_orderstatus = 'F') AS F,
  count(*) FILTER (o_orderstatus = 'O') AS O,
  count(*) FILTER (o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "s01_salted_agg": """
SELECT event_type, ROUND(sum(value), 2) AS sum_value, count(value) AS n,
  ROUND(min(value), 2) AS min_value, ROUND(max(value), 2) AS max_value
FROM events GROUP BY event_type ORDER BY event_type""",
    "p01_train_split": """
SELECT lang,
  CASE WHEN ('0x'||substr(md5('split:'||doc_id::VARCHAR),1,15))::BIGINT % 100 < 80 THEN 'train'
       WHEN ('0x'||substr(md5('split:'||doc_id::VARCHAR),1,15))::BIGINT % 100 < 90 THEN 'val'
       ELSE 'test' END AS split,
  count(*) AS n
FROM documents GROUP BY lang, split ORDER BY lang, split""",
    "p02_len_histogram": """
SELECT LEAST(length(text) // 50, 11)::BIGINT AS bucket, count(*) AS n
FROM documents GROUP BY bucket ORDER BY bucket""",
}

for name, q in ORACLES.items():
    try:
        rows = con.sql(q).fetchall()
        print(f"{name}: {len(rows)} rows, head={rows[:2]}")
    except Exception as e:
        print(f"{name}: FAIL {e}")
