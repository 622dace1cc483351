#!/usr/bin/env python3
"""Round-5 oracle prototypes (DuckDB side) — chunking/packing (c01-c03),
denylist scrub + vocab coverage (t09/t10), batch-ANN recall (v12),
salted-join parity (s02), SQL-text grouping sets / lateral (q34/q35).
Run: python3 tools/proto_round5.py [sfdir]"""
import sys
import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["documents", "embeddings", "events", "customer", "orders"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

oc01 = """
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
c AS (SELECT doc_id, list_transform(generate_series(1, len(toks), 24),
        s -> md5(array_to_string(toks[s:s+31], ' '))) hs
      FROM t)
SELECT doc_id, len(hs) AS n_chunks, len(list_distinct(hs)) AS n_distinct
FROM c ORDER BY doc_id LIMIT 100
"""

oc02 = """
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
c AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(toks), 24),
        s -> md5(array_to_string(toks[s:s+31], ' '))))) h
      FROM t)
SELECT h, count(*) AS n_docs FROM c GROUP BY h HAVING count(*) > 1
ORDER BY n_docs DESC, h LIMIT 20
"""

oc03 = """
WITH t AS (SELECT doc_id, lang, len(string_split(text,' ')) nt FROM documents),
b AS (SELECT lang, nt,
        (sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt) // 512 AS bin
      FROM t)
SELECT lang, bin::BIGINT AS bin, count(*) AS n_docs, sum(nt)::BIGINT AS n_tokens,
  ROUND(sum(nt)::DOUBLE / 512, 3) AS fill
FROM b GROUP BY lang, bin ORDER BY lang, bin
"""

ot09 = r"""
WITH r AS (SELECT lang, text,
  regexp_replace(text, '\b(customer|spark|vector)\b', '[X]', 'g') red,
  len(regexp_extract_all(text, '\b(customer|spark|vector)\b')) nhit
  FROM documents)
SELECT lang, count(*) AS n_docs,
  sum(CASE WHEN nhit > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_hit,
  sum(nhit)::BIGINT AS n_redactions,
  ROUND(avg(length(text) - length(red)), 2) AS avg_len_drop
FROM r GROUP BY lang ORDER BY lang
"""

ot10 = """
WITH tok AS (SELECT unnest(string_split(text,' ')) term FROM documents),
tc AS (SELECT term, count(*) c FROM tok GROUP BY term),
rk AS (SELECT term, c,
        row_number() OVER (ORDER BY c DESC, term) rn,
        sum(c) OVER (ORDER BY c DESC, term ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
        sum(c) OVER () total
      FROM tc)
SELECT rn AS rank, term, cum::BIGINT AS cum_tokens,
  ROUND(cum::DOUBLE / total, 4) AS coverage
FROM rk WHERE rn IN (1, 5, 10, 20, 30) ORDER BY rn
"""

ov12 = """
WITH n AS (SELECT vec_id, list_transform(embedding, x->x::DOUBLE) e FROM embeddings),
b AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x->x*x))) nrm,
  (CASE WHEN e[1] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN e[2] >= 0 THEN '1' ELSE '0' END) ||
  (CASE WHEN e[3] >= 0 THEN '1' ELSE '0' END) || (CASE WHEN e[4] >= 0 THEN '1' ELSE '0' END) bucket FROM n),
q AS (SELECT vec_id qid, e qe, nrm qn, bucket qb FROM b WHERE vec_id < 5),
exact AS (SELECT qid, vec_id FROM (
  SELECT qid, b.vec_id,
    row_number() OVER (PARTITION BY qid ORDER BY
      ROUND(list_sum(list_transform(list_zip(e, qe), x -> x[1]*x[2]))/(nrm*qn), 4) DESC, b.vec_id) rn
  FROM b, q WHERE b.vec_id != q.qid) WHERE rn <= 3),
ann AS (SELECT qid, vec_id FROM (
  SELECT qid, b.vec_id,
    row_number() OVER (PARTITION BY qid ORDER BY
      ROUND(list_sum(list_transform(list_zip(e, qe), x -> x[1]*x[2]))/(nrm*qn), 4) DESC, b.vec_id) rn
  FROM b JOIN q ON b.bucket = q.qb AND b.vec_id != q.qid) WHERE rn <= 3)
SELECT exact.qid, 3::BIGINT AS k, count(ann.vec_id) AS n_hits,
  ROUND(count(ann.vec_id)::DOUBLE / 3, 2) AS recall
FROM exact LEFT JOIN ann ON exact.qid = ann.qid AND exact.vec_id = ann.vec_id
GROUP BY exact.qid ORDER BY exact.qid
"""

os02 = """
SELECT c_mktsegment, count(*) AS n, ROUND(sum(value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

# q34/q35: ONE ANSI text for both engines (q27 trick) — also run through
# spark.sql verbatim, so no engine-specific syntax allowed.
oq34 = """
SELECT o_orderpriority AS pri, o_orderstatus AS st,
  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
  COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), (o_orderstatus), ())
ORDER BY g_pri, g_st, pri NULLS FIRST, st NULLS FIRST
"""

oq35 = """
SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS price
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
ORDER BY c.c_custkey, price DESC, t.o_orderkey LIMIT 100
"""

print("vocab size:", con.execute(
    "SELECT count(DISTINCT term) FROM (SELECT unnest(string_split(text,' ')) term FROM documents)").fetchall())
for name, sql in [("c01", oc01), ("c02", oc02), ("c03", oc03), ("t09", ot09),
                  ("t10", ot10), ("v12", ov12), ("s02", os02), ("q34", oq34),
                  ("q35", oq35)]:
    try:
        r = con.execute(sql).fetchall()
        print(f"== {name}: {len(r)} rows; head: {r[:6]}")
    except Exception as ex:
        print(f"== {name}: FAIL {ex}")
