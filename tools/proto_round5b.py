#!/usr/bin/env python3
"""Round-5b oracle prototypes (DuckDB side) — HLL-partial maintenance
(u02), SQL set ops (q38), quality-classifier inference (t11),
incremental LSH dedup of a delta vs a history index (d09).
Run: python3 tools/proto_round5b.py [sfdir]"""
import sys
import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["documents", "embeddings", "events", "customer", "orders"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

# u02 — the oracle only sees the exact count + the honored error budget
ou02 = """
SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS sketch_ok
FROM events GROUP BY event_type ORDER BY event_type
"""

# q38 — shared ANSI text: set-op chain (INTERSECT binds tighter than EXCEPT
# in both engines; parenthesize anyway so precedence is never in play)
oq38 = """
(SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
 INTERSECT
 SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
ORDER BY k
"""

# t11 — logistic quality classifier: fixed weights over t02's features
ot11 = """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') toks FROM documents),
f AS (SELECT doc_id, lang,
    len(toks)::DOUBLE AS n_tok,
    len(list_filter(toks, w -> w IN ('the','a','and','of')))::DOUBLE AS n_stop,
    len(list_distinct(toks))::DOUBLE AS n_dist
  FROM t),
q AS (SELECT doc_id, lang,
    0.4*least(n_tok/60.0, 1.0) + 0.3*(1.0 - n_stop/n_tok) + 0.3*(n_dist/n_tok) AS quality
  FROM f),
s AS (SELECT doc_id, lang, 1.0/(1.0+exp(-(8.0*quality - 4.8))) AS score FROM q)
SELECT lang, count(*) FILTER (score > 0.5) AS n_kept,
  count(*) FILTER (score <= 0.5) AS n_dropped,
  ROUND(avg(score), 4) AS avg_score
FROM s GROUP BY lang ORDER BY lang
"""

MhA = [1000003, 1000033, 1000037, 1000039, 1000081, 1000099, 1000117, 1000121]
MhB = [12345, 54321, 98765, 13579, 24680, 11111, 77777, 31415]
MhP = 1000000007
mh = ",\n   ".join(
    f"list_min(list_transform(hs, h -> ({MhA[i]}*h + {MhB[i]}) % {MhP}))"
    for i in range(8))

# d09 — incremental dedup: delta (doc_id % 5 = 4) vs history index
od09 = f"""
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-1),
        i -> toks[i]||' '||toks[i+1])) sh
      FROM t WHERE len(toks) >= 2),
hsed AS (SELECT doc_id, sh, list_transform(sh, x -> ('0x'||substr(md5(x),1,7))::BIGINT) hs FROM s),
sig AS (SELECT doc_id, sh, [{mh}] mh FROM hsed),
bands AS (SELECT doc_id, sh, b, mh[2*b-1]::VARCHAR || ':' || mh[2*b]::VARCHAR bh
          FROM sig, (SELECT unnest(generate_series(1,4)) b)),
cand AS (SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS dup_of
         FROM bands n JOIN bands h ON n.b = h.b AND n.bh = h.bh
         WHERE n.doc_id % 5 = 4 AND h.doc_id % 5 <> 4),
j AS (SELECT new_id, dup_of,
        len(list_intersect(sa.sh, sb.sh))::DOUBLE
          / (len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh, sb.sh))) jac
      FROM cand JOIN s sa ON cand.new_id = sa.doc_id JOIN s sb ON cand.dup_of = sb.doc_id)
SELECT new_id, dup_of, ROUND(jac, 3) AS jaccard FROM j WHERE jac >= 0.8
ORDER BY new_id, dup_of
"""

for name, q in [("u02", ou02), ("q38", oq38), ("t11", ot11), ("d09", od09)]:
    r = con.execute(q).fetchdf()
    print(f"=== {name}: {len(r)} rows")
    print(r.head(8).to_string())
