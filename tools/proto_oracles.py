import duckdb, sys
con = duckdb.connect()
for t in ['documents','embeddings','events','lineitem','orders','customer','nation']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

Q = {}

# --- dedup family ---
Q['d01_fingerprint_blocks'] = """
WITH t AS (SELECT doc_id, text, string_split(text,' ') toks FROM documents),
s AS (SELECT doc_id, CASE WHEN len(toks) >= 2
  THEN list_min(list_transform(generate_series(1, len(toks)-1), i -> md5(toks[i] || ' ' || toks[i+1])))
  ELSE md5(text) END fp FROM t)
SELECT fp, count(*) AS n, min(doc_id) AS keeper FROM s GROUP BY fp HAVING count(*) > 1 ORDER BY fp
"""

mh = ",\n   ".join([f"list_min(list_transform(sh, x -> md5('{i}:'||x)))" for i in range(8)])
Q['d02_minhash_lsh_pairs'] = f"""
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-1), i -> toks[i]||' '||toks[i+1])) sh
      FROM t WHERE len(toks) >= 2),
sig AS (SELECT doc_id, [{mh}] mh FROM s),
bands AS (SELECT doc_id, b, md5(mh[2*b-1]||mh[2*b]) bh FROM sig, (SELECT unnest(generate_series(1,4)) b)),
cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM bands a JOIN bands b ON a.b=b.b AND a.bh=b.bh AND a.doc_id<b.doc_id),
j AS (SELECT da, db, len(list_intersect(sa.sh,sb.sh))::DOUBLE/(len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh,sb.sh))) jac
      FROM cand JOIN s sa ON cand.da = sa.doc_id JOIN s sb ON cand.db = sb.doc_id)
SELECT da, db, ROUND(jac, 3) AS jaccard FROM j WHERE jac >= 0.8 ORDER BY da, db
"""

Q['d03_simhash_groups'] = """
WITH t AS (SELECT doc_id, list_transform(string_split(text,' '), w -> ('0x'||substr(md5(w),1,15))::BIGINT) hs FROM documents),
sh AS (SELECT doc_id, list_sum(list_transform(generate_series(0,15), j ->
   CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
   THEN (1::BIGINT << j) ELSE 0 END)) simhash FROM t)
SELECT simhash, count(*) AS n, min(doc_id) AS keeper FROM sh GROUP BY 1 HAVING count(*) > 1 ORDER BY simhash
"""

Q['d04_ngram_jaccard_topk'] = """
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
s AS (SELECT doc_id, fp, sh FROM (
  SELECT doc_id,
    list_min(list_transform(generate_series(1, len(toks)-1), i -> md5(toks[i]||' '||toks[i+1]))) fp,
    list_distinct(list_transform(generate_series(1, len(toks)-1), i -> toks[i]||' '||toks[i+1])) sh
  FROM t WHERE len(toks) >= 2))
SELECT a.doc_id AS da, b.doc_id AS db,
  ROUND(len(list_intersect(a.sh,b.sh))::DOUBLE/(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3) AS jaccard
FROM s a JOIN s b ON a.fp = b.fp AND a.doc_id < b.doc_id
ORDER BY jaccard DESC, da, db LIMIT 20
"""

Q['d05_embedding_near_dup'] = """
WITH n AS (SELECT vec_id, list_transform(embedding, x->x::DOUBLE) e,
  sqrt(list_sum(list_transform(embedding, x->(x::DOUBLE)*(x::DOUBLE)))) nrm FROM embeddings),
b AS (SELECT vec_id, e, nrm,
  list_sum(list_transform(generate_series(1,4), j -> CASE WHEN e[j] >= 0 THEN (1::BIGINT<<(j-1)) ELSE 0 END)) bucket FROM n)
SELECT va, vb, ROUND(cos, 4) AS cos_sim FROM (
  SELECT a.vec_id va, b2.vec_id vb,
    list_sum(list_transform(list_zip(a.e, b2.e), x -> x[1]*x[2]))/(a.nrm*b2.nrm) cos
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
WHERE cos >= 0.3 ORDER BY va, vb
"""

# --- text family ---
Q['t01_lang_stats'] = """
SELECT lang, count(*) AS n_docs, ROUND(avg(n_chars), 2) AS avg_chars,
  ROUND(avg(len(string_split(text,' '))), 2) AS avg_tokens
FROM documents GROUP BY lang ORDER BY lang
"""

Q['t02_quality_score'] = """
WITH q AS (SELECT doc_id,
  len(string_split(text,' ')) n_tok,
  len(list_filter(string_split(text,' '), w -> w IN ('the','a','and','of'))) n_stop,
  len(list_distinct(string_split(text,' '))) n_distinct
  FROM documents)
SELECT doc_id, ROUND(
  0.4 * LEAST(n_tok/60.0, 1.0) +
  0.3 * (1.0 - n_stop::DOUBLE/n_tok) +
  0.3 * (n_distinct::DOUBLE/n_tok), 3) AS quality
FROM q ORDER BY doc_id LIMIT 100
"""

Q['t03_lang_id'] = """
WITH p AS (SELECT doc_id, lang,
  CASE WHEN len(list_filter(string_split(text,' '), w -> w IN ('the','a','and','of')))::DOUBLE
            / len(string_split(text,' ')) >= 0.05 THEN 'en' ELSE 'other' END pred
  FROM documents)
SELECT lang, pred, count(*) AS n FROM p GROUP BY lang, pred ORDER BY lang, pred
"""

Q['t04_token_stats'] = """
WITH t AS (SELECT lang,
  len(string_split(text,' ')) ws_tok,
  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) re_tok
  FROM documents)
SELECT lang, sum(ws_tok) AS ws_tokens, sum(re_tok) AS re_tokens,
  ROUND(avg(ws_tok), 2) AS avg_ws FROM t GROUP BY lang ORDER BY lang
"""

Q['t05_winnow_fingerprints'] = """
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
h AS (SELECT doc_id, list_transform(generate_series(1, len(toks)-1), i -> md5(toks[i]||' '||toks[i+1])) hs
      FROM t WHERE len(toks) >= 5),
w AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(hs)-3), i -> list_min(hs[i:i+3]))) fps FROM h)
SELECT doc_id, len(fps) AS n_fingerprints FROM w ORDER BY doc_id LIMIT 100
"""

# --- vector family ---
Q['v01_cosine_topk'] = """
WITH n AS (SELECT vec_id, list_transform(embedding, x->x::DOUBLE) e,
  sqrt(list_sum(list_transform(embedding, x->(x::DOUBLE)*(x::DOUBLE)))) nrm FROM embeddings),
q AS (SELECT e qe, nrm qn FROM n WHERE vec_id = 0)
SELECT vec_id, ROUND(list_sum(list_transform(list_zip(e, qe), x -> x[1]*x[2]))/(nrm*qn), 4) AS cos_sim
FROM n, q ORDER BY cos_sim DESC, vec_id LIMIT 10
"""

Q['v02_srp_ann'] = """
WITH n AS (SELECT vec_id, list_transform(embedding, x->x::DOUBLE) e,
  sqrt(list_sum(list_transform(embedding, x->(x::DOUBLE)*(x::DOUBLE)))) nrm FROM embeddings),
b AS (SELECT vec_id, e, nrm,
  list_sum(list_transform(generate_series(1,4), j -> CASE WHEN e[j] >= 0 THEN (1::BIGINT<<(j-1)) ELSE 0 END)) bucket FROM n),
q AS (SELECT e qe, nrm qn, bucket qb FROM b WHERE vec_id = 0)
SELECT vec_id, ROUND(list_sum(list_transform(list_zip(e, qe), x -> x[1]*x[2]))/(nrm*qn), 4) AS cos_sim
FROM b, q WHERE b.bucket = q.qb ORDER BY cos_sim DESC, vec_id LIMIT 10
"""

Q['v03_ivf_centroid'] = """
WITH n AS (SELECT vec_id, label, list_transform(embedding, x->x::DOUBLE) e FROM embeddings),
cd AS (SELECT label, i, avg(e[i]) c FROM n, (SELECT unnest(generate_series(1,64)) i) GROUP BY label, i),
cent AS (SELECT label, list(c ORDER BY i) ce FROM cd GROUP BY label),
q AS (SELECT e qe FROM n WHERE vec_id = 0),
best AS (SELECT label FROM cent, q
  ORDER BY list_sum(list_transform(list_zip(ce, qe), x -> x[1]*x[2]))
           / (sqrt(list_sum(list_transform(ce, x->x*x))) * sqrt(list_sum(list_transform(qe, x->x*x)))) DESC, label LIMIT 1)
SELECT n.vec_id, ROUND(list_sum(list_transform(list_zip(n.e, q.qe), x -> x[1]*x[2]))
  / (sqrt(list_sum(list_transform(n.e, x->x*x))) * sqrt(list_sum(list_transform(q.qe, x->x*x)))), 4) AS cos_sim
FROM n, q, best WHERE n.label = best.label ORDER BY cos_sim DESC, vec_id LIMIT 10
"""

Q['v04_norm_stats'] = """
SELECT label, count(*) AS n, ROUND(avg(sqrt(list_sum(list_transform(embedding, x->(x::DOUBLE)*(x::DOUBLE))))), 4) AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
"""

# --- multimodal family ---
Q['m01_json_multikey'] = """
SELECT event_id, json_extract(props,'$.k')::INT AS k, json_extract_string(props,'$.tag') AS tag
FROM events ORDER BY event_id LIMIT 100
"""

Q['m02_binary_metadata'] = """
SELECT doc_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS content_hash,
  ascii(substr(text,1,1)) AS first_byte
FROM documents ORDER BY doc_id LIMIT 100
"""

Q['m03_format5_decode'] = """
WITH enc AS (SELECT event_id,
  upper('05'
   || lpad(to_hex(((round(value*200)::INT % 65536) + 65536) % 65536), 4, '0')
   || lpad(to_hex(json_extract(props,'$.k')::INT * 400), 4, '0')
   || lpad(to_hex(user_id * 100), 4, '0')
   || lpad(to_hex((((event_id % 2001) - 1000) + 65536) % 65536), 4, '0')
   || lpad(to_hex((((event_id % 1999) - 999) + 65536) % 65536), 4, '0')
   || lpad(to_hex((((event_id % 997) - 498) + 65536) % 65536), 4, '0')
   || 'FFFF'
   || lpad(to_hex(event_id % 256), 2, '0')
   || '0000' || '000000000000') AS payload_hex
  FROM events),
dec AS (SELECT event_id, payload_hex,
  ('0x'||substr(payload_hex,3,4))::BIGINT AS traw,
  ('0x'||substr(payload_hex,7,4))::BIGINT AS hraw,
  ('0x'||substr(payload_hex,11,4))::BIGINT AS praw,
  ('0x'||substr(payload_hex,15,4))::BIGINT AS axraw,
  ('0x'||substr(payload_hex,19,4))::BIGINT AS ayraw,
  ('0x'||substr(payload_hex,23,4))::BIGINT AS azraw,
  ('0x'||substr(payload_hex,31,2))::BIGINT AS mraw
  FROM enc)
SELECT event_id,
  ROUND((CASE WHEN traw >= 32768 THEN traw - 65536 ELSE traw END) * 0.005, 2) AS temperature,
  ROUND(LEAST(hraw * 0.0025, 100.0), 2) AS humidity,
  ROUND((praw + 50000) / 100.0, 2) AS pressure,
  ROUND((CASE WHEN axraw >= 32768 THEN axraw - 65536 ELSE axraw END) * 0.001, 3) AS accel_x,
  ROUND((CASE WHEN ayraw >= 32768 THEN ayraw - 65536 ELSE ayraw END) * 0.001, 3) AS accel_y,
  ROUND((CASE WHEN azraw >= 32768 THEN azraw - 65536 ELSE azraw END) * 0.001, 3) AS accel_z,
  mraw AS movement
FROM dec ORDER BY event_id LIMIT 100
"""

Q['m04_frame_sample'] = """
WITH f AS (SELECT doc_id, text, generate_series(1, (length(text)+15)//16) idxs FROM documents WHERE doc_id < 20),
fr AS (SELECT doc_id, unnest(idxs) AS frame_no, text FROM f)
SELECT doc_id, frame_no, md5(substr(text, (frame_no-1)*16+1, 16)) AS frame_hash
FROM fr WHERE frame_no % 4 = 1 ORDER BY doc_id, frame_no
"""

for name, sql in Q.items():
    try:
        r = con.execute(sql).fetchall()
        print(f"{name}: {len(r)} rows; sample: {r[:2]}")
    except Exception as e:
        print(f"{name}: ERROR {str(e)[:300]}")
