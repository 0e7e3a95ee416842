#!/usr/bin/env python3
"""Synthesize an sf1-equivalent slice by 10x-ing the sf0.1 tables into
OUTDIR (default /tmp/sfprobe1), for the round-7 scale probe.

Design: replicas must preserve data STATISTICS, not create artificial
duplicates (10 verbatim copies of every doc would flip the corpus from
~1% to ~91% duplication and make every dedup query quadratic BY DATA,
telling us nothing about plan scaling):
  - documents: replica i token-SHUFFLES each doc (deterministic md5
    order) -> unigram/vocabulary statistics preserved, shingle/LSH
    near-dup rate stays at the base corpus's level;
  - events: replica i = new users (id offset), same per-user trip
    shapes -> entity count scales, trip length distribution fixed,
    written as timestamp[ns] like the driver's generator;
  - embeddings: replica i = hash-uniform vectors in [-1,1]^dim (new
    points, no near-dup explosion vs the sources), labels carried over;
  - TPC-H tables: copied through (the probe queries are the doc/event/
    embedding-heavy top-10; lineitem-side scaling is covered by the
    driver's own SFs).
"""
import shutil, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfprobe1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10  # replication factor

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]:
    shutil.copy(f"{sf}/{t}.parquet", f"{out}/{t}.parquet")

con.execute(f"""
COPY (
  WITH base AS (
    SELECT * FROM read_parquet('{sf}/documents.parquet')),
  mx AS (SELECT max(doc_id) + 1 AS m FROM base),
  reps AS (
    SELECT b.doc_id, b.lang, b.source, b.n_chars,
           string_split(b.text, ' ') AS toks, r.i
    FROM base b CROSS JOIN range(1, {R}) r(i)),
  toks AS (
    SELECT doc_id, i, lang, source, n_chars,
           unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
    FROM reps),
  shuf AS (
    SELECT doc_id, i, lang, source, n_chars,
           string_agg(tok, ' ' ORDER BY
             md5(CAST(doc_id AS VARCHAR) || ':' || i || ':' || pos), pos)
             AS text
    FROM toks GROUP BY doc_id, i, lang, source, n_chars)
  SELECT doc_id + i * (SELECT m FROM mx) AS doc_id, text, lang, source,
         n_chars
  FROM shuf
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars FROM base
) TO '{out}/documents.parquet' (FORMAT parquet)
""")

# the driver's events.parquet stores ts as timestamp[ns]; OUR OWN output
# (a second generator application, e.g. the 100x probe = 10x of 10x)
# already stores BIGINT nanos — emit the right expression for either
ts_type = con.execute(
    f"SELECT typeof(ts) FROM read_parquet('{sf}/events.parquet') LIMIT 1"
).fetchone()[0]
ts_expr = "ts" if ts_type == "BIGINT" else "CAST(epoch_ns(ts) AS BIGINT)"
con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM read_parquet('{sf}/events.parquet')),
  mx AS (SELECT max(user_id) + 1 AS mu, max(event_id) + 1 AS me FROM base)
  SELECT CAST(event_id + i * (SELECT me FROM mx) AS BIGINT) AS event_id,
         {ts_expr} AS ts,
         CAST(user_id + i * (SELECT mu FROM mx) AS BIGINT) AS user_id,
         event_type, value, props
  FROM base CROSS JOIN range(1, {R}) r(i)
  UNION ALL
  SELECT event_id, {ts_expr}, user_id, event_type,
         value, props
  FROM base
) TO '{out}/events.parquet' (FORMAT parquet)
""")

dim = con.execute(f"SELECT len(embedding) FROM read_parquet('{sf}/embeddings.parquet') LIMIT 1").fetchone()[0]
con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM read_parquet('{sf}/embeddings.parquet')),
  mx AS (SELECT max(vec_id) + 1 AS m FROM base)
  SELECT CAST(vec_id + i * (SELECT m FROM mx) AS BIGINT) AS vec_id,
         CAST(list_transform(range({dim}), j ->
           (CAST(hash(vec_id * {dim} + j + i * 1000003) % 2000003
             AS DOUBLE) / 1000001.5) - 1.0) AS FLOAT[]) AS embedding,
         label
  FROM base CROSS JOIN range(1, {R}) r(i)
  UNION ALL SELECT vec_id, embedding, label FROM base
) TO '{out}/embeddings.parquet' (FORMAT parquet)
""")

for t in ["documents", "events", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(t, n)
print("done ->", out)
