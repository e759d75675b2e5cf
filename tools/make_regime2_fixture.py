#!/usr/bin/env python3
"""Build the 110k-doc regime-2 fixture for x02's corpus-scaled LSH.

The driver's correctness scales (sf0.01-sf1) never cross the 100k-doc
boundary, so the 48-hash/8-band regime would otherwise run un-oracled.
This writes tmp/regime2: sf0.001's tables with documents.parquet
replaced by 110,400 docs - mostly unique 7-token rows (a per-doc unique
token keeps the J=1 clique count at zero) plus 200 planted near-dup
pairs at J = 6/8 = 0.75, so the oracle result is small enough for the
DuckDB replay (~234 rows) while the corpus size forces regime 2.

Usage:
  python3 tools/make_regime2_fixture.py
  # then, from sbt:  runMain graft.Verify tmp/regime2 /tmp/v_r2 x02_dedup_minhash_lsh
  python3 tools/check.py tmp/regime2 /tmp/v_r2      # expect ALL GREEN

Dev-only tool (driver-side python deps); not part of the shipped
library.
"""
import random
import shutil
import os

import duckdb

SRC = "/root/testdata/sf0.001"
DST = "tmp/regime2"


def main():
    os.makedirs(DST, exist_ok=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))
    random.seed(7)
    rows = []
    vocab = [f"w{i}" for i in range(60)]
    for i in range(110000):
        toks = random.sample(vocab, 6) + [f"u{i}"]
        random.shuffle(toks)
        rows.append((i, " ".join(toks)))
    for k in range(200):
        a = 110000 + 2 * k
        b = a + 1
        toks = random.sample(vocab, 6)
        rows.append((a, " ".join(toks + [f"u{a}"])))
        rows.append((b, " ".join(toks + [f"u{b}"])))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    con.execute(f"""
COPY (SELECT doc_id, text, 'en' AS lang, 'src0' AS source,
      CAST(length(text) AS BIGINT) AS n_chars FROM d ORDER BY doc_id)
TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
    print("docs:", con.sql("SELECT count(*) FROM d").fetchone()[0])


if __name__ == "__main__":
    main()
