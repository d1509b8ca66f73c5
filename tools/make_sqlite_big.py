#!/usr/bin/env python3
"""Deterministic LARGE SQLite fixture for the graft-sqlite scale probe
(not committed — regenerate at will): N rows with mixed types and an
occasional overflow body, page_size 4096. Usage:
    python3 tools/make_sqlite_big.py /tmp/graft_big.db 2000000
"""
import os
import sqlite3
import sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_big.db"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000000
if os.path.exists(out):
    os.remove(out)
con = sqlite3.connect(out)
cur = con.cursor()
cur.execute("PRAGMA page_size = 4096")
cur.execute("PRAGMA journal_mode = OFF")
cur.execute("PRAGMA synchronous = OFF")
cur.execute("""
CREATE TABLE big (
  id    INTEGER PRIMARY KEY,
  cat   VARCHAR2(20),
  body  TEXT,
  score FLOAT(126),
  flag  INTEGER
)""")
CATS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
batch = []
for i in range(1, n + 1):
    batch.append((
        i,
        CATS[i % 8],
        ("big-overflow-%07d " % i) * 300 if i % 5000 == 0
        else "row %07d payload text for scan throughput" % i,
        (i * 37 % 1000) / 8.0,
        i % 2,
    ))
    if len(batch) == 50000:
        cur.executemany("INSERT INTO big VALUES (?,?,?,?,?)", batch)
        batch = []
if batch:
    cur.executemany("INSERT INTO big VALUES (?,?,?,?,?)", batch)
con.commit()
print("rows:", cur.execute("SELECT count(*) FROM big").fetchone()[0])
print("bytes:", os.path.getsize(out))
print("sum_flag:", cur.execute("SELECT sum(flag) FROM big").fetchone()[0])
con.close()
