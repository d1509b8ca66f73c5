#!/usr/bin/env python3
"""Deterministic LARGE SQLite fixture for the graft-sqlite scale probe
(not committed — regenerate at will): N rows with mixed types, an
occasional overflow body, a SELECTIVE indexed column (tag: ~n/100000
rows per value, idx_big_tag) and a low-cardinality indexed column
(cat, idx_big_cat), page_size 4096. Usage:
    python3 tools/make_sqlite_big.py /tmp/graft_big.db 2000000 [walpct]

With walpct > 0 a THIRD phase reopens the finished file in
journal_mode=WAL (wal_autocheckpoint=0), updates walpct%% of the rows
in committed transactions, and snapshots main+-wal while a holder
connection blocks the close-time checkpoint — the un-checkpointed
live-warehouse shape for the WAL overlay probe.
"""
import os
import shutil
import sqlite3
import sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_big.db"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000000
walpct = int(sys.argv[3]) if len(sys.argv) > 3 else 0
if os.path.exists(out):
    os.remove(out)
for suf in ("-wal", "-shm"):
    if os.path.exists(out + suf):
        os.remove(out + suf)
con = sqlite3.connect(out)
cur = con.cursor()
cur.execute("PRAGMA page_size = 4096")
cur.execute("PRAGMA journal_mode = OFF")
cur.execute("PRAGMA synchronous = OFF")
cur.execute("""
CREATE TABLE big (
  id    INTEGER PRIMARY KEY,
  cat   VARCHAR2(20),
  tag   VARCHAR2(20),
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
        "t-%06d" % (i % 100000),
        ("big-overflow-%07d " % i) * 300 if i % 5000 == 0
        else "row %07d payload text for scan throughput" % i,
        (i * 37 % 1000) / 8.0,
        i % 2,
    ))
    if len(batch) == 50000:
        cur.executemany("INSERT INTO big VALUES (?,?,?,?,?,?)", batch)
        batch = []
if batch:
    cur.executemany("INSERT INTO big VALUES (?,?,?,?,?,?)", batch)
cur.execute("CREATE INDEX idx_big_tag ON big (tag)")
cur.execute("CREATE INDEX idx_big_cat ON big (cat)")
# composite for the prefix-probe scale point (eq cat + range score)
cur.execute("CREATE INDEX idx_big_cat_score ON big (cat, score)")
con.commit()
print("rows:", cur.execute("SELECT count(*) FROM big").fetchone()[0])
print("bytes:", os.path.getsize(out))
print("sum_flag:", cur.execute("SELECT sum(flag) FROM big").fetchone()[0])
con.close()

if walpct > 0:
    w = sqlite3.connect(out)
    w.execute("PRAGMA journal_mode=WAL")
    w.execute("PRAGMA wal_autocheckpoint=0")
    holder = sqlite3.connect(out)
    holder.execute("BEGIN")
    holder.execute("SELECT count(*) FROM big").fetchone()
    # several committed transactions over the RECENT tail of the table
    # (contiguous ids — the live-warehouse update shape; scattered
    # updates would drag ~every page into the WAL)
    upd = n * walpct // 100
    for chunk in range(10):
        lo = n - upd + chunk * (upd // 10)
        hi = lo + (upd // 10)
        w.execute(
            "UPDATE big SET flag = 1 - flag, score = score + 1000.0 "
            "WHERE id > %d AND id <= %d" % (lo, hi))
        w.commit()
    raw_main = open(out, "rb").read()
    raw_wal = open(out + "-wal", "rb").read()
    holder.rollback(); holder.close()
    w.close()  # checkpoint-truncates the originals; restore the snapshot
    with open(out, "wb") as f:
        f.write(raw_main)
    with open(out + "-wal", "wb") as f:
        f.write(raw_wal)
    if os.path.exists(out + "-shm"):
        os.remove(out + "-shm")
    print("wal bytes:", os.path.getsize(out + "-wal"))
