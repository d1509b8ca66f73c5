#!/usr/bin/env python3
"""Cross-engine validation of graft's native SQLite WRITER: open the
file SqliteWriterSpec leaves at $TMPDIR/graft_writer_check.db with
python's STDLIB sqlite3 (a completely independent implementation), run
PRAGMA integrity_check, and replay the aggregates the spec asserted
through graft's own reader. Exit 0 = the written file is a standard
SQLite database byte-for-byte semantics-wise.

Usage: sbt "testOnly graft.SqliteWriterSpec" && python3 tools/check_sqlite_roundtrip.py
"""
import os
import sqlite3
import sys
import tempfile

db = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    tempfile.gettempdir(), "graft_writer_check.db")
if not os.path.exists(db):
    print(f"missing {db} — run: sbt 'testOnly graft.SqliteWriterSpec'")
    sys.exit(2)

con = sqlite3.connect(f"file:{db}?mode=ro", uri=True)
fails = []

ic = con.execute("PRAGMA integrity_check").fetchall()
print("integrity_check:", ic)
if ic != [("ok",)]:
    fails.append("integrity_check")

tables = sorted(r[0] for r in con.execute(
    "SELECT name FROM sqlite_master WHERE type='table'"))
print("tables:", tables)
if tables != ["t1", "t2"]:
    fails.append("tables")

n = con.execute("SELECT count(*) FROM t1").fetchone()[0]
sid = con.execute("SELECT sum(id) FROM t1").fetchone()[0]
print("t1 rows:", n, "sum(id):", sid)
if n != 5000 or sid != sum(i * 2 for i in range(1, 5001)):
    fails.append("t1 counts")

ov = con.execute("SELECT length(name) FROM t1 WHERE id = 2000").fetchone()[0]
print("overflow name length:", ov)
if ov != len("ov-1000 ") * 1200:
    fails.append("overflow")

nulls = con.execute("SELECT count(*) FROM t1 WHERE score IS NULL").fetchone()[0]
blob = con.execute("SELECT payload FROM t1 WHERE id = 18").fetchone()[0]
print("null scores:", nulls, "blob(id=18):", list(blob))
if nulls != 5000 // 7 or list(blob) != [9] * 5:
    fails.append("nulls/blob")

if con.execute("SELECT count(*) FROM t2").fetchone()[0] != 0:
    fails.append("t2 not empty")

# 201-leaf interior-packing boundary file (SqliteWriterSpec leaves it):
# the 1-mod-200 rebalance must still be a standard file per sqlite3
bdb = os.path.join(tempfile.gettempdir(), "graft_writer_boundary.db")
if os.path.exists(bdb):
    bcon = sqlite3.connect(f"file:{bdb}?mode=ro", uri=True)
    bic = bcon.execute("PRAGMA integrity_check").fetchall()
    bn = bcon.execute("SELECT count(*), sum(n) FROM b").fetchone()
    print("boundary integrity_check:", bic, "rows/sum:", bn)
    if bic != [("ok",)] or bn != (201, sum(range(1, 202))):
        fails.append("boundary-201")
else:
    print(f"note: {bdb} absent — run SqliteWriterSpec first")

print("FAIL: " + ", ".join(fails) if fails else "OK — python sqlite3 "
      "reads the graft-written file cleanly")
sys.exit(1 if fails else 0)
