#!/usr/bin/env python3
"""Cross-engine validation of graft's WAL-APPEND writer: open the
db + -wal pair SqliteWalWriterSpec leaves in the temp dir with python's
STDLIB sqlite3 (an independent implementation), confirm the appended
rows are visible THROUGH THE WAL, run a real checkpoint, then
PRAGMA integrity_check and re-read from the checkpointed main file.
Exit 0 = the appended frames are a standard SQLite WAL semantics-wise.

Usage: sbt "testOnly graft.SqliteWalWriterSpec" && python3 tools/check_wal_roundtrip.py
"""
import os
import shutil
import sqlite3
import sys
import tempfile

fails = []


def check(db, want_n, want_sum_id, label):
    # copy aside: checkpointing mutates; the spec's files stay pristine
    work = db + ".pycheck"
    for ext in ("", "-wal"):
        src = db + ext
        if os.path.exists(src):
            shutil.copyfile(src, work + ext)
    if not os.path.exists(work):
        print(f"missing {db} — run: sbt 'testOnly graft.SqliteWalWriterSpec'")
        sys.exit(2)
    con = sqlite3.connect(work)
    n, sid = con.execute(
        "SELECT count(*), sum(id) FROM readings").fetchone()
    print(f"{label}: via WAL rows={n} sum(id)={sid}")
    if (n, sid) != (want_n, want_sum_id):
        fails.append(f"{label} pre-checkpoint counts")
    ck = con.execute("PRAGMA wal_checkpoint(TRUNCATE)").fetchone()
    print(f"{label}: checkpoint={ck}")
    if ck[0] != 0:
        fails.append(f"{label} checkpoint busy/failed")
    ic = con.execute("PRAGMA integrity_check").fetchall()
    print(f"{label}: integrity_check={ic}")
    if ic != [("ok",)]:
        fails.append(f"{label} integrity_check")
    n2, sid2 = con.execute(
        "SELECT count(*), sum(id) FROM readings").fetchone()
    if (n2, sid2) != (want_n, want_sum_id):
        fails.append(f"{label} post-checkpoint counts")
    con.close()
    for ext in ("", "-wal", "-shm"):
        if os.path.exists(work + ext):
            os.remove(work + ext)


t = tempfile.gettempdir()
check(os.path.join(t, "graft_walwriter_check.db"),
      200, sum(range(1, 201)), "two-txn")
check(os.path.join(t, "graft_walwriter_deep.db"),
      2204, sum(range(1, 2204)) + 9999, "deep-tree")
check(os.path.join(t, "graft_walwriter_torn.db"),
      52, sum(range(1, 53)), "torn-tail")

if fails:
    print("FAIL:", fails)
    sys.exit(1)
print("wal-append roundtrip OK (python stdlib sqlite3)")
