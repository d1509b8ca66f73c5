#!/usr/bin/env python3
"""Recompute the q350 WAL-tail-CDC oracle from the committed WAL
fixture pair, engine-independently: sqlite3 replays the database at
two cursors — the head view (full -wal) and the view with the -wal
TRUNCATED at a commit boundary (a WAL prefix ending on a commit frame
is itself a valid WAL: the checksum chain is prefix-closed) — and the
row-level diff of the two views IS the expected change set.

Prints the q350 oracle VALUES block plus the exact per-op rowid lists
(asserted by SqliteCdcSpec). Works on scratch copies only; never
touches the committed fixtures.
"""
import os
import shutil
import sqlite3
import struct
import sys
import tempfile

src = sys.argv[1] if len(sys.argv) > 1 else \
    "src/main/resources/graft/fixture_wal.db"
raw = open(src + "-wal", "rb").read()
page_size = struct.unpack(">I", raw[8:12])[0]
fsz = 24 + page_size

commits = []
pos, n = 32, 0
while pos + fsz <= len(raw):
    csz = struct.unpack(">I", raw[pos + 4:pos + 8])[0]
    n += 1
    if csz:
        commits.append(n)
    pos += fsz
print("-- frames: %d, commit boundaries: %s" % (n, commits))


def view(nframes):
    d = tempfile.mkdtemp()
    try:
        shutil.copy(src, d + "/v.db")
        with open(d + "/v.db-wal", "wb") as f:
            f.write(raw[:32 + nframes * fsz])
        con = sqlite3.connect(d + "/v.db")
        rows = dict(con.execute(
            "SELECT id, sensor||'|'||CAST(temp AS TEXT)||'|'||status "
            "FROM readings").fetchall())
        con.close()
        return rows
    finally:
        shutil.rmtree(d)


cursor_frames = commits[0]
old, new = view(cursor_frames), view(n)
ins = sorted(k for k in new if k not in old)
dele = sorted(k for k in old if k not in new)
upd = sorted(k for k in new if k in old and new[k] != old[k])
print("-- cursor at frames=%d (first commit boundary)" % cursor_frames)
print("-- inserted (%d): %s%s" % (len(ins), ins[:10],
                                  " ..." if len(ins) > 10 else ""))
print("-- deleted  (%d): %s" % (len(dele), dele))
print("-- updated  (%d): %s" % (len(upd), upd))
print("-- q350 oracle (DuckDB VALUES):")
rows = [("delete", dele), ("insert", ins), ("update", upd)]
print("SELECT * FROM (VALUES\n    %s\n) AS t(op, n, sum_rowid, min_rowid)"
      % ",\n    ".join("('%s', %d, %d, %d)" %
                       (op, len(ks), sum(ks), min(ks) if ks else 0)
                       for op, ks in rows))

# the mid-stream cursor SqliteCdcSpec pins (second commit boundary):
# exact rowid sets, no inserts — a pure delete+update tail
c2 = commits[1]
old2 = view(c2)
ins2 = sorted(k for k in new if k not in old2)
del2 = sorted(k for k in old2 if k not in new)
upd2 = sorted(k for k in new if k in old2 and new[k] != old2[k])
print("-- spec cursor at frames=%d: ins=%s del=%s upd=%s"
      % (c2, ins2, del2, upd2))
