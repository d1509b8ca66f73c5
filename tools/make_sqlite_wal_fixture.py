#!/usr/bin/env python3
"""Generate the WAL-mode SQLite read-fixture for graft's native source
(src/main/resources/graft/fixture_wal.db + .db-wal) with Python's
stdlib sqlite3.

Shape: a main file frozen at the moment the database switched to
journal_mode=WAL, plus a -wal sidecar holding every transaction
committed SINCE — never checkpointed (wal_autocheckpoint=0; a second
connection holds a read txn so close() cannot checkpoint). A reader
that ignores the sidecar sees the STALE pre-WAL state; the committed
truth requires overlaying the newest committed WAL frame per page.
The sidecar exercises: multi-transaction cumulative checksum chain,
same-page rewrites across commits (newest wins), database GROWTH
inside the WAL (pages past the main file's end), a table created
after the switch (page 1 / sqlite_master override), and deletes.

DETERMINISM: sqlite randomizes the WAL salts at creation, so the raw
sidecar is not regenerable byte-identically. This script NORMALIZES
it — fixed salts, all checksums recomputed per the public WAL spec —
then re-opens the normalized pair with a fresh sqlite3 connection (in
a scratch copy, so recovery/checkpoint cannot touch the fixture) and
asserts the view is unchanged. Regeneration is byte-identical AND the
rewrite is validated by sqlite itself.

Prints the q338 oracle VALUES clause computed by sqlite3 over the
normalized pair — an engine-independent expected answer.
"""
import os
import shutil
import sqlite3
import struct
import sys
import tempfile

outdir = sys.argv[1] if len(sys.argv) > 1 else "src/main/resources/graft"
os.makedirs(outdir, exist_ok=True)
db = os.path.join(outdir, "fixture_wal.db")
wal = db + "-wal"
for f in (db, wal, db + "-shm"):
    if os.path.exists(f):
        os.remove(f)

# ---- phase 1: rollback-journal mode -> a complete, stale main file ----
con = sqlite3.connect(db)
cur = con.cursor()
cur.execute("PRAGMA page_size = 4096")
cur.execute("""
CREATE TABLE readings (
  id     INTEGER PRIMARY KEY,
  sensor VARCHAR2(16),
  temp   FLOAT(126),
  status TEXT
)""")
SENSORS = ["s-north", "s-south", "s-east", "s-west", "s-core"]
cur.executemany(
    "INSERT INTO readings VALUES (?,?,?,?)",
    [(i, SENSORS[i % 5], (i * 7 % 320) / 4.0, "ok") for i in range(1, 801)])
con.commit()
con.close()  # clean close: main file complete, no sidecar

# ---- phase 2: switch to WAL, commit transactions, never checkpoint ----
w = sqlite3.connect(db)
w.execute("PRAGMA journal_mode=WAL")
w.execute("PRAGMA wal_autocheckpoint=0")
holder = sqlite3.connect(db)        # open read txn blocks checkpoints
holder.execute("BEGIN")
holder.execute("SELECT count(*) FROM readings").fetchone()

# txn 1: update a slice (page rewrites)
w.execute("UPDATE readings SET status='alert', temp=temp+100.0 "
          "WHERE id % 50 = 0")
w.commit()
# txn 2: grow the table past the main file (new pages live only in WAL)
w.executemany("INSERT INTO readings VALUES (?,?,?,?)",
              [(i, SENSORS[i % 5], (i * 11 % 280) / 8.0, "new")
               for i in range(801, 1201)])
w.commit()
# txn 3: a table created after the switch (sqlite_master/page-1 override)
w.execute("CREATE TABLE wal_only (k TEXT PRIMARY KEY, n INTEGER)")
w.executemany("INSERT INTO wal_only VALUES (?,?)",
              [("wk-%03d" % i, i * i) for i in range(120)])
w.commit()
# txn 4: deletes + a second rewrite of already-rewritten pages
w.execute("DELETE FROM readings WHERE id % 97 = 0")
w.execute("UPDATE readings SET status='alert2' WHERE id % 100 = 0")
w.commit()

assert os.path.getsize(wal) > 0, "expected un-checkpointed frames"
# snapshot both files while connections are open (close would checkpoint)
raw_main = open(db, "rb").read()
raw_wal = open(wal, "rb").read()
holder.rollback(); holder.close()
w.close()  # this checkpoint-truncates the ORIGINAL files; we rewrite below

# ---- phase 3: normalize the sidecar (fixed salts, recomputed sums) ----
SALT1, SALT2 = 0x11111111, 0x22222222


def cksum(s0, s1, data, big):
    fmt = ">II" if big else "<II"
    for off in range(0, len(data), 8):
        x0, x1 = struct.unpack_from(fmt, data, off)
        s0 = (s0 + x0 + s1) & 0xFFFFFFFF
        s1 = (s1 + x1 + s0) & 0xFFFFFFFF
    return s0, s1


hdr = bytearray(raw_wal[:32])
magic = struct.unpack(">I", hdr[0:4])[0]
assert magic in (0x377F0682, 0x377F0683), hex(magic)
big = magic == 0x377F0683
page_size = struct.unpack(">I", hdr[8:12])[0]
struct.pack_into(">II", hdr, 16, SALT1, SALT2)
s0, s1 = cksum(0, 0, bytes(hdr[:24]), big)
struct.pack_into(">II", hdr, 24, s0, s1)
out = bytearray(hdr)
frame_size = 24 + page_size
pos = 32
nframes = 0
while pos + frame_size <= len(raw_wal):
    fh = bytearray(raw_wal[pos:pos + 24])
    content = raw_wal[pos + 24:pos + frame_size]
    struct.pack_into(">II", fh, 8, SALT1, SALT2)
    s0, s1 = cksum(s0, s1, bytes(fh[:8]), big)
    s0, s1 = cksum(s0, s1, content, big)
    struct.pack_into(">II", fh, 16, s0, s1)
    out += fh + content
    nframes += 1
    pos += frame_size

with open(db, "wb") as f:
    f.write(raw_main)
with open(wal, "wb") as f:
    f.write(bytes(out))
if os.path.exists(db + "-shm"):
    os.remove(db + "-shm")

# ---- phase 4: sqlite3 validates the normalized pair (scratch copy) ----
scratch = tempfile.mkdtemp()
sdb = os.path.join(scratch, "v.db")
shutil.copy(db, sdb)
shutil.copy(wal, sdb + "-wal")
v = sqlite3.connect(sdb)
agg = v.execute("""
  SELECT sensor, count(*) AS n, CAST(round(sum(temp)*8) AS INTEGER)
           AS sum_temp_x8,
         sum(CASE WHEN status LIKE 'alert%' THEN 1 ELSE 0 END) AS n_alert,
         max(id) AS max_id
  FROM readings GROUP BY sensor ORDER BY sensor""").fetchall()
wal_only = v.execute(
    "SELECT count(*) AS n, sum(n) AS sum_n FROM wal_only").fetchone()
total = v.execute("SELECT count(*) FROM readings").fetchone()[0]
assert total == 1200 - len([i for i in range(1, 1201) if i % 97 == 0]), total
assert wal_only == (120, sum(i * i for i in range(120))), wal_only
v.close()
shutil.rmtree(scratch)

# stale main-file-only view (what a WAL-ignorant reader would see)
scratch2 = tempfile.mkdtemp()
sdb2 = os.path.join(scratch2, "stale.db")
with open(sdb2, "wb") as f:
    stale = bytearray(raw_main)
    stale[18] = stale[19] = 1  # pretend rollback mode: no sidecar lookup
    f.write(bytes(stale))
s = sqlite3.connect(sdb2)
stale_total = s.execute("SELECT count(*) FROM readings").fetchone()[0]
stale_alerts = s.execute(
    "SELECT count(*) FROM readings WHERE status LIKE 'alert%'").fetchone()[0]
s.close()
shutil.rmtree(scratch2)

print("-- q338 oracle (DuckDB VALUES):")
print("SELECT * FROM (VALUES\n    %s\n) AS t(sensor, n, sum_temp_x8, "
      "n_alert, max_id)" % ",\n    ".join(
          "('%s', %d, %d, %d, %d)" % r for r in agg))
print("-- wal_only:", wal_only)
print("-- committed rows: %d; stale main-file rows: %d (alerts %d)" %
      (total, stale_total, stale_alerts))
print("-- wal frames:", nframes, "bytes:", os.path.getsize(wal),
      "main bytes:", os.path.getsize(db))
