#!/usr/bin/env python3
"""Generate UTF-16 SQLite read-fixtures (both byte orders) for graft's
native source — src/test/resources/graft/fixture_utf16le.db and
fixture_utf16be.db. Deterministic: regenerate and cmp.

Text coverage: ASCII, Latin-1 accents, BMP CJK, and SUPPLEMENTARY
plane characters (surrogate pairs in UTF-16 — the decode shape a
naive per-code-unit reader gets wrong). The spec asserts graft reads
back exactly the strings sqlite3 stored, in both encodings, and that
schema/DDL (also stored UTF-16) parses.
"""
import os
import sqlite3
import sys

outdir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/graft"
os.makedirs(outdir, exist_ok=True)

ROWS = [
    (1, "plain ascii", 10),
    (2, "café naïve résumé", 20),
    (3, "日本語テスト", 30),          # CJK BMP
    (4, "emoji \U0001F600\U0001F680 pair", 40),               # surrogates
    (5, "mixed é日\U0001F600z", 50),
    (6, "", 60),                                              # empty text
]

for enc, name in (("UTF-16le", "fixture_utf16le.db"),
                  ("UTF-16be", "fixture_utf16be.db")):
    path = os.path.join(outdir, name)
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA page_size = 4096")
    cur.execute("PRAGMA encoding = '%s'" % enc)
    # non-ASCII column and table names: DDL itself is stored UTF-16
    cur.execute("CREATE TABLE msgs (id INTEGER PRIMARY KEY, "
                "téxt TEXT, n INTEGER)")
    cur.executemany("INSERT INTO msgs VALUES (?,?,?)", ROWS)
    # a long UTF-16 body that overflows the page (2 bytes/char ASCII)
    cur.execute("INSERT INTO msgs VALUES (?,?,?)",
                (7, "ovérflow " * 700, 70))
    con.commit()
    hdr_enc = con.execute("PRAGMA encoding").fetchone()[0]
    assert hdr_enc.lower() == enc.lower(), (hdr_enc, enc)
    n = con.execute("SELECT count(*), sum(n) FROM msgs").fetchone()
    assert n == (7, 280), n
    con.close()
    print(name, os.path.getsize(path), "bytes, encoding", hdr_enc)
