"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, compares row count, column names, and an order-insensitive
value hash (rows sorted, columns sorted by name, values normalized to
strings).  Usage::

    python tools/check_correctness.py            # all queries
    python tools/check_correctness.py q1 dedup   # substring filters
    SF_DIR=/root/testdata/sf0.001 python tools/check_correctness.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Canonical float formatting (17 sig digits round-trips doubles).
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    body = sorted(tuple(norm_value(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256()
    for row in body:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return sorted_cols, h.hexdigest(), body


def main():
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    import duckdb

    import __spark_entry__ as entrymod
    from pypgcdc_spark.session import get_spark

    spark = get_spark("correctness-check", cpus=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [n for n in qs if not filters or any(f in n for f in filters)]

    passed, failed, rows_only = [], [], []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: SPARK ERROR {str(e).splitlines()[0][:200]}")
            continue
        if name not in oracles:
            rows_only.append((name, len(srows)))
            print(f"○ {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as e:
            failed.append((name, f"DUCKDB ERROR: {e}"))
            print(f"✗ {name}: DUCKDB ERROR {str(e).splitlines()[0][:200]}")
            continue
        sc, sh, sbody = frame_fingerprint(scols, srows)
        dc, dh, dbody = frame_fingerprint(dcols, drows)
        problems = []
        if sc != dc:
            problems.append(f"cols {sc} vs {dc}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems and sh != dh:
            diff = [
                (a, b) for a, b in zip(sbody, dbody) if a != b
            ][:3]
            problems.append(f"value hash; first diffs: {diff}")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"✗ {name}: {'; '.join(problems)[:400]}")
        else:
            passed.append(name)
            print(f"✓ {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only "
        f"of {len(names)} at {SF_DIR}"
    )
    if failed:
        print("FAILED:", [n for n, _ in failed])
        sys.exit(1)


if __name__ == "__main__":
    main()
