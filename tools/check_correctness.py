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
    """Normalize one pandas cell.  Deliberately does NOT unify int vs float:
    the driver hashes DuckDB HUGEINT→float64 `123.0` differently from
    Spark's int64 `123` (CORRECTNESS_r01 root cause), so we must too."""
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v)).lower()
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    try:
        import pandas as pd

        if v is pd.NaT or v is pd.NA:
            return "∅"
    except Exception:
        pass
    return str(v)


def frame_fingerprint(pdf):
    """Canonicalize a *pandas* frame the way the driver does: columns sorted
    by name, then a pandas sort_values over every column (this is what
    crashes on list-typed cells — a crash here is a real driver crash, do
    not work around it), then a value hash."""
    sorted_cols = sorted(pdf.columns)
    pdf = pdf[sorted_cols]
    if len(pdf):
        pdf = pdf.sort_values(by=sorted_cols, kind="mergesort")
    body = sorted(
        tuple(norm_value(v) for v in row) for row in pdf.itertuples(index=False)
    )
    import hashlib

    h = hashlib.sha256()
    for row in body:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return sorted_cols, h.hexdigest(), body


def main():
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    json_out = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
    import duckdb

    import __spark_entry__ as entrymod
    from pypgcdc_spark.session import get_spark

    spark = get_spark("correctness-check", cpus=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    # Check the FULL inventory (primary + extended) — the driver only sees
    # queries(), but every registered operator must stay oracle-green here.
    qs = entrymod.extended_queries()
    oracles = entrymod.extended_oracle_sql()
    primary = set(entrymod.queries())
    print(f"{len(primary)} primary (driver-facing) / {len(qs)} total")
    assert len(primary) <= 50, "primary set exceeds the driver's 50-entry gate"
    names = [n for n in qs if not filters or any(f in n for f in filters)]

    passed, failed, rows_only = [], [], []
    records = {}  # driver-shaped rows for --json=<artifact>
    for name in names:
        t0 = time.time()
        rec = records[name] = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "primary": name in primary,
        }
        try:
            sdf = qs[name](spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            rec["err"] = f"spark: {str(e).splitlines()[0][:200]}"
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: SPARK ERROR {str(e).splitlines()[0][:200]}")
            continue
        rec["spark_rows"] = len(spdf)
        if name not in oracles:
            # The driver still canonicalizes rows-only results — a list
            # column crashes there too, so fingerprint to catch it.
            try:
                frame_fingerprint(spdf)
            except Exception as e:
                rec["err"] = f"rows-only canon: {str(e).splitlines()[0][:200]}"
                failed.append((name, f"ROWS-ONLY CANON ERROR: {e}"))
                print(f"✗ {name}: ROWS-ONLY CANON ERROR {str(e).splitlines()[0][:200]}")
                continue
            rec["err"] = "no_oracle"
            rows_only.append((name, len(spdf)))
            print(f"○ {name}: rows-only ({len(spdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except Exception as e:
            rec["err"] = f"duckdb: {str(e).splitlines()[0][:200]}"
            failed.append((name, f"DUCKDB ERROR: {e}"))
            print(f"✗ {name}: DUCKDB ERROR {str(e).splitlines()[0][:200]}")
            continue
        rec["oracle_rows"] = len(dpdf)
        try:
            sc, sh, sbody = frame_fingerprint(spdf)
            dc, dh, dbody = frame_fingerprint(dpdf)
        except Exception as e:
            rec["err"] = f"canon: {str(e).splitlines()[0][:200]}"
            failed.append((name, f"CANON ERROR: {e}"))
            print(f"✗ {name}: CANON ERROR {str(e).splitlines()[0][:200]}")
            continue
        rec["schema_match"] = sc == dc
        rec["rows_match"] = len(spdf) == len(dpdf)
        rec["hash_match"] = rec["schema_match"] and rec["rows_match"] and sh == dh
        problems = []
        if sc != dc:
            problems.append(f"cols {sc} vs {dc}")
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount {len(spdf)} vs {len(dpdf)}")
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
            print(f"✓ {name} ({len(spdf)} rows) [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only "
        f"of {len(names)} at {SF_DIR}"
    )
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "total": len(names),
                    "passed": len(passed),
                    "failed": len(failed),
                    "rows_only": len(rows_only),
                    "queries": records,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    if failed:
        print("FAILED:", [n for n, _ in failed])
        sys.exit(1)


if __name__ == "__main__":
    main()
