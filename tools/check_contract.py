"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark AND its
oracle_sql() on DuckDB (views over the same parquet), then compares
row count + column names + order-insensitive values (columns sorted by
name, rows sorted, floats rounded to 9 significant digits).

Usage:
    python tools/check_contract.py [query_name ...] [--sf DIR]
                                   [--gate-open]

``--gate-open`` forces the cluster-scale execution path
(SPARK_GRAFT_ADAPTIVE_MIN_BYTES=0: AQE on, no planner broadcast
hints, no literal rewrites) regardless of input size — the plan shape
a 100 TB deployment runs. Must be handled before the engine import.
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

if "--gate-open" in sys.argv:
    os.environ["SPARK_GRAFT_ADAPTIVE_MIN_BYTES"] = "0"

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return float(f"{v:.9g}")
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    from decimal import Decimal
    if isinstance(v, Decimal):
        return _norm_cell(float(v))
    return v


def _dtype_mismatch(sn: list[tuple], dn: list[tuple]) -> list[int]:
    """Column positions where any row pairs an int on one side with a
    float on the other (every row is scanned — variant columns may mix
    types row-by-row)."""
    bad: set[int] = set()
    for srow, drow in zip(sn, dn):
        for i, (a, b) in enumerate(zip(srow, drow)):
            if isinstance(a, bool) or isinstance(b, bool):
                continue
            if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
                    and (isinstance(a, int) != isinstance(b, int)):
                bad.add(i)
    return sorted(bad)


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    argv = sys.argv[1:]
    args: list[str] = []
    sf_dir = "/root/testdata/sf0.01"
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf" and i + 1 < len(argv):
            sf_dir = argv[i + 1]
            i += 1
        elif a == "--gate-open":
            pass  # consumed at import time above
        elif not a.startswith("--"):
            args.append(a)
        i += 1

    import duckdb
    import __spark_entry__ as entrymod
    from redisgraph_spark import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or list(qs)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows "
                  f"({time.time()-t0:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        ok = True
        msgs = []
        if len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if ok:
            sn = _normalize(s_cols, s_rows)
            dn = _normalize(d_cols, d_rows)
            if sn != dn:
                ok = False
                diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                msgs.append(f"values differ; first diffs={diffs}")
            else:
                # the driver's hash stringifies values, so int-vs-float
                # column dtypes (991 vs 991.0) hash-differ even when
                # values compare equal — fail them here, not there
                bad = _dtype_mismatch(sn, dn)
                if bad:
                    ok = False
                    msgs.append(f"dtype mismatch (int vs float): {bad}")
        if ok:
            print(f"PASS  {name}: {len(s_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
            failures.append(name)
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail"
          + (f": {failures}" if failures else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
