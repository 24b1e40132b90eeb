"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB (same parquet tables registered as views), compares row count,
sorted column names, and an order-insensitive value hash. Usage:

    python scripts/check_correctness.py [sf_dir] [name-substring ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

import duckdb


def value_hash(rows: list[tuple]) -> str:
    canon = sorted("|".join(canon_cell(c) for c in row) for row in rows)
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from flinkrealtimedatawarehouse_spark.session import get_spark
    from flinkrealtimedatawarehouse_spark.tables import TABLE_NAMES

    # 4g result cap: the sweep collect()s whole gate outputs, and the
    # larger dp gates (dp3's 61k rows at sf0.01) cross the 1g default at
    # the sf1 amplification — a checker-collect limit, not a gate-size
    # contract change (the driver runs at sf0.01)
    spark = get_spark(
        "correctness-check", extra_conf={"spark.driver.maxResultSize": "4g"}
    )
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = a directory of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = [n for n in qs if not filters or any(f in n for f in filters)]
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sorted(sdf.columns)
            # re-order cells by sorted column name for hashing
            idx = [sdf.columns.index(c) for c in s_cols]
            s_rows_sorted_cols = [tuple(r[i] for i in idx) for r in s_rows]
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            cur = con.execute(oracles[name])
            o_cols_raw = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            o_cols = sorted(o_cols_raw)
            oidx = [o_cols_raw.index(c) for c in o_cols]
            o_rows_sorted_cols = [tuple(r[i] for i in oidx) for r in o_rows]
        except Exception:
            print(f"FAIL {name}: ORACLE ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(o_rows):
            problems.append(f"rows {len(s_rows)} vs {len(o_rows)}")
        if s_cols != o_cols:
            problems.append(f"cols {s_cols} vs {o_cols}")
        # Hazard class caught the hard way in rounds 3-5: a DuckDB output
        # column whose type silently widens past BIGINT (list_sum/sum ->
        # HUGEINT) round-trips as float64 through DataFrame-fetching
        # clients ("44.0" vs Spark's "44") while fetchall() — and hence
        # this script's canon_cell — still sees a Python int. Fail on the
        # TYPE, not the value, so local runs catch what only the driver's
        # hash used to see.
        try:
            o_types = {d[0]: d[1] for d in con.execute(f"DESCRIBE {oracles[name]}").fetchall()}
            widened = [
                (c, ty) for c, ty in o_types.items()
                if ty in ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")
            ]
            if widened:
                problems.append(f"oracle columns widen past BIGINT (driver sees float64): {widened}")
        except Exception:
            pass  # DESCRIBE unsupported for this statement shape: skip the type audit
        if not problems and value_hash(s_rows_sorted_cols) != value_hash(o_rows_sorted_cols):
            problems.append("value-hash mismatch")
            sset = {tuple(canon_cell(c) for c in r) for r in s_rows_sorted_cols}
            oset = {tuple(canon_cell(c) for c in r) for r in o_rows_sorted_cols}
            only_s = list(sset - oset)[:3]
            only_o = list(oset - sset)[:3]
            problems.append(f"spark-only={only_s} oracle-only={only_o}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
