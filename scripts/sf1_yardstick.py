"""sf1 DuckDB yardstick: time the frozen sf1 bench suite on Spark AND
DuckDB running semantics-identical SQL over the same parquet, and write
the comparison table into SCALE.md (between the SF1-YARDSTICK markers).

The reference publishes no numbers (BASELINE.md), so a native vectorized
single-node OLAP engine on identical semantics is the honest yardstick:
the contract is "no query > 2x its DuckDB twin" (compute-bound wins like
dp2 are expected, fixed per-stage scheduling overhead losses on tiny
queries are noted and amortize at real scale).

Run from the repo root: ``python scripts/sf1_yardstick.py`` — or
``python scripts/sf1_yardstick.py sf2`` for the fixed-floor decomposition
run: same pairs at 2x the data (scripts/gen_sf1.ensure_sf2). If a >2x row
is truly floor-dominated, its ABSOLUTE gap (delta) stays ~constant from
sf1 to sf2 while both engines' compute terms grow; a row whose delta
scales with the data gets flagged (INVESTIGATE: gap scaled).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_MD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SCALE.md")
MARK_BEGIN = "<!-- SF1-YARDSTICK:BEGIN -->"
MARK_END = "<!-- SF1-YARDSTICK:END -->"
MARK2_BEGIN = "<!-- SF2-YARDSTICK:BEGIN -->"
MARK2_END = "<!-- SF2-YARDSTICK:END -->"
N_RUNS = 3


def _sf1_deltas() -> dict[str, float]:
    """Parse the committed SF1 table's per-row absolute gaps so the sf2
    run can test gap-constancy row by row."""
    try:
        txt = open(SCALE_MD).read()
        block = txt.split(MARK_BEGIN)[1].split(MARK_END)[0]
    except (FileNotFoundError, IndexError):
        return {}
    out = {}
    for line in block.splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) == 5 and not cells[0].startswith(("query", "---", "**")):
            try:
                out[cells[0]] = float(cells[4])
            except ValueError:
                pass
    return out


def pairs():
    """(name, spark_fn, duck_sql) — each pair oracle-identical semantics
    (the driver registry's own gate pairs, plus the TPC-H twins)."""
    from flinkrealtimedatawarehouse_spark.benchqueries import pipeline, tpch, warehouse as wh

    return [
        ("a3_province_stats", wh.q_a3, wh.SQL_A3),
        ("a4_keyword_stats", wh.q_a4c, wh.SQL_A4C),
        ("j4_dim_chain_star", wh.q_j4, wh.SQL_J4),
        # the SERVING form (one-scan fused agg), not the q_u2c parity
        # gate that deliberately runs both the 7-scan and fused forms
        ("u2_product_union_fused", wh.q_u2_fused, wh.SQL_U2),
        ("dp2_minhash_lsh_neardup", pipeline.q_minhash_lsh, pipeline.SQL_MINHASH_LSH),
        ("dp6_cosine_topk", pipeline.q_cosine_topk_both, pipeline.SQL_COSINE_TOPK_BOTH),
        ("dp15s_span_dedup", pipeline.q_span_dedup, pipeline.SQL_SPAN_DEDUP),
        ("dp25_bm25", pipeline.q_bm25_batch, pipeline.SQL_BM25_BATCH),
        ("tpch7_trade", tpch.q_tpch7, tpch.SQL_TPCH7),
        ("tpch9_profit", tpch.q_tpch9, tpch.SQL_TPCH9),
        ("tpch18_bigqty", tpch.q_tpch18, tpch.SQL_TPCH18),
    ]


def main() -> int:
    import duckdb

    from flinkrealtimedatawarehouse_spark.session import get_spark
    from flinkrealtimedatawarehouse_spark.tables import TABLE_NAMES
    from scripts.gen_sf1 import ensure_sf1, ensure_sf2

    sf2_mode = "sf2" in sys.argv[1:]
    spark = get_spark("sf2_yardstick" if sf2_mode else "sf1_yardstick")
    sf1_dir = ensure_sf2(spark) if sf2_mode else ensure_sf1(spark)
    sf1_gaps = _sf1_deltas() if sf2_mode else {}

    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 32}")
    for t in TABLE_NAMES:
        p = os.path.join(sf1_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark writes each table as a directory
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    rows = []
    for name, fn, sql in pairs():
        fn(spark, sf1_dir).count()  # spark warm-up (codegen at this sf)
        s_best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.time()
            fn(spark, sf1_dir).count()
            s_best = min(s_best, time.time() - t0)
        con.execute(sql).fetchall()  # duck warm-up (buffer cache)
        d_best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.time()
            con.execute(sql).fetchall()
            d_best = min(d_best, time.time() - t0)
        ratio = s_best / d_best if d_best > 0 else float("inf")
        delta = s_best - d_best
        rows.append((name, round(s_best, 3), round(d_best, 3), round(ratio, 2),
                     round(delta, 3)))
        print(f"{name}: spark {s_best:.3f}s  duckdb {d_best:.3f}s  ratio {ratio:.2f}x",
              file=sys.stderr)

    s_tot = round(sum(r[1] for r in rows), 3)
    d_tot = round(sum(r[2] for r in rows), 3)
    def _note(r):
        if sf2_mode and r[0] in sf1_gaps:
            # the decomposition test: a floor gap is CONSTANT in data
            # size — allow 0.75 s of measurement slack before flagging
            grew = r[4] - sf1_gaps[r[0]]
            if r[3] > 2.0 and grew > 0.75:
                return " (INVESTIGATE: gap scaled)"
            return " (floor held)" if r[3] > 2.0 else ""
        if r[3] <= 2.0:
            return ""
        # Spark's per-query floor in local mode is its multi-stage task
        # scheduling (~0.1-0.2 s per stage) — a constant, not a data
        # term; rows whose absolute gap is ~1 s are floor-dominated and
        # the ratio shrinks as data grows
        return " (fixed-floor)" if r[4] < 1.5 else " (INVESTIGATE)"
    if sf2_mode:
        lines = [
            MARK2_BEGIN,
            "### sf2 fixed-floor decomposition (scripts/sf1_yardstick.py "
            f"sf2 — 2x the sf1 data, min-of-{N_RUNS} warm)",
            "",
            "| query | spark s | duckdb s | ratio | delta s | sf1 delta s |",
            "| --- | --- | --- | --- | --- | --- |",
            *[f"| {n} | {s} | {d} | {r}x{_note((n, s, d, r, dl))} | {dl} | "
              f"{sf1_gaps.get(n, '-')} |"
              for n, s, d, r, dl in rows],
            f"| **total** | **{s_tot}** | **{d_tot}** | "
            f"**{round(s_tot / d_tot, 2) if d_tot else 'inf'}x** | | |",
            "",
            "The decomposition the sf1 (fixed-floor) tags claim: if a",
            ">2x row loses only Spark's constant multi-stage scheduling",
            "cost, doubling the data must leave its ABSOLUTE gap (delta)",
            "~unchanged while both engines' compute terms grow. Rows",
            "tagged (floor held) pass; (INVESTIGATE: gap scaled) marks a",
            "row whose gap grew > 0.75 s over its sf1 gap — a data-",
            "proportional loss, not a floor.",
            MARK2_END,
        ]
        mb, me = MARK2_BEGIN, MARK2_END
    else:
        lines = [
            MARK_BEGIN,
            "### sf1 DuckDB yardstick (scripts/sf1_yardstick.py, min-of-"
            f"{N_RUNS} warm, {os.cpu_count()} threads both engines)",
            "",
            "| query | spark s | duckdb s | ratio | delta s |",
            "| --- | --- | --- | --- | --- |",
            *[f"| {n} | {s} | {d} | {r}x{_note((n, s, d, r, dl))} | {dl} |"
              for n, s, d, r, dl in rows],
            f"| **total** | **{s_tot}** | **{d_tot}** | "
            f"**{round(s_tot / d_tot, 2) if d_tot else 'inf'}x** | |",
            "",
            "Ratios < 1 are Spark wins — the compute-bound operators where",
            "the engines do real work (dp2 MinHash-LSH, dp15s span dedup).",
            "Rows tagged (fixed-floor) lose only Spark's constant multi-stage",
            "scheduling cost (absolute gap ~1 s, invariant in data size): at",
            "sf1 DuckDB finishes these in well under a second, so the RATIO",
            "is large while the absolute cost is a constant that amortizes as",
            "data grows (the gap stays ~1 s while both engines' compute term",
            "scales).",
            "(INVESTIGATE) marks a > 2x row whose gap exceeds the floor.",
            MARK_END,
        ]
        mb, me = MARK_BEGIN, MARK_END
    block = "\n".join(lines)
    txt = open(SCALE_MD).read()
    if mb in txt:
        txt = re.sub(
            re.escape(mb) + ".*?" + re.escape(me),
            block, txt, flags=re.S,
        )
    else:
        txt = txt.rstrip("\n") + "\n\n" + block + "\n"
    open(SCALE_MD, "w").write(txt)
    print(f"wrote yardstick table to {SCALE_MD}", file=sys.stderr)

    over = [r for r in rows if r[3] > 2.0]
    print(f"{len(rows)} pairs, {len(over)} over 2x: {[r[0] for r in over]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
