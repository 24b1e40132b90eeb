"""Physical-plan audit for the headline queries (feeds SCALE.md).

Prints, per query: exchange count, join strategies, whole-stage-codegen
spans, and whether filters/column pruning reached the parquet scans.
Run from the repo root: ``python scripts/plan_audit.py [sf_dir] [names...]``.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "j34_dim_chain", "a1_visitor_stats", "a2_product_stats",
    "a3_province_stats", "a4_keyword_stats", "u2_product_union",
    "dp1_exact_dedup", "dp6_cosine_topk", "dp16_corpus_ngrams",
]


def main() -> int:
    from flinkrealtimedatawarehouse_spark.session import get_spark
    import __spark_entry__ as entry_mod

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)] or DEFAULT

    spark = get_spark("plan_audit")
    registry = entry_mod.queries()
    for name in names:
        fn = registry.get(name)
        if fn is None:
            matches = [k for k in registry if k.startswith(name)]
            if not matches:
                print(f"{name}: not in registry")
                continue
            name, fn = matches[0], registry[matches[0]]
        df = fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(r"(\w*Join\w*)\b", plan)))
        pushed = [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p]
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        print(f"== {name}")
        print(f"   exchanges={n_ex} joins={joins or '-'}")
        print(f"   pushed_filters={pushed or '-'}")
        for s in schemas:
            print(f"   scan_cols={len(s.split(','))}: {s[:100]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
