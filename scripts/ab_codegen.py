"""A/B a session config across the bench query sets in THIS fresh JVM.

Usage: python scripts/ab_codegen.py <tier> [conf_k=conf_v ...]
tier: sf01 (headline 13) | sf1 (frozen sf1 11)

Prints one JSON line {"conf": ..., "cold": {...}, "steady": {...}}.
Run once per config value, fresh process each time (JIT/codegen state
must not leak between configs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tier = sys.argv[1]
    confs = dict(a.split("=", 1) for a in sys.argv[2:])

    from flinkrealtimedatawarehouse_spark.session import get_spark
    import bench

    spark = get_spark("ab_codegen", extra_conf=confs)
    if tier == "sf01":
        sf = "/root/testdata/sf0.1"
        fns = bench._headline()
    else:
        from flinkrealtimedatawarehouse_spark.benchqueries import pipeline, tpch, warehouse as wh
        sf = "/root/repo/.benchdata/sf1"
        fns = {
            "a3_province_stats": wh.q_a3, "a4_keyword_stats": wh.q_a4,
            "j4_dim_chain_star": wh.q_j4, "u2_product_union": wh.q_u2,
            "dp2_minhash_lsh_neardup": pipeline.q_minhash_lsh,
            "dp6_cosine_topk": pipeline.q_cosine_topk,
            "dp15s_span_dedup": pipeline.q_span_dedup,
            "dp25_bm25": pipeline.q_bm25_batch,
            "tpch7_trade": tpch.q_tpch7, "tpch9_profit": tpch.q_tpch9,
            "tpch18_bigqty": tpch.q_tpch18,
        }
    cold, steady = {}, {}
    for name, fn in fns.items():
        t0 = time.time()
        fn(spark, sf).count()
        cold[name] = round(time.time() - t0, 3)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf).count()
            best = min(best, time.time() - t0)
        steady[name] = round(best, 3)
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            try:
                rdd.unpersist()
            except Exception:
                pass
    print(json.dumps({
        "conf": confs, "tier": tier,
        "cold_total": round(sum(cold.values()), 3),
        "steady_total": round(sum(steady.values()), 3),
        "cold": cold, "steady": steady,
        "load": bench._load_stamp(),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
