"""Per-stage profile of bench queries via the Spark UI REST API.

Usage: python scripts/profile_query.py [sf_dir] name [name...]

For each query: one warm-up run, then one measured run; prints the stages
executed by the measured run with duration, task count, input bytes,
shuffle read/write bytes, and the top of the stage name — the empirical
loop of guide §1.1 without screenshots. Measurement session only (UI on);
bench.py itself never enables the UI.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def main() -> int:
    from flinkrealtimedatawarehouse_spark.session import get_spark
    from flinkrealtimedatawarehouse_spark.benchqueries import pipeline, tpch, warehouse as wh
    import bench

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)]

    fns = dict(bench._headline())
    fns.update({
        "tpch21_waiting": tpch.q_tpch21, "tpch2_mincost": tpch.q_tpch2,
        "tpch9_profit": tpch.q_tpch9, "tpch7_trade": tpch.q_tpch7,
        "tpch11_important": tpch.q_tpch11, "tpch20_potential": tpch.q_tpch20,
        "dp15s_span_dedup": pipeline.q_span_dedup,
        "dp25_bm25": pipeline.q_bm25_batch,
    })

    spark = get_spark("profiler", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:
        fn = fns[name]
        fn(spark, sf).count()  # warm-up
        jobs_before = {j["jobId"] for j in _get(f"{base}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        fn(spark, sf).count()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in _get(f"{base}/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages")
        rows = []
        for sid in stage_ids:
            try:
                for att in _get(f"{base}/stages/{sid}"):
                    if att["status"] == "SKIPPED":
                        rows.append((0.0, sid, 0, 0, 0, 0, "SKIPPED: "
                                     + att["name"][:70]))
                        continue
                    dur = (att.get("executorRunTime", 0)) / 1000.0
                    sub = (att["completionTime"] is not None)
                    t_sub = 0.0
                    if sub:
                        from datetime import datetime
                        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                        t_sub = (datetime.strptime(att["completionTime"], fmt)
                                 - datetime.strptime(att["firstTaskLaunchedTime"], fmt)
                                 ).total_seconds()
                    rows.append((t_sub, sid, att["numCompleteTasks"],
                                 att.get("inputBytes", 0),
                                 att.get("shuffleReadBytes", 0),
                                 att.get("shuffleWriteBytes", 0),
                                 f"exec={dur:.2f}s " + att["name"][:70]))
            except Exception as e:
                rows.append((0.0, sid, 0, 0, 0, 0, f"err {e}"))
        for t_sub, sid, ntask, inb, srb, swb, label in sorted(rows, reverse=True):
            print(f"  {t_sub:7.3f}s stage={sid:<5} tasks={ntask:<4} "
                  f"in={inb/1e6:8.2f}MB sr={srb/1e6:8.2f}MB "
                  f"sw={swb/1e6:8.2f}MB  {label}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
