"""Scale probe: amplify the documents/embeddings tables N× (id-shifted
copies — same text distribution, disjoint ids) and time the dedup/ANN
paths at each multiple. Linear wall-time growth = the bucket-bounded
candidate generation is holding; superlinear growth would expose an
all-pairs or recompute pathology. Run: ``python scripts/scale_probe.py
[sf_dir] [multiples...]``; feeds the table in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def amplify(df, id_col, n):
    out = df
    step = 1_000_000
    for i in range(1, n):
        out = out.unionByName(df.withColumn(id_col, F.col(id_col) + i * step))
    return out


def main() -> int:
    from pyspark.sql import functions as F2

    from flinkrealtimedatawarehouse_spark.datapipeline import similarity, textdedup, textstats
    from flinkrealtimedatawarehouse_spark.session import get_spark

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    multiples = [int(a) for a in args if not os.path.isdir(a)] or [1, 2, 4, 8]

    spark = get_spark("scale_probe")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    base_n, base_e = docs.count(), emb.count()

    for m in multiples:
        d = amplify(docs, "doc_id", m)
        t0 = time.time()
        n_pairs = textdedup.minhash_near_dups(d, "doc_id", "text", 3, 16, 8, 0.5).count()
        t_mh = time.time() - t0
        t0 = time.time()
        textstats.corpus_ngrams(d, "text", 2, 20).collect()
        t_ng = time.time() - t0
        t0 = time.time()
        textstats.bm25_terms(d, "doc_id", "text", k=3).count()
        t_bm = time.time() - t0

        e = amplify(emb, "vec_id", m)
        probes = emb.filter(F2.col("vec_id") < 8)  # fixed probe set at every scale
        t0 = time.time()
        similarity.ann_topk_lsh(e, probes, "vec_id", "embedding", k=5, n_planes=6).count()
        t_lsh = time.time() - t0
        t0 = time.time()
        similarity.cosine_topk_batch(e, probes, "vec_id", "embedding", k=5).count()
        t_bf = time.time() - t0
        from flinkrealtimedatawarehouse_spark.tables import load_table

        ev = load_table(spark, sf, "events")  # handles TIMESTAMP(NANOS)
        ev_amp = ev
        # copies get disjoint user_id ranges (base ids are small TPC-H-ish
        # keys, far below the 1M step), so sessions never merge across
        # copies even though timestamps are shared
        for i in range(1, m):
            ev_amp = ev_amp.unionByName(
                ev.withColumn("user_id", F2.col("user_id") + i * 1_000_000)
            )
        from flinkrealtimedatawarehouse_spark.operators import sessions

        t0 = time.time()
        n_sess = sessions.session_stats(ev_amp, "user_id", "ts", 1800, tiebreak="event_id").count()
        t_se = time.time() - t0
        print(
            f"x{m} ({base_n * m} docs / {base_e * m} vecs): "
            f"minhash_lsh={t_mh:.1f}s ({n_pairs} pairs) corpus_ngrams={t_ng:.1f}s "
            f"bm25={t_bm:.1f}s ann_lsh={t_lsh:.1f}s bruteforce_arrow={t_bf:.1f}s "
            f"sessionize={t_se:.1f}s ({n_sess} sessions)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
