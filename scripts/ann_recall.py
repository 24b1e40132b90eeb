"""ANN recall on corpus-derived vectors: feed ``embed_text`` vectors of
the REAL documents corpus (not the synthetic near-random embeddings
table) through the approximate search paths, measure recall@k against
``cosine_topk`` brute force plus the scanned candidate fraction, and
write the (method, params, recall, scanned) table into SCALE.md between
the ANN-RECALL markers.

Methods swept:
- single-table sign-LSH (``ann_topk_lsh``), n_planes sweep;
- multi-table sign-LSH (``ann_topk_multilsh``), (n_planes, n_tables)
  sweep — the recall lever: L tables lift recall 1-(1-c)^L for
  per-table collision prob c while scanning only ~L× more;
- IVF over a k-means coarse quantizer (``kmeans_assign`` +
  ``ivf_topk``), n_probe sweep — recall rises with probed-cell
  fraction.

Run from the repo root: ``python scripts/ann_recall.py [sf_dir]``.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SCALE_MD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SCALE.md")
MARK_BEGIN = "<!-- ANN-RECALL:BEGIN -->"
MARK_END = "<!-- ANN-RECALL:END -->"

K = 10
N_PROBES = 20
DIM = 16
KM_CELLS = 16
KM_ITERS = 5


def _mean_recall(approx, exact, k) -> float:
    from flinkrealtimedatawarehouse_spark.datapipeline import similarity

    r = similarity.recall_at_k(approx, exact, k)
    row = r.agg(F.avg("recall").alias("m")).collect()[0]
    return float(row["m"] or 0.0)


def _scanned_fraction(cand_pairs: int, n_probes: int, n_corpus: int) -> float:
    return cand_pairs / (n_probes * (n_corpus - 1))


def main() -> int:
    from flinkrealtimedatawarehouse_spark.datapipeline import similarity, textstats
    from flinkrealtimedatawarehouse_spark.datapipeline.similarity import (
        hyperplane_bucket,
        quantized,
    )
    from flinkrealtimedatawarehouse_spark.session import get_spark
    from flinkrealtimedatawarehouse_spark.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann_recall")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = textstats.embed_text(docs, "doc_id", "text", dim=DIM).select(
        "doc_id", "embedding"
    )
    # one materialization: every config re-reads the same vectors
    emb = emb.localCheckpoint(eager=True)
    n_corpus = emb.count()
    probes = emb.orderBy("doc_id").limit(N_PROBES)

    exact = similarity.cosine_topk(emb, probes, "doc_id", "embedding", k=K)
    exact = exact.localCheckpoint(eager=True)

    corpus_q = emb.select(
        F.col("doc_id").alias("neighbor_id"), quantized(F.col("embedding")).alias("qn")
    )
    probe_q = probes.select(
        F.col("doc_id").alias("probe_id"), quantized(F.col("embedding")).alias("qp")
    )

    rows: list[tuple[str, str, float, float]] = []

    # --- single-table LSH -------------------------------------------------
    for p in (4, 6, 8):
        approx = similarity.ann_topk_lsh(emb, probes, "doc_id", "embedding",
                                         k=K, n_planes=p)
        rec = _mean_recall(approx, exact, K)
        c = corpus_q.withColumn("b", hyperplane_bucket(F.col("qn"), p))
        pq = probe_q.withColumn("b", hyperplane_bucket(F.col("qp"), p))
        cand = c.join(
            F.broadcast(pq),
            (c["b"] == pq["b"]) & (F.col("probe_id") != F.col("neighbor_id")),
        ).count()
        rows.append(("lsh", f"p={p}", rec,
                     _scanned_fraction(cand, N_PROBES, n_corpus)))
        print(f"lsh p={p}: recall={rec:.3f} scanned={rows[-1][3]:.3f}",
              file=sys.stderr)

    # --- multi-table LSH --------------------------------------------------
    for p, L in ((6, 4), (6, 8), (8, 8), (8, 16)):
        approx = similarity.ann_topk_multilsh(
            emb, probes, "doc_id", "embedding", k=K, n_planes=p, n_tables=L
        )
        rec = _mean_recall(approx, exact, K)
        cand = None
        for t in range(L):
            c = corpus_q.withColumn("b", hyperplane_bucket(F.col("qn"), p, t * p))
            pq = probe_q.withColumn("b", hyperplane_bucket(F.col("qp"), p, t * p))
            pairs = c.join(
                F.broadcast(pq),
                (c["b"] == pq["b"]) & (F.col("probe_id") != F.col("neighbor_id")),
            ).select("probe_id", "neighbor_id")
            cand = pairs if cand is None else cand.unionByName(pairs)
        n_cand = cand.distinct().count()
        rows.append((f"multi-lsh", f"p={p}, L={L}", rec,
                     _scanned_fraction(n_cand, N_PROBES, n_corpus)))
        print(f"multi-lsh p={p} L={L}: recall={rec:.3f} "
              f"scanned={rows[-1][3]:.3f}", file=sys.stderr)

    # --- IVF (k-means coarse quantizer) -----------------------------------
    cells = similarity.kmeans_assign(emb, "doc_id", "embedding",
                                     k=KM_CELLS, iters=KM_ITERS)
    labeled = emb.join(cells, "doc_id")
    cell_sizes = {r["cell"]: r["n"] for r in
                  labeled.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    for n_probe in (1, 2, 4, 8):
        approx = similarity.ivf_topk(labeled, probes.join(cells, "doc_id"),
                                     "doc_id", "embedding", "cell",
                                     k=K, n_probe=n_probe)
        rec = _mean_recall(approx, exact, K)
        pc = similarity._rank_probe_cells(
            probe_q,
            similarity._cell_centroids(
                labeled.select(
                    F.col("doc_id").alias("neighbor_id"),
                    F.col("cell"),
                    quantized(F.col("embedding")).alias("qn"),
                )
            ),
            n_probe,
        ).collect()
        scanned_rows = sum(cell_sizes.get(r["probe_cell"], 0) for r in pc)
        rows.append(("ivf", f"cells={KM_CELLS}, n_probe={n_probe}", rec,
                     _scanned_fraction(scanned_rows, N_PROBES, n_corpus)))
        print(f"ivf n_probe={n_probe}: recall={rec:.3f} "
              f"scanned={rows[-1][3]:.3f}", file=sys.stderr)

    lines = [
        MARK_BEGIN,
        f"### ANN recall on corpus-derived vectors (scripts/ann_recall.py, "
        f"{os.path.basename(sf_dir.rstrip('/'))} documents -> embed_text "
        f"dim={DIM}, {N_PROBES} probes, k={K})",
        "",
        "| method | params | recall@10 | scanned fraction |",
        "| --- | --- | --- | --- |",
        *[f"| {m} | {p} | {r:.3f} | {s:.3f} |" for m, p, r, s in rows],
        "",
        "Scanned fraction = candidate pairs examined / (probes x corpus).",
        "Brute force scans 1.0 by definition; the scale path is whichever",
        "row clears the recall target at the smallest scanned fraction.",
        MARK_END,
    ]
    block = "\n".join(lines)
    txt = open(SCALE_MD).read()
    if MARK_BEGIN in txt:
        txt = re.sub(re.escape(MARK_BEGIN) + ".*?" + re.escape(MARK_END),
                     block, txt, flags=re.S)
    else:
        txt = txt.rstrip("\n") + "\n\n" + block + "\n"
    open(SCALE_MD, "w").write(txt)
    print(f"wrote ANN recall table to {SCALE_MD}", file=sys.stderr)

    best = max((r for r in rows if r[3] < 1.0), key=lambda r: (r[2], -r[3]))
    ok = any(r[2] >= 0.8 and r[3] < 1.0 for r in rows)
    print(f"best sub-full-scan config: {best[0]} {best[1]} "
          f"recall={best[2]:.3f} scanned={best[3]:.3f}; target>=0.8 met: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
