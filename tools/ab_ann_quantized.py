"""Serving-path A/B for the persisted IVF index (r9): float
`ivf_query_index_vectors` vs int8 `ivf_query_index_quantized`, same
literal queries, same probed cells.

What the quantized path buys is BYTES: the candidate scan reads the
int8 inverted file (1 byte/dim codes + one bigint norm) instead of the
float64 one -- this tool prints the actual on-disk bytes behind each
path's scan (manifest-pinned file sizes) next to interleaved
latencies, and the top-k agreement between the two rankings (the
~1e-3 quantization error trades a little ranking fidelity for the
byte reduction; both paths remain exactly oracled in the corpus).

Usage: python tools/ab_ann_quantized.py [tier]   (default sf10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from tools import hostprobe  # noqa: E402


def timed(spark, df) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def scan_bytes(df) -> tuple[int, int]:
    files = [f.removeprefix("file:") for f in df.inputFiles()]
    return len(files), sum(os.path.getsize(f) for f in files)


def main() -> None:
    from location_summary_etl_spark.operators.ann_index import (
        build_ivf_index,
        ivf_query_index_quantized,
        ivf_query_index_vectors,
    )
    from location_summary_etl_spark.session import get_session

    tier = sys.argv[1] if len(sys.argv) > 1 else "sf10"
    d = os.path.join(HERE, "bench_tiers", tier)
    spark = get_session(app_name="ab-ann-quantized")
    spark.range(1).write.format("noop").mode("overwrite").save()

    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    root = f"/tmp/ab_ann_q8_{tier}"
    shutil.rmtree(root, ignore_errors=True)
    v = build_ivf_index(emb, root, store_quantized=True)
    qids = [0, 1, 2, 3, 4]
    queries = [(r["vec_id"], list(map(float, r["embedding"])))
               for r in emb.filter(emb.vec_id.isin(qids)).collect()]

    k = 10
    fl = lambda: ivf_query_index_vectors(spark, root, queries,  # noqa
                                         k=k, version=v)
    q8 = lambda: ivf_query_index_quantized(spark, root, queries,  # noqa
                                           k=k, version=v)
    q8e = lambda: ivf_query_index_quantized(spark, root, queries,  # noqa
                                            k=k, version=v, backend="expr")

    a = {(r["query_id"], r["vec_id"]) for r in fl().collect()}
    b = {(r["query_id"], r["vec_id"]) for r in q8().collect()}
    print(f"top-{k} agreement: {len(a & b)}/{len(a)} "
          f"({len(a & b) / len(a):.2f})", flush=True)
    assert sorted(map(str, q8().collect())) == \
        sorted(map(str, q8e().collect())), "quantized backends disagree"
    nf_f, by_f = scan_bytes(fl())
    nf_q, by_q = scan_bytes(q8())
    print(f"scan: float {nf_f} files / {by_f / 1e6:.2f} MB vs "
          f"int8 {nf_q} files / {by_q / 1e6:.2f} MB "
          f"({by_f / max(by_q, 1):.1f}x fewer bytes)", flush=True)

    print("startup probes:",
          hostprobe.wait_quiet(attempts=20, sleep_sec=110), flush=True)
    timed(spark, fl()); timed(spark, q8()); timed(spark, q8e())
    tf, tq, te = [], [], []
    for _ in range(5):
        tf.append(timed(spark, fl()))
        tq.append(timed(spark, q8()))
        te.append(timed(spark, q8e()))
    print(f"{tier}: float min {min(tf):.3f}s {sorted(round(x, 3) for x in tf)}"
          f" | int8-pandas min {min(tq):.3f}s "
          f"{sorted(round(x, 3) for x in tq)}"
          f" | int8-expr min {min(te):.3f}s "
          f"{sorted(round(x, 3) for x in te)}"
          f" | probe={hostprobe.probe()} bw={hostprobe.probe_mt()}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
