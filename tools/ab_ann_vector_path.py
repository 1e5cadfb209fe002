"""Query-latency A/B for the persisted IVF index's two serving paths
(r8): id-keyed ivf_query_index (must scan the whole inverted file to
find the query rows) vs literal-vector ivf_query_index_vectors
(probes from the centroid table, candidate scan file-pruned to the
probed cells).  Also prints how many inverted-file files each path's
plan reads -- the pruning evidence at data scale.

Usage: python tools/ab_ann_vector_path.py [tier]   (default sf1)
"""

from __future__ import annotations

import os
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


def main() -> None:
    from location_summary_etl_spark.operators.ann_index import (
        build_ivf_index,
        ivf_query_index,
        ivf_query_index_vectors,
    )
    from location_summary_etl_spark.session import get_session

    tier = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    d = os.path.join(HERE, "bench_tiers", tier)
    spark = get_session(app_name="ab-ann-vector")
    spark.range(1).write.format("noop").mode("overwrite").save()

    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    root = os.path.join("/tmp", f"ann_vec_ab_{tier}")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    v = build_ivf_index(emb, root)
    qids = [0, 1, 2, 3, 4]
    qvecs = [(r["vec_id"], list(map(float, r["embedding"])))
             for r in emb.filter(emb.vec_id.isin(qids)).collect()]

    by_id = lambda: ivf_query_index(spark, root, qids, k=5,      # noqa
                                    version=v)
    by_vec = lambda: ivf_query_index_vectors(spark, root, qvecs,  # noqa
                                             k=5, version=v)
    a = sorted(map(str, by_id().collect()))
    b = sorted(map(str, by_vec().collect()))
    assert a == b, "paths disagree"
    print(f"results identical ({len(a)} rows); inverted-file files "
          f"read: id-keyed={len(by_id().inputFiles())} "
          f"vector={len(by_vec().inputFiles())}", flush=True)

    print("startup probes:",
          hostprobe.wait_quiet(attempts=20, sleep_sec=110), flush=True)
    timed(spark, by_id()); timed(spark, by_vec())
    ti, tv = [], []
    for _ in range(5):
        ti.append(timed(spark, by_id()))
        tv.append(timed(spark, by_vec()))
    print(f"{tier}: id-keyed min {min(ti):.3f}s {sorted(ti)} | "
          f"vector min {min(tv):.3f}s {sorted(tv)} | "
          f"probe={hostprobe.probe()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
