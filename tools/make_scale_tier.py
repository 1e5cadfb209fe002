"""Self-generated bench tier: replicate a base sf dir N times with
re-keyed rows, so the sf0.01 -> sf0.1 scale trend gets a third,
~10x point (the round-4 verdict's "demonstrate the 2x crossover with
data" item -- the floor-bound defense predicts the Spark/DuckDB ratio
falls as data grows, and only a bigger tier can show it).

Method: for replica i in 0..N-1, every key column is offset by
i * (max_key + 1) of its table, so foreign keys stay consistent
(replica i's orders point at replica i's customers) and the workload
scales linearly -- N x customers each with the same order count, N x
users each with the same session structure.  Dimension tables
(region, nation) are NOT replicated: like TPC-H, they are fixed-size
at every scale factor.  Two content tweaks keep workload SHAPE
comparable rather than degenerate:

* documents: replica i>0 gets a 3-char suffix appended to ``text``
  (and n_chars recomputed), so exact/near-dup structure is preserved
  per replica instead of every doc gaining 9 exact copies (which
  would blow bucket pair counts ~100x and measure a different
  problem);
* embeddings: replica i>0 perturbs each float by i * 1e-6, so ANN
  top-k doesn't become a pure tie-break contest.

Replica 0 is byte-identical to the base tier.

Usage:
    python tools/make_scale_tier.py [N] [BASE_DIR] [OUT_DIR]
defaults: N=10, BASE=/root/testdata/sf0.1, OUT=bench_tiers/sf1.
Output is ~10x the base bytes; the dir is gitignored (regenerate on
demand, deterministic).
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {column: key-offset table} (offset = i * (max(col)+1) of
# the OWNING table, so FKs line up with the replicated PKs)
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_ONLY = ["region", "nation"]


def _stride(con, base: str, spec: str) -> int:
    if ":" in spec:
        table, col = spec.split(":")
    else:
        table = spec
        col = {"customer": "c_custkey", "supplier": "s_suppkey",
               "part": "p_partkey", "orders": "o_orderkey",
               "events": "event_id", "documents": "doc_id",
               "embeddings": "vec_id"}[table]
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{base}/{table}.parquet'"
    ).fetchone()[0]


def make_tier(n: int, base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONLY:
        con.execute(f"COPY (SELECT * FROM '{base}/{t}.parquet') TO "
                    f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    for t, keycols in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{base}/{t}.parquet'").fetchall()]
        exprs = []
        for c in cols:
            if c in keycols:
                stride = _stride(con, base, keycols[c])
                exprs.append(f"({c} + i * {stride}) AS {c}")
            elif c in ("s_name", "c_name"):
                # these are UNIQUE PER KEY in the base data, and
                # corpus entries legitimately group/join on them
                # (waiting_supplier_orders, top_revenue_supplier,
                # returned_item_top_customers, cte_latest_order_sql)
                # -- replicating them verbatim would merge 10 keys
                # under one name and change those queries' semantics
                # (found by the r11 sf1 soak: Q21 returned 10000 rows
                # by key vs 1000 by name).  Suffix on i>0, replica 0
                # stays byte-identical.
                exprs.append(
                    f"CASE WHEN i = 0 THEN {c}"
                    f" ELSE {c} || '-r' || i END AS {c}")
            elif t == "documents" and c == "text":
                # suffix only on i>0 so replica 0 stays byte-identical
                exprs.append(
                    "CASE WHEN i = 0 THEN text"
                    " ELSE text || ' r' || i END AS text")
            elif t == "documents" and c == "n_chars":
                exprs.append(
                    "CASE WHEN i = 0 THEN n_chars ELSE"
                    " length(text || ' r' || i) END AS n_chars")
            elif t == "embeddings" and c == "embedding":
                exprs.append(
                    "CAST(list_transform(embedding,"
                    " x -> x + i * 0.000001) AS FLOAT[]) AS embedding")
            else:
                exprs.append(c)
        sql = (f"COPY (SELECT {', '.join(exprs)} "
               f"FROM '{base}/{t}.parquet' CROSS JOIN range({n}) AS r(i) "
               f"ORDER BY i) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        con.execute(sql)
        rows = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {rows} rows")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (sys.argv[3] if len(sys.argv) > 3
           else os.path.join(os.path.dirname(os.path.dirname(
               os.path.abspath(__file__))), "bench_tiers", "sf1"))
    make_tier(n, base, out)
