"""Dataset-assembly corpus: the composite queries a training-data
pipeline runs between raw corpus and tokens -- interval joins over
event streams, deterministic train/val splitting, sequence packing,
and the end-to-end cleaning pipeline that chains language ID, quality
scoring, exact dedup, and MinHash near-dup removal.

These exercise operator COMPOSITION: each stage is an operator that is
also oracle-gated on its own (corpus_text / corpus_dedup), and the
pipeline query proves the lineages compose into one Catalyst plan with
no driver-side materialization between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.texts import STOPWORDS
from location_summary_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dups,
)
from location_summary_etl_spark.operators.graph import connected_components
from location_summary_etl_spark.operators.textstats import EN_TRIGRAMS
from location_summary_etl_spark.operators.packing import (
    hash_split,
    hash_split_sql,
    pack_sequences,
    pack_sequences_sql,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.plans.corpus_dedup import minhash_near_dup_sql
from location_summary_etl_spark.sources.registry import load_table

QUALITY_MIN = 38.0     # 0-100 quality floor for corpus_clean
NEAR_DUP_EST = 0.8     # MinHash est-Jaccard above which the higher id drops


# ------------------------------------------------- interval join (events)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: how many views the same user made in the 10
    minutes before it (interval/band join -- §2.D 'absent' join kind).

    Shape at scale: equi-join on user_id (shuffle by user) with the
    time band as a residual predicate; per-user event counts bound the
    fan-out, never |events|^2.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    j = purchases.join(
        views,
        (purchases["user_id"] == views["v_user"])
        & (views["v_ts"] >= purchases["p_ts"] - F.expr("INTERVAL 10 MINUTES"))
        & (views["v_ts"] < purchases["p_ts"]),
        "left",
    )
    return j.groupBy("event_id", "user_id").agg(
        F.count("v_ts").alias("n_views_10m")
    )


EVENTS_INTERVAL_JOIN_SQL = """
SELECT p.event_id, p.user_id, COUNT(v.ts) AS n_views_10m
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 10 MINUTE
 AND v.ts < p.ts
GROUP BY p.event_id, p.user_id
"""


# ------------------------------------------------------- split / packing
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_split(load_table(spark, sf_dir, "documents"))


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load_table(spark, sf_dir, "documents"))


# ------------------------------------------------------- cleaning pipeline
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving (doc_id, quality_score) after the four cleaning gates:

    1. language: trigram heuristic says English;
    2. quality: score >= QUALITY_MIN;
    3. exact dedup: doc is its content-digest group's canonical
       (lowest) id;
    4. near-dup: doc is not the higher id of any MinHash pair with
       est Jaccard >= NEAR_DUP_EST.

    Gates 1+2 are pure per-row scalars, so they are FUSED into one
    projection over one documents scan (composing ``lang_id`` and
    ``token_stats`` as relations would re-scan the text and shuffle
    twice for semi joins between two maps).  The projection carries a
    non-deterministic barrier column: without it, PushDownPredicates
    substitutes the filter's derived columns all the way into the
    parquet scan, re-evaluating the tokenize/trigram arrays per gate
    (measured 17x on this query -- 9.5s vs 0.6s at sf0.1 for the lang
    gate alone).  Gates 3+4 are genuine relational memberships (one
    semi join on the digest canonical set, one anti join on the
    MinHash drop set), each an oracle-gated operator of its own.
    """
    from location_summary_etl_spark.functions.texts import char_shingles, tokens
    from location_summary_etl_spark.functions.scalars import round_portable
    from location_summary_etl_spark.operators.textstats import _count_in_array
    from location_summary_etl_spark.session import (
        ensure_parallelism,
        filter_behind_barrier,
    )

    docs = load_table(spark, sf_dir, "documents")

    base = ensure_parallelism(docs, by="doc_id").select(
        "doc_id",
        tokens("text").alias("_toks"),
        char_shingles("text", 3).alias("_tris"),
    )
    toks, tris = F.col("_toks"), F.col("_tris")
    n_tokens = F.size(toks)
    quality = round_portable(
        F.lit(50.0) * F.size(F.array_distinct(toks)) / n_tokens
        + F.lit(50.0) * F.least(n_tokens, F.lit(200)) / F.lit(200.0),
        2,
    )
    tri_hits = sum(_count_in_array(tris, t) for t in EN_TRIGRAMS)
    n_tris = F.size(tris)
    en_ok = (n_tris > 0) & (tri_hits / n_tris >= 0.02)
    stats = base.select(
        "doc_id",
        quality.alias("quality_score"),
        en_ok.alias("_en_ok"),
    )
    gated = filter_behind_barrier(
        stats, F.col("_en_ok") & (F.col("quality_score") >= QUALITY_MIN)
    ).select("doc_id", "quality_score")

    canonical = exact_dedup(docs, ["text"], "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    drop = minhash_near_dups(docs, threshold=NEAR_DUP_EST).select(
        F.col("id_b").alias("doc_id")
    )
    return (
        gated
        .join(canonical, "doc_id", "left_semi")
        .join(drop, "doc_id", "left_anti")
    )


# --------------------------------------------------- dedup clustering
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every doc's near-dup cluster id = min doc_id of its transitive
    MinHash-pair component (self if no near-dups).  Iterative min-label
    propagation (operators/graph.py) -- the one corpus algorithm that
    is a driver-side loop of DataFrame rounds rather than a single
    plan; the oracle is the equivalent recursive-CTE closure."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dups(docs, threshold=0.5)
    return connected_components(
        docs, pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE
pairs AS (SELECT id_a, id_b FROM ({minhash_near_dup_sql(0.5)}) t),
edges(a, b) AS (
    SELECT id_a, id_b FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_id
FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
GROUP BY d.doc_id
"""


_STOP_HITS = " + ".join(
    f"len(list_filter(toks, x -> x = '{w}'))" for w in STOPWORDS
)
_TRI_HITS = " + ".join(
    f"len(list_filter(tris, x -> x = '{t}'))" for t in EN_TRIGRAMS
)

CORPUS_CLEAN_SQL = f"""
WITH toks AS (
    SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
),
quality AS (
    SELECT doc_id,
           round(CAST(50.0 * len(list_distinct(toks)) / len(toks)
                 + 50.0 * least(len(toks), 200) / 200.0 AS DOUBLE), 2)
               AS quality_score
    FROM toks
),
tri AS (
    SELECT doc_id,
           list_transform(generate_series(1, greatest(length(text) - 2, 0)),
                          i -> substr(text, CAST(i AS INT), 3)) AS tris
    FROM documents
),
lang_ok AS (
    SELECT doc_id FROM tri
    WHERE len(tris) > 0
      AND CAST(({_TRI_HITS}) AS DOUBLE) / len(tris) >= 0.02
),
canonical AS (
    SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
nd AS (
    SELECT DISTINCT id_b FROM ({minhash_near_dup_sql(NEAR_DUP_EST)}) t
)
SELECT q.doc_id, q.quality_score
FROM quality q
WHERE q.quality_score >= {QUALITY_MIN}
  AND q.doc_id IN (SELECT doc_id FROM lang_ok)
  AND q.doc_id IN (SELECT doc_id FROM canonical)
  AND q.doc_id NOT IN (SELECT id_b FROM nd)
"""

register("events_interval_join", events_interval_join, EVENTS_INTERVAL_JOIN_SQL)
register("corpus_train_val_split", corpus_train_val_split, hash_split_sql())
register("corpus_pack_sequences", corpus_pack_sequences, pack_sequences_sql())
register("corpus_clean", corpus_clean, CORPUS_CLEAN_SQL)
register("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_SQL)
