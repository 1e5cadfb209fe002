"""Corpus-quality and event-quality entries: Gopher/C4-style document
quality gates, token-length histograms, trailing z-score anomaly
flags, and click->purchase conversion attribution.

These are the remaining "would a 100 TB training-data pipeline need
it" operators (BASELINE.json north star): quality filtering runs
before dedup in every pre-training corpus build, and the two event
entries are the monitoring/attribution shapes run next to it.  The
reference's surface has no analogue (SURVEY §2.D); each entry is
oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import (
    avg_fixed_point,
    fixed_units,
    round_portable,
)
from location_summary_etl_spark.operators.textstats import doc_quality_rules
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.sources.registry import load_table


# ------------------------------------------------------------ quality rules
def corpus_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition/shape statistics + keep verdict
    (operators/textstats.py doc_quality_rules): one map-side
    projection, no shuffle at any scale."""
    from location_summary_etl_spark.session import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return doc_quality_rules(ensure_parallelism(docs, by="doc_id"))


# The oracle computes the same statistics through the explode +
# two-level-count formulation -- different plan, same values, which is
# exactly the claim (the Spark side's sorted run-length fold must agree
# with the classic count-max).
register("corpus_quality_rules", corpus_quality_rules, """
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
w AS (SELECT doc_id, unnest(toks) AS w FROM tok),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
wagg AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_words,
           COUNT(*) AS n_distinct,
           MAX(c) AS top_word,
           SUM(c * len(w)) AS sum_len
    FROM wc GROUP BY 1
),
bg AS (
    SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS b
    FROM tok, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
),
bgc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
bgagg AS (
    SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram
    FROM bgc GROUP BY 1
),
j AS (
    SELECT w.doc_id, w.n_words,
           round(CAST(w.n_distinct AS DOUBLE) / w.n_words, 4) AS ttr,
           round(CAST(w.top_word AS DOUBLE) / w.n_words, 4) AS top_word_frac,
           round(CAST(b.top_bigram AS DOUBLE) / b.n_bigrams, 4)
               AS top_bigram_frac,
           round(CAST(w.sum_len AS DOUBLE) / w.n_words, 4) AS mean_word_len
    FROM wagg w LEFT JOIN bgagg b ON w.doc_id = b.doc_id
)
SELECT doc_id, n_words, ttr, top_word_frac, top_bigram_frac, mean_word_len,
       (n_words >= 20 AND ttr >= 0.30 AND top_word_frac <= 0.15
        AND mean_word_len >= 3.0 AND mean_word_len <= 8.0) AS keep
FROM j
""")


# ------------------------------------------------------- length histogram
HIST_BUCKET_WORDS = 10
HIST_MAX_BUCKET = 9


def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count distribution of the corpus: docs bucketed by
    word count (HIST_BUCKET_WORDS-wide buckets, top-coded at
    HIST_MAX_BUCKET) with per-bucket doc counts and average length.
    The length is a map-side ``size(split(...))`` — the histogram is
    one small aggregate, the classic first look at a new corpus."""
    from location_summary_etl_spark.functions.texts import tokens

    docs = load_table(spark, sf_dir, "documents").select("text")
    n_words = F.size(tokens("text"))
    bucket = F.least(
        F.floor(n_words / HIST_BUCKET_WORDS), F.lit(HIST_MAX_BUCKET)
    ).cast("int")
    return (
        docs.select(n_words.alias("_n"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            # integral counts: exact long sum / count (fixed-point
            # policy, scalars.py)
            avg_fixed_point("_n", 0, 4).alias("avg_words"),
        )
    )


register("corpus_length_histogram", corpus_length_histogram, f"""
SELECT CAST(LEAST(FLOOR(len(string_split(text, ' ')) / {HIST_BUCKET_WORDS}),
                  {HIST_MAX_BUCKET}) AS INT) AS bucket,
       COUNT(*) AS n_docs,
       round(CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                  / (1.0 * COUNT(*)) AS DOUBLE), 4) AS avg_words
FROM documents
GROUP BY 1
""")


# --------------------------------------------------------- z-score anomaly
ANOM_TRAIL = 10  # trailing events in the baseline window
ANOM_MIN_TRAIL = 5
ANOM_Z = 2.0


def events_value_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing z-score outliers: each event's value against
    the mean/stddev of the user's previous ANOM_TRAIL events; emit
    events whose |z| exceeds ANOM_Z (given >= ANOM_MIN_TRAIL trailing
    points).  One exchange on user_id serves both window aggregates —
    the streaming-monitor shape run as a batch audit.

    z is computed on ROUNDED mean/std (4dp) and itself rounded (3dp)
    in both engines, so float summation-order noise cannot flip the
    threshold comparison the oracle hashes."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-ANOM_TRAIL, -1))
    base = ev.select(
        "event_id", "user_id", "ts", "value",
        F.count("value").over(w).alias("_n"),
        round_portable(
            F.sum(fixed_units("value", 2)).over(w)
            / (F.lit(100.0) * F.count("value").over(w)), 4
        ).alias("_m"),
        round_portable(F.stddev_samp("value").over(w), 4).alias("_s"),
    )
    z = round_portable((F.col("value") - F.col("_m")) / F.col("_s"), 3)
    return (
        base.filter(F.col("_n") >= ANOM_MIN_TRAIL)
        .select("event_id", "user_id",
                round_portable(F.col("value"), 4).alias("value"),
                z.alias("z"))
        .filter(F.abs(F.col("z")) > ANOM_Z)
    )


register("events_value_anomaly", events_value_anomaly, f"""
WITH b AS (
    SELECT event_id, user_id, value,
           COUNT(value) OVER w AS n,
           round(CAST(SUM(CAST(round((value) * 100, 0) AS BIGINT)) OVER w
                      / (100.0 * COUNT(value) OVER w) AS DOUBLE), 4) AS m,
           round(CAST(STDDEV_SAMP(value) OVER w AS DOUBLE), 4) AS s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {ANOM_TRAIL} PRECEDING AND 1 PRECEDING)
),
z AS (
    SELECT event_id, user_id,
           round(CAST(value AS DOUBLE), 4) AS value,
           round(CAST((value - m) / s AS DOUBLE), 3) AS z
    FROM b WHERE n >= {ANOM_MIN_TRAIL}
)
SELECT * FROM z WHERE abs(z) > {ANOM_Z}
""")


# -------------------------------------------------- conversion attribution
def events_conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: for every purchase, the
    user's first and most recent preceding click plus how many clicks
    preceded it.  One exchange on user_id; the three attributions are
    conditional window aggregates over the same sort (first/last with
    ignore-nulls over the running frame — the LOCF pattern pointed at
    marketing attribution instead of gap-filling)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    return (
        ev.select(
            "event_id", "user_id", "ts", "event_type",
            F.first(click_id, ignorenulls=True).over(w).alias("first_click_id"),
            F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
            F.count(click_id).over(w).alias("n_prior_clicks"),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "first_click_id", "last_click_id",
                "n_prior_clicks")
    )


register("events_conversion_attribution", events_conversion_attribution, """
WITH a AS (
    SELECT event_id, user_id, event_type,
           FIRST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                       IGNORE NULLS) OVER w AS first_click_id,
           LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                      IGNORE NULLS) OVER w AS last_click_id,
           COUNT(CASE WHEN event_type = 'click' THEN event_id END)
               OVER w AS n_prior_clicks
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, first_click_id, last_click_id, n_prior_clicks
FROM a WHERE event_type = 'purchase'
""")


# ---------------------------------------------------- per-source report
def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus report card per ingestion source: doc count, quality
    keep-rate (composing doc_quality_rules), average length, and the
    dominant language (max_by argmax — no window).  The one-page
    summary a corpus build publishes per snapshot; the quality stats
    stay map-side, so the whole report is ONE aggregate over the
    documents scan plus a lang-count argmax rejoin."""
    from location_summary_etl_spark.session import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source")
    rules = doc_quality_rules(ensure_parallelism(docs, by="doc_id")).select(
        "doc_id", "n_words", "keep")
    joined = docs.select("doc_id", "lang", "source").join(rules, "doc_id")
    per_source = joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        avg_fixed_point(F.col("keep").cast("int"), 0, 4).alias("keep_rate"),
        avg_fixed_point("n_words", 0, 4).alias("avg_words"),
    )
    lang_counts = (
        joined.groupBy("source", "lang").agg(F.count("*").alias("_c"))
        .groupBy("source")
        .agg(F.max_by("lang", F.struct(F.col("_c"), F.col("lang")))
             .alias("top_lang"))
    )
    return per_source.join(lang_counts, "source")


register("corpus_source_report", corpus_source_report, """
WITH tok AS (
    SELECT doc_id, lang, source, string_split(text, ' ') AS toks
    FROM documents
),
w AS (SELECT doc_id, unnest(toks) AS w FROM tok),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
wagg AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
           COUNT(*) AS n_distinct, MAX(c) AS top_word,
           SUM(c * len(w)) AS sum_len
    FROM wc GROUP BY 1
),
q AS (
    SELECT doc_id, n_words,
           (n_words >= 20
            AND round(CAST(n_distinct AS DOUBLE) / n_words, 4) >= 0.30
            AND round(CAST(top_word AS DOUBLE) / n_words, 4) <= 0.15
            AND round(CAST(sum_len AS DOUBLE) / n_words, 4) >= 3.0
            AND round(CAST(sum_len AS DOUBLE) / n_words, 4) <= 8.0) AS keep
    FROM wagg
),
j AS (SELECT t.doc_id, t.lang, t.source, q.n_words, q.keep
      FROM tok t JOIN q USING (doc_id)),
per_source AS (
    SELECT source, COUNT(*) AS n_docs,
           round(CAST(SUM(CAST(keep AS INT)) / (1.0 * COUNT(keep))
                 AS DOUBLE), 4) AS keep_rate,
           round(CAST(SUM(CAST(n_words AS BIGINT)) / (1.0 * COUNT(n_words))
                 AS DOUBLE), 4) AS avg_words
    FROM j GROUP BY 1
),
lc AS (SELECT source, lang, COUNT(*) AS c FROM j GROUP BY 1, 2),
top_lang AS (
    SELECT source, lang AS top_lang FROM (
        SELECT source, lang,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY c DESC, lang DESC) AS rn
        FROM lc
    ) WHERE rn = 1
)
SELECT p.source, p.n_docs, p.keep_rate, p.avg_words, t.top_lang
FROM per_source p JOIN top_lang t USING (source)
""")


# ----------------------------------------------- LM-based quality score
def corpus_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality scoring: train an add-k
    bigram model on the train split (doc_id % 10 < 8) and score every
    eval-split document by its mean bigram log-likelihood -- the
    perplexity filter real corpus builds run between quality rules and
    dedup (low-likelihood text is boilerplate/garble; CCNet buckets on
    exactly this statistic, via KenLM).

    Model and score are ONE Spark lineage, no driver state: bigram and
    context counts are groupBys over the flat posexploded token
    stream (the contamination-check shape: ``element_at`` pairs, no
    gram strings), the vocabulary size is a 1-row broadcast (scalar
    subquery shape), and scoring is two shuffle joins of the eval
    bigram stream against the count tables -- at 100 TB every piece
    scales as counts tables, never as a collected model.  add-k
    smoothing (k=0.5): P(w2|w1) = (c12 + k) / (c1 + k*V), with c1 the
    CONTEXT count (bigram starts, not raw unigrams) so probabilities
    per context sum to 1 and both engines replay the same definition.
    """
    from location_summary_etl_spark.functions.texts import tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    idx = F.when(F.size("toks") >= 2,
                 F.sequence(F.lit(1), F.size("toks") - 1)
                 ).otherwise(F.array().cast("array<int>"))
    big = (toks.select("doc_id", "toks", F.explode(idx).alias("i"))
           .select("doc_id",
                   F.element_at("toks", F.col("i")).alias("w1"),
                   F.element_at("toks", F.col("i") + 1).alias("w2")))
    train = big.filter(F.col("doc_id") % 10 < 8)
    ctx = train.groupBy("w1").agg(F.count("*").alias("c1"))
    pair = train.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    vocab = train.agg(F.countDistinct("w1").alias("v"))

    ev = big.filter(F.col("doc_id") % 10 >= 8)
    k = F.lit(0.5)
    scored = (
        ev.join(pair, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", F.log(
            (F.coalesce("c12", F.lit(0)) + k)
            / (F.coalesce("c1", F.lit(0)) + k * F.col("v"))
        ).alias("logp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        round_portable(F.avg("logp"), 4).alias("avg_logp"),
    )


register("corpus_lm_perplexity", corpus_lm_perplexity, """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
big AS (
    SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2
    FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS i(i)
    WHERE len(t) >= 2
),
train AS (SELECT * FROM big WHERE doc_id % 10 < 8),
ctx AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
pair AS (SELECT w1, w2, COUNT(*) AS c12 FROM train GROUP BY w1, w2),
v AS (SELECT COUNT(DISTINCT w1) AS v FROM train)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       round(CAST(AVG(ln((COALESCE(c12, 0) + 0.5)
                         / (COALESCE(c1, 0) + 0.5 * v.v))) AS DOUBLE), 4)
           AS avg_logp
FROM big b
LEFT JOIN pair USING (w1, w2)
LEFT JOIN ctx USING (w1)
CROSS JOIN v
WHERE b.doc_id % 10 >= 8
GROUP BY b.doc_id
""")
