"""Table registry: name -> explicit schema -> parquet path.

The reference never declares a schema -- every source's shape is
inferred at load time by the Snowflake connector from a pushed-down
query string (/root/reference/src/main/scala/App.scala:22-50, :25).
We instead pin an explicit ``StructType`` per table and *assert* it on
read: self-describing parquet plus a registry check means a schema
drift upstream fails loudly at the scan instead of silently three
joins later.

At 100 TB the scan is everything: we read parquet (columnar,
predicate/column pushdown to row groups), never ``inferSchema``, and
register temp views so queries can be written in either the DataFrame
API or SQL against the same relations.
"""

from __future__ import annotations

import functools as _functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_F = T.FloatType()
_D = T.DoubleType()
_I = T.IntegerType()
_L = T.LongType()
_S = T.StringType()
# Testdata parquet stores naive (isAdjustedToUTC=false) timestamps;
# Spark 4 surfaces those as TIMESTAMP_NTZ, which also matches DuckDB's
# naive TIMESTAMP -- no timezone coercion anywhere in the oracle path.
_TS = T.TimestampNTZType()


def _schema(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# Star schema (TPC-H-ish) + extension tables, per /root/repo/FIXTURES.md.
TABLES: dict[str, T.StructType] = {
    "region": _schema(("r_regionkey", _I), ("r_name", _S)),
    "nation": _schema(("n_nationkey", _I), ("n_name", _S), ("n_regionkey", _I)),
    "customer": _schema(
        ("c_custkey", _L), ("c_name", _S), ("c_nationkey", _I),
        ("c_acctbal", _D), ("c_mktsegment", _S),
    ),
    "supplier": _schema(
        ("s_suppkey", _L), ("s_name", _S), ("s_nationkey", _I), ("s_acctbal", _D),
    ),
    "part": _schema(
        ("p_partkey", _L), ("p_name", _S), ("p_brand", _S), ("p_type", _S),
        ("p_size", _I), ("p_retailprice", _D),
    ),
    "orders": _schema(
        ("o_orderkey", _L), ("o_custkey", _L), ("o_orderstatus", _S),
        ("o_totalprice", _D), ("o_orderdate", _TS), ("o_orderpriority", _S),
    ),
    "lineitem": _schema(
        ("l_orderkey", _L), ("l_partkey", _L), ("l_suppkey", _L),
        ("l_linenumber", _I), ("l_quantity", _D), ("l_extendedprice", _D),
        ("l_discount", _D), ("l_tax", _D), ("l_returnflag", _S),
        ("l_linestatus", _S), ("l_shipdate", _TS),
    ),
    "events": _schema(
        ("event_id", _L), ("ts", _TS), ("user_id", _L), ("event_type", _S),
        ("value", _D), ("props", _S),
    ),
    "documents": _schema(
        ("doc_id", _L), ("text", _S), ("lang", _S), ("source", _S),
        ("n_chars", _L),
    ),
    "embeddings": _schema(
        ("vec_id", _L), ("embedding", T.ArrayType(_F)), ("label", _I),
    ),
}

# Dimension tables small enough to broadcast to every executor at any
# realistic scale (region/nation are bounded by geography, not data
# volume).  Join planners in this package consult this set.
BROADCAST_TABLES = {"region", "nation", "supplier"}


# Applied after the scan + schema assertion; keyed by table name.
# (Empty since the testdata moved events.ts to plain TIMESTAMP(MICROS),
# which both Spark and DuckDB read natively as naive timestamps; kept
# as the hook for sources whose physical layout needs normalizing.)
POST_TRANSFORMS: dict = {}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Analyzed-DataFrame memo: (session, appId, sf_dir, name) -> DataFrame.
# ``spark.read.parquet`` re-lists the path and re-reads footers on
# every call -- a fixed driver-side tax per table per query.  A
# DataFrame is an immutable logical plan, so reusing it is exactly a
# catalog metadata cache (what any warehouse keeps); the DATA cache is
# untouched (``spark.catalog.clearCache()`` does not invalidate this).
# The SESSION must be part of the key: ``spark.newSession()`` shares
# the applicationId but owns a separate catalog, and a DataFrame built
# on one session registers temp views into THAT session -- reusing it
# across sessions silently strands views in the wrong catalog.  id()
# is stable here because the memoized DataFrame holds a reference to
# its session, keeping it alive.
_LOAD_MEMO: dict[tuple[int, str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str,
               assert_schema: bool = True) -> DataFrame:
    """Scan one registry table. Columnar parquet read; Catalyst handles
    predicate pushdown and column pruning downstream."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; registry has {sorted(TABLES)}")
    key = (id(spark), spark.sparkContext.applicationId, sf_dir, name)
    if key in _LOAD_MEMO:
        return _LOAD_MEMO[key]
    # Read with the file's own (self-describing) schema, then check it
    # against the registry -- inferring nothing, trusting nothing.
    df = spark.read.parquet(table_path(sf_dir, name))
    if assert_schema:
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in TABLES[name].fields}
        if got != want:
            raise ValueError(f"schema drift for {name}: {got} != {want}")
    if name in POST_TRANSFORMS:
        df = POST_TRANSFORMS[name](df)
    _LOAD_MEMO[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register every registry table as a temp view for spark.sql()."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# Text formats a warehouse drop zone typically lands (the reference's
# only source is a warehouse connector; file-format breadth is ours).
_TEXT_FORMATS = {"csv", "json"}


def load_table_any_format(spark: SparkSession, path: str, name: str,
                          fmt: str = "parquet") -> DataFrame:
    """Read a registry table from ``path`` in ``fmt`` (parquet / csv /
    json) with the registry schema applied EXPLICITLY -- text formats
    never go through ``inferSchema`` (inference is a full extra pass
    over the data and types drift run-to-run; at 100 TB both are
    disqualifying).  Parquet additionally gets the registry assertion;
    csv/json are cast by position-free column name.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; registry has {sorted(TABLES)}")
    schema = TABLES[name]
    if fmt == "parquet":
        df = spark.read.parquet(path)
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in schema.fields}
        if got != want:
            raise ValueError(f"schema drift for {name}: {got} != {want}")
    elif fmt in _TEXT_FORMATS:
        reader = spark.read.schema(schema)
        if fmt == "csv":
            reader = reader.option("header", "true")
        df = reader.format(fmt).load(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    if name in POST_TRANSFORMS:
        df = POST_TRANSFORMS[name](df)
    return df


# Bytes bound on the driver-side tiny-dim read: Spark's default
# autoBroadcastJoinThreshold.  A dimension over this is not "tiny"
# under any policy, and compile_tiny_dim has no session to read the
# live conf from (it is lru_cached on plain values by design).
_TINY_DIM_CAP_BYTES = 10 * 1024 * 1024


@_functools.lru_cache(maxsize=64)
def compile_tiny_dim(sf_dir: str, name: str, columns: tuple[str, ...],
                     max_rows: int = 200) -> tuple[tuple, ...] | None:
    """Driver-side read of a SCHEMA-BOUNDED dimension as plan-time
    literals, or ``None`` when the table is too big to compile.

    The tiny static dimensions (region: 5 rows, nation: 25 -- bounded
    by the data model, not the scale factor) cost a broadcast-exchange
    stage per join at runtime; reading them with pyarrow on the driver
    (~ms, no Spark job -- the createDataFrame route costs a full job,
    see plans/bands.py) lets a plan inline them as IN-filters and CASE
    maps, deleting those stages.  This is broadcast-by-compilation:
    same data flow, resolved at plan time.

    The ``max_rows`` cap is the scale guard: a dimension that grew
    past it (someone pointed the loader at customer) returns None and
    the caller MUST fall back to the broadcast join -- compiling an
    unbounded relation into a SQL literal is how plans stop being
    plans.  A BYTES pre-gate (``gates.path_fits`` -- the shared size-
    gate implementation, r10 VERDICT #4) runs before the driver read:
    the old guard checked ``num_rows`` only AFTER pyarrow had
    materialized the whole table on the driver, so a mispointed
    multi-GB path paid (or OOM'd on) the read the guard existed to
    prevent.  The cap is the broadcast-policy default (10 MiB --
    anything bigger is not a "tiny dim" under any policy), so the
    read this function can ever issue is bounded.  Cached per
    (sf_dir, table, columns): the dims are static within a run."""
    import pyarrow.parquet as pq

    from location_summary_etl_spark.operators.gates import path_fits

    path = table_path(sf_dir, name)
    if not path_fits(path, cap_bytes=_TINY_DIM_CAP_BYTES):
        return None
    t = pq.read_table(path, columns=list(columns))
    if t.num_rows > max_rows:
        return None
    d = t.to_pydict()
    return tuple(zip(*(d[c] for c in columns)))
