"""Skew mitigation for large joins (SURVEY §4 / 100 TB design).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions.  ``salted_join`` is
the explicit fallback for the pathological case AQE can't fix: a join
key so hot that a single key's rows exceed one task's memory even after
splitting -- e.g. joining a clickstream fact against a mid-sized
dimension where 30% of rows share one key, with the dimension too large
to broadcast outright.

Mechanics: the fact side gets a deterministic salt in [0, n_salts)
hashed from its row content; the dimension side is exploded n_salts
ways; the join runs on (key, salt), spreading each hot key over
``n_salts`` shuffle partitions.  Dimension inflation costs
|dim| * n_salts rows, which is the standard trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                n_salts: int = 16, how: str = "inner",
                salt_cols: list[str] | None = None) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, salted ``n_salts``
    ways.  Output columns match ``fact.join(dim, on, how)``.

    ``salt_cols``: fact columns hashed into the salt (defaults to all
    fact columns -- deterministic, so retried tasks re-derive the same
    salt; never use rand() for this, a task retry would reshuffle rows
    to a different salt mid-query).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    cols = salt_cols or fact.columns
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = salted_fact.join(salted_dim, [on, "__salt"], how)
    return out.drop("__salt")
