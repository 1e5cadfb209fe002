"""Capture ``explain("formatted")`` for the bench families into
``plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt`` (default r13) --
the judge-readable evidence behind every plan claim in
OPTIMIZATION_r{N}.md (Exchange count, join strategy,
PushedFilters/ReadSchema, WholeStageCodegen spans,
Batch/ArrowEvalPython nodes).

Driver-only: ``explain`` plans without executing, so this never
competes with a timing run for the machine.  With AQE on the captured
text is the initial physical plan (``AdaptiveSparkPlan
isFinalPlan=false``) -- exchange placement, join strategy and scan
pushdown are all decided there; AQE can only coalesce/convert at
runtime, which the bench numbers already reflect.

Usage:
    python tools/capture_plans.py <tag> [query ...]
tag is the file suffix ("before"/"after"); with no query names every
HEADLINE + EXTRAS entry is captured.
"""

from __future__ import annotations

import io
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as contract
    from bench import EXTRAS, HEADLINE
    from location_summary_etl_spark.session import get_session

    spark = get_session(app_name="capture_plans")
    qs = contract.queries()
    names = only or [n for n in HEADLINE + EXTRAS if n in qs]

    out_dir = os.path.join(
        _ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        # _explainString mirrors explain() but returns the text
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with io.open(os.path.join(out_dir, f"{name}_{tag}.txt"),
                     "w", encoding="utf-8") as f:
            f.write(text)
        print(name, "->", f"{name}_{tag}.txt")


if __name__ == "__main__":
    main()
