#!/usr/bin/env python
"""Capture ``explain("formatted")`` for registered queries WITHOUT the
eager checkpoint truncating the plan.

The registry hands out eagerly-checkpointed handles (operators/caching),
so a plain ``.explain()`` on the returned DataFrame shows only a
``Scan ExistingRDD`` over the checkpoint blocks — useless for plan
audits. This harness patches the caching layer for the capture session:

- ``_checkpoint``/``checkpoint_result``/``materialize_release`` return
  the input unchanged (no eager materialization, full lineage);
- ``release_intermediate``/``release_result`` become no-ops so the
  shared ``persist()`` caches stay alive and cache substitution still
  shows ``InMemoryRelation`` barriers exactly as the real run plans
  them (unpersisting before ``explain`` would drop the barriers and
  show a plan the engine never executes).

Caches leak for the life of the capture session by design; the session
exits afterwards. Usage:

    python tools/capture_plans.py OUTDIR SUFFIX [query ...]

with no query names, captures every bench HEADLINE query.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unimib_simpss_spark.operators import caching  # noqa: E402


def _patch_caching() -> None:
    caching._checkpoint = lambda df: df
    caching.checkpoint_result = lambda df: df
    caching.materialize_release = lambda result, *caches: result
    caching.release_intermediate = lambda df: None
    caching.release_result = lambda df: None


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    _patch_caching()
    # plans/* modules bind the helpers at import time in places — patch
    # any already-imported references too
    import importlib
    import pkgutil

    import unimib_simpss_spark

    for mod_name, mod in list(sys.modules.items()):
        # scope to this package — overwriting same-named attributes on
        # unrelated third-party modules could clobber their API
        # (ADVICE r18)
        if not mod_name.startswith("unimib_simpss_spark"):
            continue
        for attr in (
            "checkpoint_result",
            "materialize_release",
            "release_intermediate",
            "release_result",
        ):
            if getattr(mod, attr, None) is not None and mod is not caching:
                try:
                    setattr(mod, attr, getattr(caching, attr))
                except Exception:
                    pass

    from unimib_simpss_spark.plans import registry
    from unimib_simpss_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    if not names:
        names = list(qs)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
