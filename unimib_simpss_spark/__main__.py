"""Command-line entry point: run any registered query standalone.

The same surface the driver contract exposes (`__spark_entry__.py`),
usable directly or under spark-submit on a cluster::

    python -m unimib_simpss_spark --list
    python -m unimib_simpss_spark q01_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m unimib_simpss_spark q38_decontamination --explain
    python -m unimib_simpss_spark q62_corpus_pipeline --out /tmp/out.parquet
    spark-submit --py-files dist/unimib_simpss_spark.zip \
        -m unimib_simpss_spark q34_hash_band_pairs --sf-dir s3://bucket/sf100

Replaces the reference's per-pipeline scripts (link_mqtt_kafka.py /
link_kafka_cassandra.py / cass.py entry points) with one query-addressed
launcher over the registered inventory.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    from unimib_simpss_spark.plans import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()

    ap = argparse.ArgumentParser(
        prog="python -m unimib_simpss_spark",
        description="Run a registered query against a testdata scale dir.",
    )
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan, don't run"
    )
    ap.add_argument(
        "--lint",
        action="store_true",
        help="run the scale linter on the query's plan (rc=1 on error-"
        "severity findings), don't run the query",
    )
    ap.add_argument(
        "--check",
        action="store_true",
        help="run the DuckDB oracle alongside and compare (rc=1 on mismatch)",
    )
    ap.add_argument(
        "--out", default=None, help="write result parquet here instead of showing"
    )
    ap.add_argument("--show", type=int, default=20, help="rows to show (default 20)")
    args = ap.parse_args(argv)

    if args.list or not args.query:
        for name in sorted(qs):
            tag = "oracle-paired" if name in oracles else "rows-only"
            print(f"{name:36s} {tag}")
        return 0
    if args.query not in qs:
        print(f"unknown query {args.query!r}; --list shows the inventory",
              file=sys.stderr)
        return 2

    from unimib_simpss_spark.operators.caching import release_result
    from unimib_simpss_spark.session import get_spark

    spark = get_spark(app_name=f"simpss-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.check:
        from unimib_simpss_spark.testing import compare_query, duckdb_connection

        if args.query not in oracles:
            print(f"{args.query} is rows-only (no oracle); run its pytest "
                  "invariants instead", file=sys.stderr)
            return 2
        r = compare_query(
            spark, duckdb_connection(args.sf_dir), args.query,
            qs[args.query], oracles[args.query], args.sf_dir,
        )
        print(f"{args.query}: {'OK' if r.ok else 'MISMATCH'} "
              f"({r.spark_rows} rows vs oracle {r.oracle_rows})")
        if not r.ok:
            for m in r.mismatches[:5]:
                print(" ", m)
        return 0 if r.ok else 1

    t0 = time.perf_counter()
    df = qs[args.query](spark, args.sf_dir)
    if args.lint:
        from unimib_simpss_spark.operators.plan_lint import lint_plan

        findings = lint_plan(df)
        for f in findings:
            print(f"[{f.severity}] {f.rule}: {f.detail}")
        return 1 if any(f.severity == "error" for f in findings) else 0
    if args.explain:
        df.explain("formatted")
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"{args.query}: {n} rows -> {args.out} "
              f"({time.perf_counter() - t0:.2f}s)")
    else:
        df.show(args.show, truncate=False)
        print(f"{args.query}: {df.count()} rows ({time.perf_counter() - t0:.2f}s)")
    release_result(df)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
