"""Local stand-in for the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at the
given scale factor, then compares row count, column names, and an
order-insensitive value comparison (cells stringified with float rounding,
rows sorted).  Exit code 1 on any mismatch.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from big_data_lab_three_spark.queries import load_all
    from big_data_lab_three_spark.session import get_spark

    registry = load_all()
    spark = get_spark("verify_local")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        try:
            sdf = q.spark(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        finally:
            # don't leak persisted intermediates into later queries
            spark.catalog.clearCache()
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(q.oracle)
            d_cols = [c.lower() for c in [d[0] for d in res.description]]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={s_cols} duckdb={d_cols}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if not problems:
            cs = canon_rows(s_cols, s_rows)
            cd = canon_rows(d_cols, d_rows)
            if cs != cd:
                diff = [
                    (a, b) for a, b in zip(cs, cd) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: {len(s_rows)} rows match oracle")

    print(f"\n{len(registry) - len(failures)}/{len(registry)} queries ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
