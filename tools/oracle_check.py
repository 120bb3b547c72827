#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet (written by graft.Verify) plus
<out>/oracle_sql.json, runs each oracle in DuckDB over the sf parquet
tables, and compares: column names (sorted), row count, and exact cell
values on rows sorted by all columns. Reports near-misses for floats.
"""
import sys, os, json, math
import duckdb
import pandas as pd


def strict_cell(v):
    """Driver-faithful canonicalization: datetimes normalized, everything
    else str()'d. The driver loads Spark output via pandas (Decimals stay
    Decimal) but the oracle via .df() (Decimals become float64) — so any
    DECIMAL output column whose str differs from the float repr mismatches.
    Running this catches output-type divergence that exact == compare hides."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            # The strict path is the byte-faithful driver replica: a
            # tz-aware timestamp means a scale dir written BEFORE
            # ScaleGen.writeNaive (LTZ annotation) — regenerate it.
            raise ValueError(
                f"tz-aware timestamp {v!r} in strict compare: stale "
                "pre-writeNaive generated dir — regenerate the scale dir")
        return v.isoformat()
    tn = type(v).__name__
    if tn in ("date", "datetime"):
        return pd.Timestamp(v).isoformat()
    if tn == "NaTType":
        return "<null>"
    if isinstance(v, (list, tuple)) or tn == "ndarray":
        return "[" + ",".join(strict_cell(x) for x in v) + "]"
    return str(v)


def driver_canonical(df):
    """The driver's canonicalization: sort_values over ALL columns. This
    throws on ndarray/list cells (r8: emb_random_projection), so a local
    pass here predicts the driver gate — do NOT pre-flatten."""
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def nonscalar_cols(df):
    """Columns whose cells the driver's sort can't order (list/ndarray/
    dict/tuple) — any hit is a hard FAIL before comparing values."""
    bad = []
    for c in df.columns:
        s = df[c].dropna()
        if len(s) and isinstance(s.iloc[0], (list, tuple, dict)) or \
           (len(s) and type(s.iloc[0]).__name__ == "ndarray"):
            bad.append(c)
    return bad


def strict_compare(name, out_dir, con, sql):
    """Mimic the driver's hash compare: pandas-parquet vs duckdb .df(),
    rows canonicalized via sort_values (driver-faithful — crashes on
    non-scalar cells exactly where the driver does)."""
    sp = pd.read_parquet(out_dir)
    dk = con.execute(sql).df()
    sp = sp[sorted(sp.columns)]
    dk = dk[sorted(dk.columns)]
    # In --strict-only runs this is the ONLY compare, and the row zip below
    # silently truncates to the shorter side — guard shape first.
    if sorted(sp.columns) != sorted(dk.columns):
        return [f"columns differ: spark={sorted(sp.columns)} duck={sorted(dk.columns)}"]
    if len(sp) != len(dk):
        return [f"row count differs: spark={len(sp)} duck={len(dk)}"]
    bad_cols = nonscalar_cols(sp)
    if bad_cols:
        return [f"NON-SCALAR output columns {bad_cols}: the driver's "
                "sort_values canonicalization cannot grade array/map/struct "
                "cells — reshape to scalar rows (posexplode)"]
    try:
        sp = driver_canonical(sp)
        dk = driver_canonical(dk)
    except TypeError as e:
        return [f"driver canonical sort crashed (driver would too): {e}"]
    s_rows = [tuple(strict_cell(v) for v in r) for r in sp.itertuples(index=False)]
    d_rows = [tuple(strict_cell(v) for v in r) for r in dk.itertuples(index=False)]
    # sort_values on mixed reprs can order ties differently per engine;
    # the driver hashes the sorted frame, so compare as sorted multisets
    s_rows, d_rows = sorted(s_rows), sorted(d_rows)
    bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    return [f"STRICT repr mismatch ({len(bad)} rows), e.g. {bad[0][0]} != {bad[0][1]}"] if bad else []

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # No tz normalization: ScaleGen writes timezone-naive parquet
    # timestamps (ScaleGen.writeNaive), so generated dirs carry the same
    # naive repr as /root/testdata and both sides compare byte-strict.
    return v


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    # align column order by name
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    key = lambda r: tuple((x is None, str(x)) for x in r)
    s_sorted = sorted([tuple(norm_cell(r[i]) for i in s_idx) for r in spark_rows], key=key)
    d_sorted = sorted([tuple(norm_cell(r[i]) for i in d_idx) for r in duck_rows], key=key)
    n_bad = 0
    max_float_diff = 0.0
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            for x, y in zip(a, b):
                if x != y:
                    if isinstance(x, float) and isinstance(y, float):
                        max_float_diff = max(max_float_diff, abs(x - y))
                    n_bad += 1
                    if n_bad <= 3:
                        problems.append(f"row {i}: {a} != {b}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched cells total, max float diff {max_float_diff}")
    return problems


def main():
    # --strict-only: run ONLY the driver-faithful strict compare, executing
    # each oracle SQL once instead of twice. The default two-pass flow is
    # the right diagnostic locally (the loose pass prints per-row diffs and
    # float near-misses), but on the skew corpora the oracle SQL itself is
    # the cost (minhash signatures over 10^5-10^6 docs in DuckDB), so the
    # second execution doubles a multi-CPU-hour replay for no extra verdict.
    strict_only = "--strict-only" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--strict-only"]
    out_dir, sf_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # ScaleGen writes part-file directories
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
            spark_cols = [c[0] for c in sp.description]
            spark_rows = sp.fetchall()
        except Exception as e:
            results[name] = [f"failed reading spark output: {e}"]
            continue
        # schema lint (VERDICT r8 #3): the driver cannot grade complex-typed
        # output columns — reject them up front, even for rows-only keys
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
        complex_cols = [r[0] for r in desc
                        if any(k in r[1].upper() for k in ("[]", "STRUCT", "MAP"))]
        if complex_cols:
            results[name] = [f"SCHEMA LINT: complex-typed output columns {complex_cols} "
                             "(ArrayType/MapType/StructType) — driver-ungradable"]
            continue
        if name not in oracles:
            results[name] = [] if len(spark_rows) > 0 else ["rows-only check: EMPTY RESULT"]
            if not results[name]:
                results[name] = ["(rows-only, no oracle) OK rows=%d" % len(spark_rows)]
            continue
        if not strict_only:
            try:
                dk = con.execute(oracles[name])
                duck_cols = [c[0] for c in dk.description]
                duck_rows = dk.fetchall()
            except Exception as e:
                results[name] = [f"oracle SQL failed in DuckDB: {e}"]
                continue
            results[name] = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        else:
            results[name] = []
        if not results[name]:
            try:
                results[name] = strict_compare(name, d, con, oracles[name])
            except Exception as e:
                results[name] = [f"strict compare crashed: {e}"]

    n_fail = 0
    for name, problems in sorted(results.items()):
        ok = not problems or (len(problems) == 1 and problems[0].startswith("(rows-only"))
        status = "OK  " if ok else "FAIL"
        if not ok:
            n_fail += 1
        print(f"{status} {name}" + ("" if ok else ""))
        for p in problems:
            if not ok or p.startswith("(rows-only"):
                print(f"      {p}")
    # queries that produced no output dir at all
    for name in oracles:
        if name not in results:
            n_fail += 1
            print(f"FAIL {name}\n      no spark output written")
    print(f"\n{len(results)} checked, {n_fail} failing")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
