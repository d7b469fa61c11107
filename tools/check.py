#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare (builder-side QA only;
NOT part of the engine). Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>

Runs every oracle_sql.json entry in DuckDB with the star-schema tables
registered as views over <sfDir>, loads the Spark result parquet written
by graft.Verify from <verifyOutDir>/<name>/, sorts columns by name, and
compares cell-by-cell. Reports exact mismatches and float-tolerance-only
matches (the driver may hash exactly, so those are warnings)."""
import sys, json, os, glob
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pa_pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    d = os.path.join(outdir, name)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def load_spark_types(outdir, name):
    """Declared parquet column types of the Spark result (engine truth,
    unlike pandas dtypes which coerce nullable integrals to float64)."""
    d = os.path.join(outdir, name)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return {}
    try:
        return {f.name: str(f.type) for f in pa_pq.read_schema(files[0])}
    except Exception as e:
        # Loud, not silent: {} deactivates the int-vs-float declared-type
        # guard below for every column of this query — exactly the blind
        # spot the guard was added to close. The caller warns per-column
        # too; this names the root cause once.
        print(f"WARN {name}: spark parquet schema unreadable ({e}) — "
              f"declared-type split check is OFF for this query")
        return {}


def _declared_kind(t):
    """'int' / 'float' / 'other' for a declared duckdb or arrow type."""
    t = str(t).lower()
    if t in {"tinyint", "smallint", "integer", "int", "bigint", "hugeint",
             "utinyint", "usmallint", "uinteger", "ubigint", "uhugeint",
             "int8", "int16", "int32", "int64",
             "uint8", "uint16", "uint32", "uint64"}:
        return "int"
    if t in {"float", "double", "real", "halffloat", "float32", "float64"}:
        return "float"
    # DECIMAL is its own kind (exact, but formats unlike int): a
    # decimal-vs-int or decimal-vs-float pairing is as hash-hostile as
    # int-vs-float and must not dissolve into 'other'.
    if t.startswith("decimal"):
        return "decimal"
    return "other"


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # Full-registry manifest, or the loudly-announced subset sidecar a
    # SPARK_GRAFT_ONLY Verify run writes (never both — Verify removes
    # the other form so a subset can't pass for a full run).
    manifest = os.path.join(outdir, "oracle_sql.json")
    subset = os.path.join(outdir, "oracle_sql.subset.json")
    if os.path.exists(manifest):
        path = manifest
    elif os.path.exists(subset):
        path = subset
        print("== SUBSET manifest: this checks ONLY the queries named in "
              "the last SPARK_GRAFT_ONLY run, not the full registry")
    else:
        sys.exit(f"no oracle manifest in {outdir} — did graft.Verify run?")
    with open(path) as f:
        oracle = json.load(f)
    # Crash sentinel written by graft.Verify: a query that threw has no
    # result dir — report it as a named FAIL with its exception instead
    # of the generic "no spark result parquet".
    errors = {}
    errpath = os.path.join(outdir, "_errors.json")
    if os.path.exists(errpath):
        with open(errpath) as f:
            errors = json.load(f)
    n_pass = n_fail = n_warn = 0
    for name, msg in sorted(errors.items()):
        print(f"FAIL {name}: CRASHED in Verify: {msg}")
    n_fail += len(errors)
    for name in sorted(oracle):
        if name in errors:
            continue  # already reported as CRASHED above
        sql = oracle[name]
        try:
            rel = con.sql(sql)
            du_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
            du = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sp = load_spark(outdir, name)
        sp_types = load_spark_types(outdir, name)
        if sp is None:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        sp = sp.reindex(sorted(sp.columns), axis=1)
        du = du.reindex(sorted(du.columns), axis=1)
        if list(sp.columns) != list(du.columns):
            print(f"FAIL {name}: columns spark={list(sp.columns)} "
                  f"duck={list(du.columns)}")
            n_fail += 1
            continue
        if sp.shape != du.shape:
            print(f"FAIL {name}: shape spark={sp.shape} duck={du.shape}")
            n_fail += 1
            continue
        bad, warn = None, None
        for c in sp.columns:
            a, b = sp[c], du[c]
            # Driver hash is TYPE-sensitive: an integer-valued DOUBLE
            # ("1.3015867E7") never hash-matches a BIGINT ("13015867")
            # even when float-coercion says the values agree. This blind
            # spot produced two consecutive driver-only failures
            # (pr_curve r10, agg_percentile_disc r11) — flag any
            # float-vs-integral split as a hard FAIL before the
            # float-tolerant value compare can mask it. The split is
            # judged on DECLARED engine types (parquet schema vs the
            # duckdb result type), not pandas dtypes: pandas loads a
            # nullable BIGINT as float64, which used to false-FAIL
            # columns whose driver hash matches fine.
            if c not in sp_types:
                # No declared type ⇒ the split check cannot run for this
                # column. Warn instead of silently skipping — two prior
                # driver-only failures were exactly this blind spot.
                print(f"WARN {name}: col {c} has no declared spark type "
                      f"— declared-type split check skipped")
                n_warn += 1
            ks = _declared_kind(sp_types.get(c, ""))
            kd = _declared_kind(du_types.get(c, ""))
            numeric = {"int", "float", "decimal"}
            if ks != kd and ks in numeric and kd in numeric:
                print(f"FAIL {name}: col {c} DECLARED-TYPE split: "
                      f"spark={sp_types.get(c)} duck={du_types.get(c)} — "
                      f"driver hash is type-sensitive; cast both sides "
                      f"to the same type")
                bad = "__dtype__"
                break
            if (np.issubdtype(a.dtype, np.floating)
                    or np.issubdtype(b.dtype, np.floating)):
                af = a.astype(float).values
                bf = b.astype(float).values
                if not np.allclose(af, bf, rtol=1e-9, atol=1e-12,
                                   equal_nan=True):
                    bad = c
                    break
                if not np.array_equal(af, bf, equal_nan=True):
                    warn = c
            else:
                av = a.astype(str).values
                bv = b.astype(str).values
                if not (av == bv).all():
                    bad = c
                    break
        if bad == "__dtype__":
            n_fail += 1  # message already printed at detection site
        elif bad is not None:
            # default=-1: a dtype-formatting-only mismatch (e.g. int 5
            # vs float 5.0) has no locatable row — still report the
            # FAIL instead of crashing the whole compare run.
            i = next((i for i in range(len(sp))
                      if str(sp[bad].iloc[i]) != str(du[bad].iloc[i])
                      and not _close(sp[bad].iloc[i], du[bad].iloc[i])),
                     -1)
            if i >= 0:
                print(f"FAIL {name}: col {bad} row {i}: "
                      f"spark={sp[bad].iloc[i]!r} duck={du[bad].iloc[i]!r}")
            else:
                print(f"FAIL {name}: col {bad} mismatched (dtype/format "
                      f"level; no single divergent row located)")
            n_fail += 1
        elif warn is not None:
            print(f"WARN {name}: col {warn} float-close but not bit-equal")
            n_warn += 1
        else:
            print(f"PASS {name} ({len(sp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_warn} float-warn, {n_fail} fail, "
          f"{len(oracle)} total")
    sys.exit(1 if n_fail else 0)


def _close(x, y):
    try:
        return abs(float(x) - float(y)) <= 1e-9 * max(1.0, abs(float(y)))
    except (TypeError, ValueError):
        return False


if __name__ == "__main__":
    main()
