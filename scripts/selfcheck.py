#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the same
sf tables, and compares: column-name set, row count, and cell values
after sorting columns by name and rows by the full tuple (the driver
sorts columns by name before hashing values).
"""
import os, re, sys, json, glob, math
import duckdb


def survey_sync_check(oracle):
    """SURVEY §2's inventory table must list EXACTLY the shipped
    contract (the r5 drift: 86 rows shipped, 82 documented). The
    backticked `q_*` keys in SURVEY.md are the documented rows;
    oracle_sql.json holds the shipped ones (Verify already asserts
    queries.keySet == oracleSql.keySet via PlanSpec)."""
    survey = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    try:
        text = open(survey).read()
    except OSError:
        return []
    documented = set(re.findall(r"^\|\s*\d+\s*\|\s*`(q_?\w+)`", text,
                                re.MULTILINE))
    shipped = set(oracle)
    msgs = []
    if documented - shipped:
        msgs.append(f"SURVEY rows not shipped: {sorted(documented - shipped)}")
    if shipped - documented:
        msgs.append(f"shipped rows missing from SURVEY §2: "
                    f"{sorted(shipped - documented)}")
    return msgs

def planaudit_sync_check(oracle):
    """PLANAUDIT.md must carry one row per shipped contract query —
    the r9 drift: 25 contract rows landed after the artifact freeze
    and the measured-plan record silently trailed the contract.
    PlanAudit itself always iterates SparkEntry.queries, so the only
    failure mode is a STALE checked-in artifact; this makes it loud."""
    pa = os.path.join(os.path.dirname(__file__), "..", "PLANAUDIT.md")
    try:
        text = open(pa).read()
    except OSError:
        return []
    audited = set(re.findall(r"^\|\s*(q(?:_\w+|\d+\w*))\s*\|", text,
                             re.MULTILINE))
    shipped = set(oracle)
    msgs = []
    if shipped - audited:
        msgs.append(f"shipped rows missing from PLANAUDIT.md (stale "
                    f"artifact — rerun graft.PlanAudit): "
                    f"{sorted(shipped - audited)}")
    if audited - shipped:
        msgs.append(f"PLANAUDIT.md rows not shipped: "
                    f"{sorted(audited - shipped)}")
    return msgs

def norm(v, float_col=False):
    if v is None:
        return ("\x00",)  # nulls sort first, match only null
    if isinstance(v, float):
        if math.isnan(v):
            # Pandas renders null ints/dates as NaN -> fold to the null
            # key ONLY for non-float columns. In a genuinely float
            # column a NaN is a real value (0.0/0.0 divergence between
            # engines must FAIL, not alias to null).
            return ("f", "nan") if float_col else ("\x00",)
        return ("f", round(v, 9))
    return (type(v).__name__[0], str(v))

def dtype_check(con, sql, files):
    """The driver compares through pandas, where DuckDB result types
    can silently widen/narrow (HUGEINT -> float64 bit us in r4:
    values equal, dtypes differ, hash mismatched). Compare the pandas
    dtype of every shared column."""
    d_df = con.execute(sql).fetchdf()
    s_df = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    return [f"dtype {c}: spark={s_df.dtypes[c]} duck={d_df.dtypes[c]}"
            for c in d_df.columns
            if c in s_df.columns and str(d_df.dtypes[c]) != str(s_df.dtypes[c])]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    if not only:
        for m in survey_sync_check(oracle):
            print(f"FAIL survey-sync: {m}")
            n_fail += 1
        for m in planaudit_sync_check(oracle):
            print(f"FAIL planaudit-sync: {m}")
            n_fail += 1
    for q, sql in sorted(oracle.items()):
        if only and q not in only:
            continue
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        if not files:
            print(f"FAIL {q}: no spark output")
            n_fail += 1
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet({files!r})")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {q}: exec error: {e}")
            n_fail += 1
            continue
        msgs = []
        try:
            msgs += dtype_check(con, sql, files)
        except Exception as e:
            msgs.append(f"dtype-check error: {e}")
        if sorted(s_cols) != sorted(d_cols):
            msgs.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            msgs.append(f"rows: spark={len(s_rows)} duck={len(d_rows)}")
        if not msgs:
            # per-column float-ness from the Spark parquet schema: NaN
            # stays a distinct value in genuinely float columns (see
            # norm); duckdb's DB-API description only says NUMBER, so
            # read the relation's .types instead
            sp_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            is_float = {c: str(t) in ("FLOAT", "DOUBLE")
                        for c, t in zip(sp_rel.columns, sp_rel.types)}
            s_ix = [s_cols.index(c) for c in sorted(s_cols)]
            d_ix = [d_cols.index(c) for c in sorted(d_cols)]
            fl = [is_float.get(c, False) for c in sorted(s_cols)]
            s_sorted = sorted([tuple(norm(r[i], f) for i, f in zip(s_ix, fl))
                               for r in s_rows])
            d_sorted = sorted([tuple(norm(r[i], f) for i, f in zip(d_ix, fl))
                               for r in d_rows])
            bad = [(a, b) for a, b in zip(s_sorted, d_sorted) if a != b]
            if bad:
                msgs.append(f"values: {len(bad)} mismatched rows; first: "
                            f"spark={bad[0][0]} duck={bad[0][1]}")
            else:
                # strict in-order compare: the driver may not sort rows,
                # so each query's ORDER BY must be total up to
                # identical rows
                ooo = sum(1 for a, b in zip(
                    [tuple(norm(r[i], f) for i, f in zip(s_ix, fl))
                     for r in s_rows],
                    [tuple(norm(r[i], f) for i, f in zip(d_ix, fl))
                     for r in d_rows])
                    if a != b)
                if ooo:
                    msgs.append(f"row-order: {ooo} rows out of order "
                                "(non-total ORDER BY?)")
        if msgs:
            print(f"FAIL {q}: " + " | ".join(msgs))
            n_fail += 1
        else:
            print(f"PASS {q} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
