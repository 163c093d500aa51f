#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Reads a Verify output dir (result parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB with the corpus parquet tables registered
as views, and compares: row count, column names (sorted), and a value
hash with floats rounded to 12 decimals and rows canonically sorted.

Usage: tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, hashlib, time
import duckdb
import numpy as np

CORPUS = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Sort columns by name, round floats, stringify, sort rows.

    Operates on a pandas DataFrame fetched via .df() so the replica shares
    the driver's dtype pipeline — e.g. DuckDB HUGEINT becomes float64 here
    exactly as it does in the driver's gate (round-2 q26/q28 lesson:
    fetchall() returned Python ints and masked the mismatch).
    """
    cols = list(df.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in df.itertuples(index=False, name=None):
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):  # covers numpy float64 (subclass)
                v = f"{round(v, 12):.12f}"
            elif isinstance(v, (list, tuple, np.ndarray)):
                v = "[" + ",".join(str(x) for x in v) + "]"
            else:
                v = str(v)
            vals.append(v)
        out.append("|".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest(), len(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in CORPUS:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark directory layout (e.g. target/sf1)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):  # driver single-file layout
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    # Union of declared oracles and produced outputs: a query that crashed
    # before writing anything must show up as a failure, not vanish.
    dirs = set(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
    names = sorted(dirs | set(oracles))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            err = os.path.join(out_dir, f"{name}._ERROR")
            detail = open(err).read()[:200] if os.path.exists(err) else ""
            results[name] = f"NO_OUTPUT {detail}".strip()
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        scols = list(sdf.columns)
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(sdf)}"
            continue
        try:
            t0 = time.monotonic()
            odf = con.execute(oracles[name]).df()
            oracle_sec = time.monotonic() - t0
            ocols = list(odf.columns)
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
            continue
        sh, sn = canon(sdf)
        oh, on = canon(odf)
        if sn != on:
            results[name] = f"ROWCOUNT_MISMATCH spark={sn} oracle={on}"
        elif sh != oh:
            results[name] = f"HASH_MISMATCH rows={sn}"
        else:
            # oracle-side wall clock: at sf1 the DuckDB recomputation is
            # itself nontrivial — worth recording next to the verdict
            results[name] = f"OK rows={sn} oracle_sec={oracle_sec:.2f}"
    bad = 0
    for k in sorted(results):
        status = results[k]
        flag = " " if status.startswith(("OK", "ROWS_ONLY")) else "X"
        if flag == "X":
            bad += 1
        print(f"[{flag}] {k}: {status}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
