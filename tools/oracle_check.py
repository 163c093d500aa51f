#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Reads a Verify output dir (result parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB with the corpus parquet tables registered
as views, and compares: row count, column names (sorted), and a value
hash with floats rounded to 12 decimals and rows canonically sorted.

Usage: tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, hashlib
import duckdb

CORPUS = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, round floats, stringify, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{round(v, 12):.12f}"
            elif isinstance(v, (list, tuple)):
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
        if os.path.exists(p):
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
        sres = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [d[0] for d in con.description]
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(sres)}"
            continue
        try:
            ores = con.execute(oracles[name]).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
            continue
        sh, sn = canon(sres, scols)
        oh, on = canon(ores, ocols)
        if sn != on:
            results[name] = f"ROWCOUNT_MISMATCH spark={sn} oracle={on}"
        elif sh != oh:
            results[name] = f"HASH_MISMATCH rows={sn}"
        else:
            results[name] = f"OK rows={sn}"
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
