#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only; the
shipped library is Scala). Usage:
    python3 scripts/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
parquet results + oracle_sql.json in outDir. Registers the fixture tables as
DuckDB views, runs each oracle, and hash-compares (columns sorted by name,
rows sorted, values canonicalized) — strict superset of any sane driver
compare, so passing here should mean passing there."""
import sys, os, json, hashlib, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(df):
    # df: pandas DataFrame
    cols = sorted(df.columns)
    rows = [tuple(canon_val(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest(), len(rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"MISSING {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{res_dir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL    {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL    {name}: oracle error: {str(e).splitlines()[0][:150]}")
            n_fail += 1
            continue
        sh, sn = frame_hash(spark_df)
        dh, dn = frame_hash(duck_df)
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL    {name}: columns {s_cols} vs {d_cols}")
            n_fail += 1
        elif sh != dh:
            print(f"FAIL    {name}: hash mismatch (spark {sn} rows, duck {dn} rows)")
            # show first differing rows for debugging
            merged_s = {tuple(canon_val(v) for v in r)
                        for r in spark_df[sorted(spark_df.columns)].itertuples(index=False)}
            merged_d = {tuple(canon_val(v) for v in r)
                        for r in duck_df[sorted(duck_df.columns)].itertuples(index=False)}
            only_s = list(merged_s - merged_d)[:3]
            only_d = list(merged_d - merged_s)[:3]
            for r in only_s:
                print(f"        spark-only: {r}")
            for r in only_d:
                print(f"        duck-only:  {r}")
            n_fail += 1
        else:
            print(f"PASS    {name} ({sn} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
