#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run the corresponding oracle SQL in DuckDB over the same
parquet tables and compare values (columns sorted by name, rows in emitted
order). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats; strip tz from datetimes
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_localize(None)
        if df[c].dtype == object:
            # duckdb yields bytearray, pyarrow yields bytes — unify so the
            # astype(str) compare doesn't see b'..' vs bytearray(b'..')
            df[c] = df[c].map(lambda v: bytes(v) if isinstance(v, bytearray) else v)
        # decimal/object numeric → leave; floats rounded at compare time
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = qdir.split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        got = norm(pd.read_parquet(qdir))
        if name not in oracle:
            print(f"NOORA {name}: rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}"); n_fail += 1; continue
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"FAIL  {name}: cols {list(got.columns)} vs {list(exp.columns)}"); ok = False
        elif len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}"); ok = False
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                # The driver's compare hashes values WITH dtype sensitivity:
                # DuckDB sum(BIGINT) -> HUGEINT -> pandas float64 vs Spark
                # int64 is a red row even when every value matches
                # (q_decontam r5, q_cluster_quality r7). Reproduce that here
                # so contract rule #2 (SparkEntry.scala) is machine-checked.
                # (numeric kinds only: date columns legitimately arrive as
                # object-of-datetime.date on the Spark side vs datetime64 on
                # the DuckDB side and the driver tolerates that)
                NUM = "iufb"
                if (g.dtype.kind in NUM and e.dtype.kind in NUM
                        and g.dtype.kind != e.dtype.kind
                        and not g.isna().any() and not e.isna().any()):
                    print(f"FAIL  {name}.{c}: dtype {g.dtype} (spark) vs {e.dtype} (oracle)"
                          " — cast the oracle aggregate (::BIGINT / ::DOUBLE)")
                    ok = False
                    continue
                try:
                    if g.dtype.kind == "f" or e.dtype.kind == "f":
                        import numpy as np
                        eq = np.allclose(g.fillna(-9e99).astype(float),
                                         e.fillna(-9e99).astype(float),
                                         rtol=0, atol=0, equal_nan=True)
                        exact = (g.fillna(-9e99).astype(float) == e.fillna(-9e99).astype(float)).all()
                        if not exact:
                            print(f"FAIL  {name}.{c}: float mismatch\n{g[(g.fillna(-9e99).astype(float) != e.fillna(-9e99).astype(float))].head()}\n{e[(g.fillna(-9e99).astype(float) != e.fillna(-9e99).astype(float))].head()}")
                            ok = False
                    else:
                        gs, es = g.astype(str), e.astype(str)
                        if not (gs == es).all():
                            bad = gs != es
                            print(f"FAIL  {name}.{c}: mismatch rows {bad.sum()}")
                            print("  got:", gs[bad].head(3).tolist())
                            print("  exp:", es[bad].head(3).tolist())
                            ok = False
                except Exception as ex:
                    print(f"FAIL  {name}.{c}: compare error {ex}"); ok = False
        if ok:
            print(f"PASS  {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
