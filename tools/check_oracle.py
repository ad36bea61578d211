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

# ---------------------------------------------------------------------------
# Python oracle for the two keyed-hash rows DuckDB cannot mirror (no HMAC
# builtin). Independent re-implementation of the reference semantics
# (fxa-amplitude-send utils.js:16-26,70-74): falsy-skip, JS stringification,
# delimiter-free concat, lowercase hex — over the EnvelopeGen branch rules,
# which are a pure function of event_id (EnvelopeGen.scala doc). With this,
# all catalog rows have a machine oracle; the golden vectors in
# HmacSha256Spec stop being the only line of defense.
# ---------------------------------------------------------------------------
HMAC_KEY = b"graft-test-key"  # SparkEntry.HmacKey

def _js_str(v):
    """JS String(x) for the value kinds the preimage can carry."""
    if isinstance(v, float):
        return str(int(v)) if v == int(v) else repr(v)
    return str(v)

def _hmac_digest(parts):
    """HMAC-SHA256 over the JS-stringified non-falsy parts, hex."""
    import hmac as _hmac, hashlib
    m = _hmac.new(HMAC_KEY, digestmod=hashlib.sha256)
    for p in parts:
        # JS falsy: null/absent, '', 0, NaN, false — contributes nothing
        if p is None or p == "" or (isinstance(p, (int, float)) and
                                    (p != p or p == 0)):
            continue
        m.update(_js_str(p).encode("utf-8"))
    return m.hexdigest()

def hmac_oracle(sf_dir: str, which: str) -> pd.DataFrame:
    """Expected (event_id, user_id|insert_id) for the valid, non-identify
    rows — recomputed from events.parquet via the EnvelopeGen branch
    rules + the reference hash semantics, no Spark code involved."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    ts = ev["ts"]
    if getattr(ts.dtype, "tz", None) is not None:
        ts = ts.dt.tz_localize(None)
    # normalize to ns first — parquet may carry datetime64[us], whose raw
    # int64 is MICROseconds (÷1e6 would yield seconds, not millis)
    tms = ts.astype("datetime64[ns]").astype("int64") // 1_000_000
    out = []
    for eid, t, uid, et in zip(ev["event_id"], tms, ev["user_id"],
                               ev["event_type"]):
        eid = int(eid); t = int(t); uid = int(uid)
        uid_absent = eid % 7 == 0 or eid % 19 == 0
        uid_numeric = eid % 23 == 0
        dev_absent = eid % 5 == 0 or eid % 19 == 0
        et_absent = eid % 13 == 0
        time_zero = eid % 17 == 0
        # O6 validity: non-empty STRING id required (numeric uid fails)
        valid = (not et_absent and not time_zero and
                 ((not uid_absent and not uid_numeric) or not dev_absent))
        if not valid:
            continue
        # O8: JS-truthy user value hashes. A NUMERIC uid of 0 is falsy
        # (truthy(0) = false -> unhashed null); the string "0" is a
        # non-empty string and hashes
        falsy_numeric = uid_numeric and uid == 0
        user_id = (_hmac_digest([str(uid)])
                   if not uid_absent and not falsy_numeric else None)
        if which == "q_etl_pseudonymize":
            out.append((eid, user_id)); continue
        device = None if dev_absent else f"dev-{uid}"
        # O7 session branches: number / parseInt-able string / "oops" / 0
        sess = {0: float(t - 5000), 1: float(t - 5000), 2: -1.0, 3: 0.0}[eid % 4]
        insert_id = _hmac_digest([user_id, device, sess, et, float(t)])
        out.append((eid, insert_id))
    colname = "user_id" if which == "q_etl_pseudonymize" else "insert_id"
    # the Spark rows are event_id-ordered; align positionally
    return (pd.DataFrame(out, columns=["event_id", colname])
            .sort_values("event_id").reset_index(drop=True))

HMAC_QUERIES = ("q_etl_pseudonymize", "q_etl_insert_id")

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
        if name in HMAC_QUERIES:
            # keyed-hash rows: DuckDB has no HMAC — python oracle instead
            try:
                exp = norm(hmac_oracle(sf_dir, name))
            except Exception as e:
                print(f"FAIL  {name}: hmac oracle error {e}"); n_fail += 1
                continue
        elif name not in oracle:
            print(f"NOORA {name}: rows={len(got)}")
            n_noracle += 1
            continue
        else:
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
