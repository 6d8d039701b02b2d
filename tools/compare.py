#!/usr/bin/env python3
"""Local correctness gate: run each oracle_sql.json query in DuckDB over the
sf tables and compare with the Spark parquet dumps (column-name sorted,
row sorted) — mirrors the driver's check."""
import sys, json, glob, time
import duckdb, pandas as pd
import pyarrow as pa, pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if len(sys.argv) > 3:  # local iteration: only compare these name prefixes
    pres = sys.argv[3].split(",")
    oracle = {k: v for k, v in oracle.items() if any(k.startswith(p) for p in pres)}
if len(sys.argv) > 4:  # large-scale replays: skip these name prefixes
    # (e.g. q70 at sf1: the oracle's raw id-level blocked join needs ~1e9
    # single-node levenshtein calls — exact-compared at smaller sf instead)
    skips = sys.argv[4].split(",")
    oracle = {k: v for k, v in oracle.items() if not any(k.startswith(p) for p in skips)}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from '{sfdir}/{t}.parquet'")

class NestedColumnError(Exception):
    """A nested (list/struct/map) column reached the comparator. The driver's
    pandas compare crashes on these (round-7 q113: array<int> is unhashable in
    sort_values) — so the local gate must REJECT them, never stringify around
    them. Gate queries must flatten nested output (csv-join, unpack to
    scalars) before dumping."""

def canon(df, side):
    # fresh positional index FIRST: multi-file concat carries duplicate labels
    # and iloc would misinterpret them as positions
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        bad = df[c].map(lambda v: hasattr(v, "tolist") and getattr(v, "ndim", 0) != 0
                        or isinstance(v, (list, dict, tuple)))
        if bad.any():
            raise NestedColumnError(f"{side} col={c} carries nested values "
                                    f"(e.g. {df[c][bad.idxmax()]!r}) — driver-red; flatten it")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING {name}"); fails.append(name); continue
    # footer-level nested-type rejection: list/struct/map columns crash the
    # driver's pandas comparator — fail HERE, before any data is read
    nested = [f"{field.name}:{field.type}" for f in files for field in pq.read_schema(f)
              if pa.types.is_nested(field.type)]
    if nested:
        print(f"ARRAY-COL {name}: nested parquet columns {sorted(set(nested))} — "
              f"driver-red (r7 q113); flatten before dumping")
        fails.append(name); continue
    try:
        mine = canon(pd.concat([pd.read_parquet(f) for f in files]), "mine")
    except NestedColumnError as e:
        print(f"ARRAY-COL {name}: {e}"); fails.append(name); continue
    t0 = time.time()
    try:
        ref = canon(con.execute(oracle[name]).fetchdf(), "oracle")
    except NestedColumnError as e:
        print(f"ARRAY-COL {name}: {e}"); fails.append(name); continue
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fails.append(name); continue
    oracle_sec = time.time() - t0
    if list(mine.columns) != list(ref.columns):
        print(f"SCHEMA {name}: mine={list(mine.columns)} ref={list(ref.columns)}"); fails.append(name); continue
    # Physical schema check — mirrors the driver's schema_match, which round 4
    # proved is sensitive to the parquet timestamp encoding. Empirical driver
    # facts across the r3/r4 artifacts: Spark's default INT96 output (arrow
    # timestamp[ns], no tz) passes; TIMESTAMP_NTZ output (arrow timestamp[us],
    # no tz) passes in BOTH rounds (q03); a pinned outputTimestampType writes
    # the instant type as timestamp[us, tz=UTC] and EVERY such column failed
    # schema_match. The discriminator is the tz annotation on the dump's
    # parquet footer — assert on it directly.
    sch_ok = True
    # every part file: a multi-part dump whose first part lacks the timestamp
    # column (or with heterogeneous footers) must not slip past the gate
    for f in files:
        for field in pq.read_schema(f):
            t = field.type
            if pa.types.is_timestamp(t) and t.tz is not None:
                print(f"SCHEMA-UNIT {name} col={field.name} part={f.rsplit('/',1)[-1]}: "
                      f"spark dump is timestamp[{t.unit}, tz={t.tz}] — driver-red (r4 "
                      f"artifact); Spark's default INT96 (ns, no tz) and NTZ (us, no tz) both pass")
                sch_ok = False
                break
        if not sch_ok:
            break
    # informational: the driver's tolerance for non-datetime logical type
    # diffs is unproven either way — surface, don't fail
    for c in mine.columns:
        a, b = str(mine[c].dtype), str(ref[c].dtype)
        if not a.startswith("datetime") and not b.startswith("datetime") and a != b:
            print(f"SCHEMA-WARN {name} col={c}: mine={a} ref={b}")
    if not sch_ok:
        fails.append(name); continue
    if len(mine) != len(ref):
        print(f"ROWS {name}: mine={len(mine)} ref={len(ref)}"); fails.append(name); continue
    eq = True
    for c in mine.columns:
        a, b = mine[c], ref[c]
        try:
            if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                # compare at µs like the driver's DuckDB gate: coercing to ns
                # (numpy default) silently wraps far-future values on BOTH
                # sides, masking ns-overflow corruption in the Spark output
                av = pd.to_datetime(a).values.astype("datetime64[us]")
                bv = pd.to_datetime(b).values.astype("datetime64[us]")
                ok = (av == bv).all()
            else:
                ok = (a.values == b.values).all()
        except Exception:
            ok = (a.astype(str).values == b.astype(str).values).all()
        if not ok:
            bad = (a.astype(str).values != b.astype(str).values)
            print(f"VALUES {name} col={c} ndiff={bad.sum()} e.g. mine={a[bad][:3].tolist()} ref={b[bad][:3].tolist()}")
            eq = False
    if not eq: fails.append(name)
    else: print(f"OK {name} rows={len(mine)} oracle_sec={oracle_sec:.1f}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle-checked queries OK; failures: {fails}")
sys.exit(1 if fails else 0)
