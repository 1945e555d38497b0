import duckdb, json, glob, os, sys, time
import pandas as pd

out = sys.argv[1]; sf = sys.argv[2]
# optional 3rd arg: path to write per-oracle DuckDB wall-times (the
# r18 verdict's oracle-budget instrument — the driver's correctness
# pass has a CPU budget, so the heavy replay tail must stay measured)
cost_out = sys.argv[3] if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracles = json.load(open(f"{out}/oracle_sql.json"))
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df
fails = []
costs = {}
for name, sql in sorted(oracles.items()):
    try:
        spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{out}/{name}/*.parquet")])
        t0 = time.monotonic()
        ora_df = con.execute(sql).df()
        costs[name] = round(time.monotonic() - t0, 3)
        s, o = canon(spark_df), canon(ora_df)
        if list(s.columns) != list(o.columns):
            fails.append((name, f"cols {list(s.columns)} vs {list(o.columns)}")); continue
        if len(s) != len(o):
            fails.append((name, f"rows {len(s)} vs {len(o)}")); continue
        for c in s.columns:
            sv, ov = s[c], o[c]
            # The driver hashes canonical value representations, so a dtype
            # divergence (e.g. DuckDB HUGEINT->float64 vs Spark int64) is a
            # hash mismatch even when values compare numerically equal.
            if sv.dtype.kind != ov.dtype.kind:
                fails.append((name, f"col {c} dtype {sv.dtype} vs {ov.dtype}")); break
            if sv.dtype.kind == 'f' or ov.dtype.kind == 'f':
                import numpy as np
                if not np.allclose(sv.astype(float), ov.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                    fails.append((name, f"col {c} value mismatch")); break
            else:
                if not (sv.astype(str).values == ov.astype(str).values).all():
                    fails.append((name, f"col {c} mismatch")); break
    except Exception as e:
        fails.append((name, f"EXC {type(e).__name__}: {e}"))
nq = len(oracles)
print(f"{nq - len(fails)}/{nq} oracle queries match")
for n, why in fails: print("FAIL", n, why)
if cost_out:
    ranked = dict(sorted(costs.items(), key=lambda kv: -kv[1]))
    json.dump({"sf": sf, "total_sec": round(sum(costs.values()), 3),
               "n": len(costs), "per_oracle_sec": ranked},
              open(cost_out, "w"), indent=1)
    top = list(ranked.items())[:10]
    print("oracle cost total %.1fs; top: %s" %
          (sum(costs.values()), ", ".join(f"{n}={s}s" for n, s in top)))
