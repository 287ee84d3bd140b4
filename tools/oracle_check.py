#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same sf-dir parquet
tables and compare schema + rows (columns sorted by name, rows sorted).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    """Column-name-sorted, row-sorted, stringified frame for comparison."""
    df = df[sorted(df.columns)]
    # stringify everything so float64 vs float32 etc. show up explicitly
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # optional name filters (argv[3:]): substrings selecting a subset,
    # prefix '-' excludes — lets big corpora (sf0.1) run in parallel
    # shards and heavy oracles be isolated. --overrides=FILE swaps in
    # equivalence-proven rewrites of oracles whose original SQL is
    # infeasible at the corpus size (see oracle_equiv_check.py).
    extra = sys.argv[3:]
    for a in [a for a in extra if a.startswith("--overrides=")]:
        with open(a.split("=", 1)[1]) as f:
            ov = {k: v for k, v in json.load(f).items() if not k.startswith("_")}
        unknown = sorted(set(ov) - set(oracles))
        if unknown:
            print(f"WARNING: overrides for unknown oracles ignored: {unknown}")
        oracles.update({k: v for k, v in ov.items() if k in oracles})
        extra = [x for x in extra if x != a]
    include = [a for a in extra if not a.startswith("-")]
    exclude = [a[1:] for a in extra if a.startswith("-")]
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if include and not any(s in name for s in include):
            continue
        if any(s in name for s in exclude):
            continue
        t0 = time.time()
        try:
            want = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
            want_s, got_s = canon(want), canon(got)
            status = []
            if list(want_s.columns) != list(got_s.columns):
                status.append(f"COLS want={list(want_s.columns)} got={list(got_s.columns)}")
            elif [str(t) for t in want_s.dtypes] != [str(t) for t in got_s.dtypes]:
                status.append(
                    f"DTYPES want={[str(t) for t in want_s.dtypes]} got={[str(t) for t in got_s.dtypes]}")
            if len(want_s) != len(got_s):
                status.append(f"ROWS want={len(want_s)} got={len(got_s)}")
            if not status:
                ws = want_s.sort_values(by=list(want_s.columns), kind="mergesort").reset_index(drop=True)
                gs = got_s.sort_values(by=list(got_s.columns), kind="mergesort").reset_index(drop=True)
                neq = (ws.astype(str) != gs.astype(str)).any(axis=1)
                if neq.any():
                    i = int(neq.idxmax())
                    status.append(
                        f"VALUES {int(neq.sum())} differing rows; first at {i}:\n"
                        f"  want: {ws.iloc[i].to_dict()}\n  got:  {gs.iloc[i].to_dict()}")
            if status:
                n_fail += 1
                print(f"FAIL {name}: " + " | ".join(status), flush=True)
            else:
                n_pass += 1
                print(f"PASS {name} ({len(want_s)} rows, {time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
