#!/usr/bin/env python3
"""NULL-robustness corpus builder (round-13 campaign): copy an sf dir,
deterministically injecting NULLs into non-key columns, so the driver's
engine-vs-DuckDB compare can be replayed on a NULL-bearing corpus. The
round-13 review found two latent NULL-semantics divergences in freshly
written operators (agg_stats median histogram, ts_ewma block join);
this tool makes that class of bug testable for the whole registry:

    python3 tools/nullify.py /root/testdata/sf0.001 /tmp/sfnull
    sbt "runMain graft.Verify /tmp/sfnull /tmp/verifynull"
    python3 tools/oracle_check.py /tmp/sfnull /tmp/verifynull

Keys (ids, join/group keys used as identity) stay non-null — real
corpora have null ATTRIBUTES, not null identities. The injection is
seeded per (table, column, row) so reruns are bit-identical.
"""
import hashlib
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# (table, column) -> null rate in basis points
PLAN = {
    "events": {"ts": 300, "event_type": 300, "value": 300},
    "documents": {"lang": 300, "source": 300, "text": 200},
    "lineitem": {
        "l_quantity": 300, "l_extendedprice": 300, "l_discount": 300,
        "l_tax": 300, "l_shipdate": 300,
    },
    "orders": {"o_totalprice": 300, "o_orderdate": 300, "o_orderpriority": 300},
    "embeddings": {"embedding": 200, "label": 300},
}

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def gate(table, col, i, bp):
    h = hashlib.md5(f"{table}/{col}/{i}".encode()).digest()
    return int.from_bytes(h[:4], "big") % 10000 < bp


def main_empty(src, dst):
    """--empty: zero-row copies with identical schemas — the degenerate
    corpus every query must survive (and agree with DuckDB on)."""
    import os
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), f"{dst}/{t}.parquet")
        print(f"[nullify] {t}: empty")
    print(f"[nullify] wrote {dst} (empty)")


def main(src, dst):
    import os
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        cols = PLAN.get(t)
        if not cols:
            shutil.copyfile(s, d)
            print(f"[nullify] {t}: copied")
            continue
        tbl = pq.read_table(s)
        n = tbl.num_rows
        arrays, names = [], []
        for name in tbl.column_names:
            col = tbl.column(name).combine_chunks()
            if name in cols:
                bp = cols[name]
                mask = pa.array(
                    [gate(t, name, i, bp) for i in range(n)], type=pa.bool_())
                # keep the value where mask is false, NULL where true
                arr = col if isinstance(col, pa.Array) else col.chunk(0)
                import pyarrow.compute as pc
                arr = pc.if_else(mask, pa.nulls(n, arr.type), arr)
                arrays.append(arr)
                nulled = arr.null_count
                print(f"[nullify] {t}.{name}: {nulled}/{n} nulls")
            else:
                arrays.append(col)
            names.append(name)
        pq.write_table(pa.table(dict(zip(names, arrays))), d)
    print(f"[nullify] wrote {dst}")


if __name__ == "__main__":
    if sys.argv[1] == "--empty":
        main_empty(sys.argv[2], sys.argv[3])
    else:
        main(sys.argv[1], sys.argv[2])
