#!/usr/bin/env python3
"""Foreign-vintage NaN probe: replays tools/NanProbe.scala's four fixtures
through the OTHER parquet writers present in this sandbox (pyarrow's
parquet-cpp-arrow and DuckDB's writer) and dumps each file's created_by
plus the float/double column statistics. Purpose: walk the
NanProofProbedVintages recovery drill ("re-run the probe on a new vintage,
then extend the allowlist or pin its refusal") against a vintage that is
NOT parquet-mr — these writers' created_by strings must keep REFUSING
float/double footer answers in graft (see NanProofVintageSpec's
foreign-vintage pins), and this probe records WHY: whether their footer
min/max silently skips NaN.

Usage: nanprobe_foreign.py [outdir]   (default /tmp/nanprobe-foreign)
"""
import math
import sys
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURES = {
    "with_nan": ("v", pa.float64(), [1.0, 2.0, math.nan, 3.0]),
    "with_nanf": ("f", pa.float32(), [1.0, 2.0, math.nan]),
    "clean": ("v", pa.float64(), [1.0, 2.0, 3.0]),
    "all_nan": ("v", pa.float64(), [math.nan, math.nan]),
}


def dump(path):
    md = pq.ParquetFile(path).metadata
    print(f"  created_by: {md.created_by}")
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            st = col.statistics
            if st is None:
                print(f"  col={col.path_in_schema} stats=ABSENT")
            else:
                print(
                    f"  col={col.path_in_schema} has_min_max={st.has_min_max} "
                    f"min={st.min if st.has_min_max else '-'} "
                    f"max={st.max if st.has_min_max else '-'} "
                    f"nulls={st.null_count if st.has_null_count else 'UNSET'}")


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    for name, (col, typ, vals) in FIXTURES.items():
        # pyarrow / parquet-cpp-arrow vintage
        pa_path = f"{outdir}/{name}.pyarrow.parquet"
        pq.write_table(pa.table({col: pa.array(vals, type=typ)}), pa_path)
        print(f"[pyarrow] {name}")
        dump(pa_path)
        # DuckDB vintage
        db_path = f"{outdir}/{name}.duckdb.parquet"
        sqltyp = "DOUBLE" if typ == pa.float64() else "FLOAT"
        lits = ", ".join(
            f"(CAST('nan' AS {sqltyp}))" if math.isnan(v) else f"(CAST({v} AS {sqltyp}))"
            for v in vals)
        con.execute(
            f"COPY (SELECT * FROM (VALUES {lits}) t({col})) TO '{db_path}' (FORMAT PARQUET)")
        print(f"[duckdb] {name}")
        dump(db_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nanprobe-foreign")
