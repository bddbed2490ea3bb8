#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

With query names given, checks only those (exact match); with
GRAFT_ORACLE_AFTER=<name>, checks only queries strictly after <name> in
sorted order (resume support). GRAFT_ORACLE_SKIP is a comma-separated
exclusion list. GRAFT_DUCKDB_MEM caps DuckDB memory (e.g. '48GB') so a
monster oracle spills instead of pressuring concurrent JVMs.

For every query dumped by graft.Verify, runs the paired oracle SQL in
DuckDB over the same parquet fixtures, sorts columns by name, and
compares shape + values (exact for non-floats, tiny tolerance report for
floats so knife-edge rounding shows up before the real gate runs).
"""
import json, sys, math, re, atexit, shutil, tempfile
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import glob, os

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_result(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    return pq.ParquetDataset(files).read().to_pandas()

def main(out_dir, sf_dir, only=()):
    con = duckdb.connect()
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        # env var is interpolated into SQL: accept only a plain size
        # literal, never arbitrary text
        if not re.fullmatch(r"\d+(\.\d+)?(GB|MB|GiB|MiB)", mem):
            sys.exit(f"GRAFT_DUCKDB_MEM must look like '48GB'/'512MB', got {mem!r}")
        con.execute(f"SET memory_limit='{mem}'")
        # per-run spill dir, removed on exit: a fixed shared path
        # collides across concurrent runs and strands spill (once 77 GB)
        # when a run is killed mid-query. atexit never fires on
        # SIGKILL/OOM-kill, so ALSO reap prior runs' stale spill dirs
        # at startup — any duckdb_spill_* older than an hour is a dead
        # run's leavings (live runs are the only writers and hold the
        # dir for their own lifetime).
        now = __import__("time").time()
        for stale in glob.glob(os.path.join(tempfile.gettempdir(),
                                            "duckdb_spill_*")):
            try:
                if now - os.path.getmtime(stale) > 3600:
                    shutil.rmtree(stale, ignore_errors=True)
            except OSError:
                pass
        spill = tempfile.mkdtemp(prefix="duckdb_spill_")
        atexit.register(shutil.rmtree, spill, ignore_errors=True)
        con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    after = os.environ.get("GRAFT_ORACLE_AFTER")
    skip = set(filter(None, os.environ.get("GRAFT_ORACLE_SKIP", "").split(",")))
    names = [n for n in sorted(oracle)
             if (not only or n in only)
             and (not after or n > after)
             and n not in skip]
    n_pass = n_fail = 0
    for name in names:
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1; continue
        try:
            got = load_result(os.path.join(out_dir, name))
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1; continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {list(exp.columns)}\n  spark : {list(got.columns)}")
            n_fail += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} (spark) vs {len(exp)} (oracle)")
            n_fail += 1; continue
        # The driver's hash gate operates on pandas-materialized values, so
        # an int64 column on one side and float64 on the other (e.g. DuckDB
        # HUGEINT window sums) hash-mismatch even when every value compares
        # equal under Python ==. Mirror that strictness: canonicalize dtype
        # kinds (unsigned->signed int) and fail on any kind difference.
        kind = lambda dt: {"u": "i"}.get(dt.kind, dt.kind)
        dtype_bad = [c for c in exp.columns if kind(exp[c].dtype) != kind(got[c].dtype)]
        if dtype_bad:
            for c in dtype_bad:
                print(f"  {name}.{c} DTYPE: spark={got[c].dtype} oracle={exp[c].dtype}")
            print(f"FAIL {name}: {len(dtype_bad)} dtype mismatches")
            n_fail += 1; continue
        bad = 0
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if a is None and b is None: continue
                an = isinstance(a, float) and math.isnan(a)
                bn = isinstance(b, float) and math.isnan(b)
                if (a is None or an) and (b is None or bn): continue
                if isinstance(a, float) or isinstance(b, float):
                    if a != b:
                        # distinguish knife-edge rounding (ulp-scale) from
                        # logic bugs so triage starts in the right place
                        knife = abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
                        tag = "KNIFE-EDGE" if knife else "VALUE"
                        if bad < 3:
                            print(f"  {name}.{c}[{i}] {tag}: spark={b!r} oracle={a!r}")
                        bad += 1
                elif a != b:
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: spark={b!r} oracle={a!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} value mismatches ({len(exp)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows, {len(exp.columns)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:]))
