#!/usr/bin/env python3
"""Plan-only oracle dtype lint: DESCRIBE every oracle and fail on
output column types pandas cannot round-trip losslessly (the driver's
hash canonicalization renders DuckDB HUGEINT as float64, so `42.0`
hashes against Spark's `42` and the query goes driver-red with
rows/schema green — the r7..r9 q_kmeans/q_bpe_encode/q_substring_dedup/
q_curriculum failure class).

Usage: oracle_lint.py <oracle_sql.json> <sfDir> [columns_out.json]

With the optional third argument, also writes {name: [output column
names]} from each DESCRIBE — OracleLintSpec compares these against
every Spark DataFrame's schema, catching alias drift (the most common
oracle-compare failure) at sbt-test time instead of at the next full
Verify + compare.

Costs ~seconds for the whole matrix: DESCRIBE plans, never executes.
Run standalone or via OracleLintSpec (sbt test).
"""
import sys, json

# Shared with oracle_check.py (which imports these — one definition of
# the corpus tables and the driver-unhashable type list).
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BANNED = ("HUGEINT", "UHUGEINT")


_CON_SEQ = 0


def sweep_stale_spill():
    """Remove duckdb_oracle_<pid>_* spill dirs whose owning process is
    dead. atexit does NOT run on SIGKILL/OOM (exactly the paths that
    strand big spills — oracle_check's crasher re-run kills on timeout),
    so every run sweeps the graveyard first. Live sibling workers are
    protected by the pid liveness check: ProcessLookupError means the
    owner is truly gone, but PermissionError (EPERM) means the pid
    EXISTS under another uid — that worker is alive and mid-query, so
    its dir must survive the sweep."""
    import glob, os, shutil, tempfile
    for d in glob.glob(os.path.join(tempfile.gettempdir(), "duckdb_oracle_*")):
        try:
            pid = int(os.path.basename(d).split("_")[2])
            os.kill(pid, 0)           # ProcessLookupError iff owner gone
        except (ValueError, IndexError, ProcessLookupError):
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass                      # live process, different uid: keep


def make_con(sf_dir):
    import atexit, duckdb, os, shutil, tempfile
    global _CON_SEQ
    con = duckdb.connect()
    # Spill goes to a PER-CONNECTION dir under the system tmp, bounded
    # and removed at exit. Without this, DuckDB spills to ./.tmp in the
    # cwd and an interrupted/abandoned big query leaves the files behind
    # (observed: 79 GB of orphaned duckdb_temp_storage-*.tmp from one
    # timed-out sf1 oracle filled the disk). Per-connection (pid + seq),
    # not per-process: oracle_check's abandon-stuck-connection path runs
    # TWO live instances in one process, and DuckDB temp names are only
    # per-instance unique — a shared dir would collide their spill
    # files. The size cap turns a pathological spill into ONE query
    # error instead of a full disk; kill-path leftovers are reaped by
    # [[sweep_stale_spill]] at the next run's start.
    _CON_SEQ += 1
    tmp = os.path.join(tempfile.gettempdir(),
                       f"duckdb_oracle_{os.getpid()}_{_CON_SEQ}")
    con.execute(f"SET temp_directory='{tmp}'")
    # default bounds a pathological spill; big manual sweeps (sf1) can
    # raise it explicitly when the disk has headroom
    cap = os.environ.get("GRAFT_DUCKDB_TMP_CAP", "8GB")
    con.execute(f"SET max_temp_directory_size='{cap}'")
    atexit.register(lambda: shutil.rmtree(tmp, ignore_errors=True))
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main():
    path, sf_dir = sys.argv[1], sys.argv[2]
    sweep_stale_spill()
    con = make_con(sf_dir)
    oracles = json.load(open(path))
    bad, columns = [], {}
    for name, sql in sorted(oracles.items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad.append(f"{name}: DESCRIBE error: {str(e)[:200]}")
            continue
        columns[name] = [r[0] for r in rows]
        for col, typ in [(r[0], r[1]) for r in rows]:
            if any(b in typ.upper() for b in BANNED):
                bad.append(f"{name}: output column {col} is {typ} "
                           "— CAST the aggregate to BIGINT")
    if len(sys.argv) > 3:
        json.dump(columns, open(sys.argv[3], "w"))
    if bad:
        print("\n".join(bad))
        sys.exit(1)
    print(f"oracle_lint: {len(oracles)} oracles, all output types hashable")


if __name__ == "__main__":
    main()
