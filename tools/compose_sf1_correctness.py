#!/usr/bin/env python3
"""Compose CORRECTNESS_SF1.json from an oracle_check run at sf1.

Usage: compose_sf1_correctness.py <sfDir> <verifyOut> [note]

Runs tools/oracle_check.py on the given dirs, parses the OK/FAIL lines,
and writes CORRECTNESS_SF1.json in the repo root with the same shape the
earlier hand-composed records used (fail list, method note, pass count,
per-query verdict map, sf tag, total).
"""
import json
import re
import subprocess
import sys

sfdir, out = sys.argv[1], sys.argv[2]
note = sys.argv[3] if len(sys.argv) > 3 else ""
timeout = sys.argv[4] if len(sys.argv) > 4 else "600"
workers = sys.argv[5] if len(sys.argv) > 5 else "6"
repo = "/root/repo"
p = subprocess.run(
    ["python3", f"{repo}/tools/oracle_check.py", sfdir, out,
     timeout, workers],
    capture_output=True, text=True)
open("/tmp/oracle_sf1_raw.log", "w").write(p.stdout + p.stderr)
lines = (p.stdout + p.stderr).splitlines()
verdicts = {}
for ln in lines:
    m = re.match(r"^(OK|FAIL)\s+(\S+)", ln)
    if m:
        verdicts[m.group(2)] = m.group(1)
fails = sorted(k for k, v in verdicts.items() if v != "OK")
doc = {
    "fail": fails,
    "method": ("graft.Verify wrote all %d query results at sf1; "
               "tools/oracle_check.py replayed every oracle SQL in DuckDB "
               "on the same parquet and compared rows+schema+hash. %s"
               % (len(verdicts), note)).strip(),
    "pass": sum(1 for v in verdicts.values() if v == "OK"),
    "queries": dict(sorted(verdicts.items())),
    "sf": sfdir,
    "total": len(verdicts),
}
with open(f"{repo}/CORRECTNESS_SF1.json", "w") as f:
    json.dump(doc, f, indent=1, sort_keys=True)
print("pass", doc["pass"], "of", doc["total"], "fails:", fails[:10])
