"""Registry-wide DRIVER-CONTRACT audit: every query under a vanilla
default-memory session.

The q531 lesson: a query can be oracle-green, pytest-green, and
10x-timed under the engine session (32g driver) and still OOM the
harness-shaped VANILLA session (local[8], default 1g driver, default
200 shuffle partitions). This tool runs the WHOLE registry the way the
harness would: chunks of queries per fresh subprocess, each subprocess
a vanilla SparkSession, counting rows only (the value oracle is
check_correctness's job — this audits survivability, not semantics).

Usage:  python tools/vanilla_audit.py [sf_dir] [chunk_size]
Writes one line per query (OK/FAIL) to stdout and a summary at the end;
exit code 1 if any query failed.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
import __spark_entry__ as e
qs = e.queries()
for name in {names!r}:
    try:
        n = qs[name](spark, {sf_dir!r}).count()
        print(f"OK {{name}} rows={{n}}", flush=True)
    except Exception as ex:
        msg = str(ex).splitlines()[0][:200] if str(ex) else type(ex).__name__
        print(f"FAIL {{name}} {{msg}}", flush=True)
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    sys.path.insert(0, REPO)
    from variantcalling_spark.queries import all_queries

    names = list(all_queries())
    fails: list[str] = []
    done = 0
    for i in range(0, len(names), chunk):
        batch = names[i : i + chunk]
        script = _CHILD.format(repo=REPO, names=batch, sf_dir=sf_dir)
        proc = subprocess.run(
            [sys.executable, "-c", script],
            cwd="/tmp",  # outside the repo: honest serde check
            capture_output=True,
            text=True,
            timeout=3600,
        )
        seen = set()
        for line in proc.stdout.splitlines():
            if line.startswith(("OK ", "FAIL ")):
                print(line, flush=True)
                seen.add(line.split()[1])
                if line.startswith("FAIL "):
                    fails.append(line.split()[1])
        for name in batch:
            if name not in seen:  # process died (OOM kill etc.)
                print(f"FAIL {name} (no result — subprocess died)", flush=True)
                fails.append(name)
        done += len(batch)
        print(f"-- {done}/{len(names)} audited, {len(fails)} failed", flush=True)
    print(
        f"vanilla audit: {len(names) - len(fails)} ok, {len(fails)} failed"
        + (f" -> {fails}" if fails else ""),
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
