"""Run the test suite with per-module process isolation.

One pytest process per test module, serially by default (``--jobs N`` for
multicore boxes). Rationale (VERDICT r3 weak #5): a single pytest process
accumulates XLA-CPU executables/threads across the suite's ~270 jitted
compiles; on small boxes one full-suite run died with a fatal Python error
inside a mesh-heavy module even though every module passes in isolation.
Fresh processes bound the accumulation to one module's worth, and a module
crash is reported instead of killing the whole run.

Usage:
    python tests/run_suite.py            # serial, honest on a 1-core box
    python tests/run_suite.py --jobs 4   # parallel on a multicore box
    python tests/run_suite.py -k lstm    # filter forwarded to pytest

Expected wall time for the full suite: ~8 min on 8 cores with --jobs 4,
~45-60 min single-core serial (the suite is compile-bound; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

TESTS = Path(__file__).resolve().parent
REPO = TESTS.parent


def run_module(mod: Path, extra: list[str]) -> tuple[str, int, float, str]:
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", str(mod), "-q", *extra],
        cwd=REPO, capture_output=True, text=True,
    )
    dt = time.perf_counter() - t0
    tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-25:])
    return mod.name, proc.returncode, dt, tail


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--jobs", type=int, default=1,
                    help="concurrent pytest processes (default 1: serial)")
    ap.add_argument("-k", default=None, help="forwarded to pytest -k")
    ap.add_argument("modules", nargs="*",
                    help="explicit test files (default: every tests/test_*.py)")
    args, extra = ap.parse_known_args()
    if args.k:
        extra = ["-k", args.k, *extra]

    mods = ([Path(m) for m in args.modules] if args.modules
            else sorted(TESTS.glob("test_*.py")))
    results = []
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        for name, rc, dt, tail in pool.map(lambda m: run_module(m, extra), mods):
            # pytest exit code 5 = no tests collected (e.g. -k filtered all)
            status = "ok" if rc == 0 else ("skip" if rc == 5 else "FAIL")
            print(f"{status:>4}  {dt:7.1f}s  {name}", flush=True)
            if status == "FAIL":
                print(tail, flush=True)
            results.append((name, rc))
    failed = [n for n, rc in results if rc not in (0, 5)]
    total = time.perf_counter() - t0
    print(f"\n{len(results) - len(failed)}/{len(results)} modules passed "
          f"in {total / 60:.1f} min")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
