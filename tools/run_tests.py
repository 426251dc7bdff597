"""Single-command tiered test entry (VERDICT r4 item 8).

The full 135+-test suite exceeds a convenient single pytest invocation on
this 2-core container (heavy interpret-mode kernel compiles), and XLA:CPU
intermittently segfaults a long-lived test process (see tests/conftest.py
note).  This driver makes "full suite green" third-party-reproducible:

  1. runs the quick tier (`pytest -m quick`) as one invocation;
  2. runs the remaining tests file-by-file, each in a fresh bounded
     process (default 20 min/file), retrying once on an abnormal exit
     (segfault/timeout) since those are environment flakes, not test
     failures;
  3. prints a per-file table and an overall verdict.

Usage: python tools/run_tests.py [--quick-only] [--timeout 1200]
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run(cmd, timeout):
    t0 = time.time()
    try:
        p = subprocess.run(cmd, cwd=REPO, timeout=timeout,
                           capture_output=True, text=True)
        rc = p.returncode
        tail = (p.stdout.splitlines() or [""])[-1]
    except subprocess.TimeoutExpired:
        rc, tail = -1, "TIMEOUT"
    return rc, time.time() - t0, tail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick-only", action="store_true")
    ap.add_argument("--timeout", type=float, default=1200.0,
                    help="per-file wall clock bound [s]")
    args = ap.parse_args()

    py = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]

    print("== tier 1: quick", flush=True)
    rc, dt, tail = run(py + ["-m", "quick", "tests/"], args.timeout)
    print(f"quick tier: rc={rc} {dt:.0f}s  {tail}", flush=True)
    failures = [] if rc == 0 else ["quick-tier"]

    if not args.quick_only:
        print("== tier 2: full suite, per-file", flush=True)
        files = sorted((REPO / "tests").glob("test_*.py"))
        for f in files:
            rel = f.relative_to(REPO)
            rc, dt, tail = run(
                py + ["-m", "not quick", str(rel)], args.timeout)
            status = "ok" if rc in (0, 5) else f"rc={rc}"
            # 5 = no tests collected (all-quick file); negative/|>128| =
            # crashed or timed-out process -> one retry (known flaky
            # XLA:CPU segfault, load-dependent)
            if rc not in (0, 5) and (rc < 0 or rc > 1):
                rc2, dt2, tail2 = run(
                    py + ["-m", "not quick", str(rel)], args.timeout)
                status = f"retried: rc={rc2}"
                rc, tail, dt = rc2, tail2, dt + dt2
            print(f"{str(rel):44s} {status:14s} {dt:6.0f}s  {tail}",
                  flush=True)
            if rc not in (0, 5):
                failures.append(str(rel))

    print("== summary")
    if failures:
        print("FAILED:", ", ".join(failures))
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
