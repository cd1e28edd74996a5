"""One-command full-suite runner: fresh pytest process per test file.

Why this exists: the XLA:CPU compiler can segfault in very long-lived
processes after hundreds of jit compiles (observed at ~94% of a single
``python -m pytest tests/`` run, inside ``jax/_src/compiler.py
backend_compile_and_load`` — not a test failure; every test passes in a
fresh process).  The reference has no test suite at all (SURVEY.md §4),
so there is no upstream answer to borrow; the structural defense is to
shard the suite by file into fresh processes and aggregate.

  python tests/run_suite.py              # all test files, 1 proc each
  python tests/run_suite.py -k serve     # only files whose name matches
  python tests/run_suite.py -j 2         # N files concurrently

Exits 0 iff every file's pytest process exits 0 (or 5 = no tests
collected under -k deselection).  Prints a per-file line as each process
finishes plus a final summary with total test counts and wall-clock.
"""

import argparse
import concurrent.futures
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

SUMMARY_RE = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?(?:, )?(?:(\d+) failed)?"
)


def parse_counts(out: str):
    """Pull (passed, skipped, failed) from pytest's final summary line."""
    passed = skipped = failed = 0
    for line in out.strip().splitlines()[::-1]:
        if "passed" in line or "failed" in line or "skipped" in line:
            m = re.search(r"(\d+) passed", line)
            passed = int(m.group(1)) if m else 0
            m = re.search(r"(\d+) skipped", line)
            skipped = int(m.group(1)) if m else 0
            m = re.search(r"(\d+) failed", line)
            failed = int(m.group(1)) if m else 0
            break
    return passed, skipped, failed


def run_file(path: str, extra: list[str]):
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q", "--no-header", *extra],
        cwd=REPO, capture_output=True, text=True,
    )
    dt = time.perf_counter() - t0
    return path, proc.returncode, proc.stdout + proc.stderr, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", default=None, help="only files whose name matches")
    ap.add_argument("-j", type=int, default=1,
                    help="concurrent file processes (single-core host: keep 1)")
    ap.add_argument("extra", nargs="*", help="extra pytest args after --")
    args = ap.parse_args()

    files = sorted(
        f for f in os.listdir(HERE)
        if f.startswith("test_") and f.endswith(".py")
        and (args.k is None or args.k in f)
    )
    if not files:
        print("no test files matched", file=sys.stderr)
        return 2

    t0 = time.perf_counter()
    total_p = total_s = total_f = 0
    failures = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=args.j) as ex:
        futs = {ex.submit(run_file, os.path.join("tests", f), args.extra): f
                for f in files}
        for fut in concurrent.futures.as_completed(futs):
            path, rc, out, dt = fut.result()
            p, s, f = parse_counts(out)
            total_p += p
            total_s += s
            total_f += f
            ok = rc == 0 or rc == 5  # 5 = nothing collected (deselection)
            status = "ok  " if ok else "FAIL"
            print(f"{status} {os.path.basename(path):44s} "
                  f"{p:4d} passed {s:3d} skipped {f:3d} failed  {dt:6.1f}s",
                  flush=True)
            if not ok:
                failures.append((path, rc, out))

    wall = time.perf_counter() - t0
    print(f"\n{len(files)} files: {total_p} passed, {total_s} skipped, "
          f"{total_f} failed in {wall:.0f}s wall")
    for path, rc, out in failures:
        print(f"\n===== {path} (exit {rc}) =====")
        print("\n".join(out.strip().splitlines()[-40:]))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
