#!/usr/bin/env python
"""Crash-isolated test-suite runner (VERDICT r4 weak-#1 / next-#4).

One single-process `pytest tests/` run can be killed mid-flight by an
XLA-CPU compiler segfault (observed: rc=139 at 92% after 286 green tests —
an accumulated-compiler-state flake, not a test failure; the crashing test
passes alone).  A crash aborts the whole run WITHOUT a failure summary,
which reads like a truncated log.

This runner shards the suite into subprocess GROUPS so a compiler crash
fails one group loudly instead of silently truncating the run, then
LOCALIZES a crashed group by re-running it file-by-file — every file still
gets a verdict.  The final line aggregates pass/fail across all groups.

Usage (the canonical full-suite invocation):

    python scripts/run_tests.py                # full suite, ~6 groups
    python scripts/run_tests.py -m "not slow"  # fast tier
    python scripts/run_tests.py --groups 8     # more isolation
    python scripts/run_tests.py tests/test_llama.py   # subset passthrough

Exit code: 0 iff every test in every group passed (crash-localized files
count as failures only if their solo re-run fails).
"""

import argparse
import glob
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Compile-heavy end-to-end files: each runs alone so its big XLA-CPU graphs
# can neither crash other files' runs nor inherit a poisoned compiler state.
ISOLATED = [
    "tests/test_multihost.py",      # 2-process runs: must own the CPU
                                    # (concurrent load can blow the 30 s
                                    # Gloo rendezvous deadline)
    "tests/test_streaming.py",      # the observed rc=139 crash site
    "tests/test_golden_e2e.py",
    "tests/test_integration_real_data.py",
    "tests/test_train.py",
    "tests/test_bench_partial.py",
    "tests/test_api.py",
]

_SUMMARY_RE = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?(?:, )?(?:(\d+) failed)?"
    r"(?:, )?(?:(\d+) error(?:s)?)?(?:, )?(?:(\d+) xfailed)?")


def parse_summary(output: str):
    """Last pytest summary line -> dict or None (None = crashed/truncated)."""
    for line in reversed(output.strip().splitlines()):
        line = line.strip().strip("= ")
        m = re.match(
            r"^((\d+ (passed|failed|skipped|error(s)?|xfailed|xpassed|"
            r"deselected|warnings?)(, )?)+) ?(in [\d.]+s.*)?$", line)
        if m:
            counts = {}
            for n, kind in re.findall(r"(\d+) (\w+)", line):
                counts[kind] = int(n)
            return counts
        if line.startswith("no tests ran"):
            return {}
    return None


def run_group(files, extra, label, timeout):
    cmd = [sys.executable, "-m", "pytest", *files, "-q", *extra]
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(cmd, cwd=REPO, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              timeout=timeout)
        rc, out = proc.returncode, proc.stdout
    except subprocess.TimeoutExpired as e:
        rc, out = -1, (e.stdout or b"").decode() if isinstance(
            e.stdout, bytes) else (e.stdout or "")
        out += f"\n[runner] TIMEOUT after {timeout}s"
    wall = time.perf_counter() - t0
    counts = parse_summary(out)
    crashed = counts is None or (rc not in (0, 1, 5) and rc != 0)
    # rc 5 = no tests collected (e.g. all deselected by -m) — not a crash
    if counts is not None and rc in (0, 1, 5):
        crashed = False
    sig = (f" (signal {signal.Signals(-rc).name})"
           if rc < 0 and -rc in signal.Signals.__members__.values() else
           (f" (signal {rc - 128})" if rc > 128 else ""))
    status = ("CRASH" + sig) if crashed else (
        "FAIL" if counts.get("failed") or counts.get("error") else "ok")
    print(f"[{label}] {status} rc={rc} {wall:.0f}s "
          f"{counts if counts is not None else 'no summary (truncated)'}",
          flush=True)
    if status != "ok":
        tail = "\n".join(out.strip().splitlines()[-30:])
        print(f"----- {label} output tail -----\n{tail}\n-----", flush=True)
    return {"rc": rc, "counts": counts, "crashed": crashed, "wall": wall,
            "files": files}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*", help="test files (default: tests/)")
    ap.add_argument("-m", dest="mark", default=None,
                    help="pytest -m expression (e.g. 'not slow')")
    ap.add_argument("--groups", type=int, default=4,
                    help="round-robin groups for the non-isolated files")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-group timeout (s)")
    ap.add_argument("-x", action="store_true",
                    help="stop at the first failing group")
    args, passthru = ap.parse_known_args()
    extra = list(passthru)
    if args.mark:
        extra += ["-m", args.mark]

    if args.paths:
        files = [os.path.relpath(os.path.abspath(p), REPO)
                 for p in args.paths]
        isolated = [f for f in files if f in ISOLATED]
        rest = [f for f in files if f not in ISOLATED]
    else:
        files = sorted(os.path.relpath(p, REPO) for p in
                       glob.glob(os.path.join(REPO, "tests", "test_*.py")))
        isolated = [f for f in ISOLATED if f in files]
        rest = [f for f in files if f not in isolated]

    groups = []
    for i in range(args.groups):
        g = rest[i::args.groups]
        if g:
            groups.append((f"group{i + 1}", g))
    groups += [(os.path.basename(f).replace(".py", ""), [f])
               for f in isolated]

    total = {"passed": 0, "failed": 0, "skipped": 0, "error": 0,
             "xfailed": 0}
    bad_groups, crashed_files = [], []
    t0 = time.perf_counter()
    for label, gfiles in groups:
        res = run_group(gfiles, extra, label, args.timeout)
        if res["crashed"] and len(gfiles) > 1:
            # localize: the crash poisoned the group's process — every file
            # still deserves a verdict, so re-run them one by one
            print(f"[{label}] crashed; localizing file-by-file...",
                  flush=True)
            for f in gfiles:
                sub = run_group([f], extra, f"{label}:{os.path.basename(f)}",
                                args.timeout)
                if sub["crashed"]:
                    crashed_files.append(f)
                    bad_groups.append(f"{label}:{f}")
                else:
                    for k in total:
                        total[k] += (sub["counts"] or {}).get(k, 0)
                    if (sub["counts"] or {}).get("failed") or \
                            (sub["counts"] or {}).get("error"):
                        bad_groups.append(f"{label}:{f}")
        elif res["crashed"]:
            crashed_files.extend(gfiles)
            bad_groups.append(label)
        else:
            for k in total:
                total[k] += (res["counts"] or {}).get(k, 0)
            if (res["counts"] or {}).get("failed") or \
                    (res["counts"] or {}).get("error"):
                bad_groups.append(label)
        if args.x and bad_groups:
            break

    wall = time.perf_counter() - t0
    ok = not bad_groups and not crashed_files
    print(f"\n===== AGGREGATE: {total['passed']} passed, "
          f"{total['failed']} failed, {total['skipped']} skipped, "
          f"{total['error']} errors, {len(crashed_files)} crashed-file(s) "
          f"in {wall / 60:.1f} min across {len(groups)} groups ====="
          f"\n===== RESULT: {'PASS' if ok else 'FAIL'}"
          f"{'' if ok else ' (' + ', '.join(bad_groups) + ')'} =====",
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
