"""Group-sharded test runner (reference: test/runtests.jl + test_groups.toml).

Each group runs in a FRESH pytest process — the @safetestset-fresh-module
analogue — which (a) bounds XLA-CPU compiler state (the whole-suite
single-process run needs the conftest cache-clear workaround; fresh
processes make it moot), (b) lets CI shard by group name, and (c) keeps a
single group's wall time small enough to iterate on.

Usage:
    python tests/run_groups.py --list
    python tests/run_groups.py core stiff
    python tests/run_groups.py --all
"""

import argparse
import glob
import os
import subprocess
import sys
import time
import tomllib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(ROOT, "tests", "test_groups.toml")


def load_groups():
    with open(MANIFEST, "rb") as fh:
        groups = tomllib.load(fh)["groups"]
    # guard against manifest drift: every tests/test_*.py must be listed
    listed = {f for files in groups.values() for f in files}
    on_disk = {
        os.path.relpath(p, ROOT)
        for p in glob.glob(os.path.join(ROOT, "tests", "test_*.py"))
    }
    missing = sorted(on_disk - listed)
    if missing:
        sys.exit(f"test_groups.toml is missing: {missing}")
    stale = sorted(listed - on_disk)
    if stale:
        sys.exit(f"test_groups.toml lists nonexistent files: {stale}")
    return groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("groups", nargs="*", help="group names to run")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("-x", action="store_true", help="stop at first failure")
    args = ap.parse_args()

    groups = load_groups()
    if args.list:
        for name, files in groups.items():
            print(f"{name}: {' '.join(files)}")
        return
    names = list(groups) if (args.all or not args.groups) else args.groups
    unknown = [n for n in names if n not in groups]
    if unknown:
        sys.exit(f"unknown groups {unknown}; have {list(groups)}")

    failed = []
    for name in names:
        t0 = time.time()
        cmd = [sys.executable, "-m", "pytest", "-q", *groups[name]]
        print(f"== group {name}: {' '.join(cmd[3:])}", flush=True)
        rc = subprocess.call(cmd, cwd=ROOT)
        print(f"== group {name}: rc={rc} ({time.time() - t0:.0f}s)",
              flush=True)
        if rc != 0:
            failed.append(name)
            if args.x:
                break
    if failed:
        sys.exit(f"FAILED groups: {failed}")
    print(f"all groups green: {names}")


if __name__ == "__main__":
    main()
