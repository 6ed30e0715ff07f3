#!/usr/bin/env python
"""Diff WORKLOAD_MANIFEST.md's appendix against the reference tree.

The manifest's human tables use range/glob shorthand; the appendix lists
every covered filename explicitly. This tool asserts the appendix equals
the set of .test files actually present under the reference's
testdata/workloads/ — so a reference refresh (or a manifest typo) fails
loudly instead of silently un-covering a file.

    python tools/manifest_check.py
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/testdata/workloads"


def main() -> int:
    tree: set[tuple[str, str]] = set()
    out = subprocess.run(
        ["find", REF, "-name", "*.test"], capture_output=True, text=True
    ).stdout.split()
    for f in out:
        d = f.split("/workloads/")[1].split("/")[0]
        tree.add((d, os.path.basename(f)))

    man = open(os.path.join(REPO, "WORKLOAD_MANIFEST.md")).read()
    appendix = man.split("## Appendix: machine-checkable file index")[1]
    listed: set[tuple[str, str]] = set()
    cur = None
    for line in appendix.splitlines():
        m = re.match(r"### (\S+) \(\d+\)", line)
        if m:
            cur = m.group(1)
            continue
        if cur:
            for name in re.findall(r"`([^`]+\.test)`", line):
                listed.add((cur, name))

    missing = sorted(tree - listed)
    stale = sorted(listed - tree)
    print(f"tree: {len(tree)}  appendix: {len(listed)}")
    if missing:
        print("IN TREE BUT NOT IN MANIFEST:", missing)
    if stale:
        print("IN MANIFEST BUT NOT IN TREE:", stale)
    if missing or stale:
        return 1
    print("OK: manifest appendix matches the reference tree exactly")
    return 0


if __name__ == "__main__":
    sys.exit(main())
