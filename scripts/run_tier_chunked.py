"""Run an opt-in test tier (slow / stress) in bounded pytest processes.

The opt-in tiers run with full XLA optimization (no
``jax_disable_most_optimizations`` shortcut), and a single CPython process
that compiles dozens of large full-opt XLA:CPU modules back-to-back can crash
inside LLVM after ~20+ heavy compiles (observed on the 1-core CI box as a
SIGSEGV in the XLA compiler during ``test_engine_rigid_garpez_equivalence``
after 23 tests / 57 min; the same test passes in isolation).  This runner
groups the tier's tests by file and caps each pytest process at
``--max-per-chunk`` node IDs, bounding the per-process compile count and
making the tier's wall time additive and attributable.

Usage: python scripts/run_tier_chunked.py <marker> [--max-per-chunk N] [extra pytest args...]
Exit code: 0 iff every chunk exits 0.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def collect_node_ids(marker: str) -> dict[str, list[str]]:
    """Return {test_file: [node ids]} for tests matching ``marker``."""
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests",
            "-m",
            marker,
            "--collect-only",
            "-p",
            "no:cacheprovider",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    by_file: dict[str, list[str]] = {}
    for raw in out.stdout.splitlines():
        line = raw.strip()
        if line.startswith("tests/") and "::" in line:
            by_file.setdefault(line.split("::", 1)[0], []).append(line)
    return by_file


def main() -> int:
    args = sys.argv[1:]
    marker = args.pop(0) if args else "slow"
    max_per_chunk = 8
    if "--max-per-chunk" in args:
        i = args.index("--max-per-chunk")
        max_per_chunk = int(args[i + 1])
        del args[i : i + 2]
    by_file = collect_node_ids(marker)
    if not by_file:
        print(f"no tests found for marker {marker!r}")
        return 1
    chunks: list[tuple[str, list[str]]] = []
    for path, ids in by_file.items():
        for i in range(0, len(ids), max_per_chunk):
            part = ids[i : i + max_per_chunk]
            label = path if len(ids) <= max_per_chunk else f"{path}[{i}:{i + len(part)}]"
            chunks.append((label, part))
    n_tests = sum(len(ids) for ids in by_file.values())
    print(f"tier {marker!r}: {n_tests} tests in {len(chunks)} chunks")
    failed: list[str] = []
    t0 = time.time()
    for label, ids in chunks:
        start = time.time()
        rc = subprocess.run(
            [
                sys.executable,
                "-m",
                "pytest",
                *ids,
                "-q",
                "-m",
                marker,
                "-p",
                "no:cacheprovider",
                *args,
            ],
            cwd=REPO,
        ).returncode
        wall = time.time() - start
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        print(f"[{marker}] {label}: {status} ({wall:.0f} s)", flush=True)
        if rc != 0:
            failed.append(label)
    total = time.time() - t0
    print(f"tier {marker!r} total wall: {total:.0f} s; failed chunks: {failed or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
