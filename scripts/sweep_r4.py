"""One-process TPU measurement session for the r4 byte-matmul kernels.

Runs, in order, reusing one relay connection:
  1. headline bench at the production config (sb=16384, C=16)
  2. sb sweep: 8192 (halves the BFP in-kernel sort matmul cost)
  3. optional C sweep via argv (--chunks=8,16)
Prints one JSON line per config (bench.py format) plus a final best line.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import run  # noqa: E402


def main():
    chunks = [0]
    sbs = [0, 8192]
    for a in sys.argv[1:]:
        if a.startswith("--chunks="):
            chunks = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--sbs="):
            sbs = [int(x) for x in a.split("=")[1].split(",")]
    results = []
    for sb in sbs:
        for c in chunks:
            print(f"### sb={sb or 'default'} chunk={c or 'default'}",
                  file=sys.stderr)
            try:
                r = run(512, chunk=c, sb=sb)
                r["sb"] = sb
                r["chunk"] = c
                results.append(r)
            except Exception as e:  # keep sweeping on a failed config
                print(f"### failed: {e!r}", file=sys.stderr)
    if results:
        best = max(results, key=lambda r: r["value"])
        print("### best:", json.dumps(best), file=sys.stderr)


if __name__ == "__main__":
    main()
