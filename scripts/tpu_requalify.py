"""One-process TPU requalification after a relay outage or kernel change.

Relay windows can be short and only ONE TPU process may run at a time, so
this script measures everything the round report needs in a single
session, most-important first:

  1. headline bench (512^3 Hybrid+BFP, bench.py semantics)
  2. on-chip smoke matrix (tests/test_tpu_smoke.py via pytest, in-process)
  3. 5D XGC-like line (scripts/bench_5d.py)
  4. MDR 384^3 device refactor (scripts/prof_mdr.py)

Each stage is independent; a failure is recorded and the next stage still
runs. Results append to /tmp/tpu_requalify.json (one JSON object per run).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_requalify.py
Optional: --skip=smoke,mdr,5d to shorten the session; --n=256 for a quick
bench sanity pass before the full 512.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    skip = set()
    n = 512
    for a in sys.argv[1:]:
        if a.startswith("--skip="):
            skip = set(a.split("=")[1].split(","))
        if a.startswith("--n="):
            n = int(a.split("=")[1])
    out = {"ts": time.time(), "stages": {}}

    def stage(name, fn):
        if name in skip:
            out["stages"][name] = "skipped"
            return
        t0 = time.time()
        try:
            out["stages"][name] = {"result": fn(), "s": round(time.time() - t0, 1)}
            print(f"### {name}: ok ({out['stages'][name]['s']} s)", file=sys.stderr)
        except Exception:
            out["stages"][name] = {"error": traceback.format_exc(limit=5)}
            print(f"### {name}: FAILED", file=sys.stderr)
            traceback.print_exc()

    def _bench():
        from bench import run

        return run(n)

    def _smoke():
        import pytest

        os.environ["MGARD_TPU_TEST_TPU"] = "1"
        rc = pytest.main(["-q", "-x", "tests/test_tpu_smoke.py"])
        if rc != 0:
            raise RuntimeError(f"tpu smoke pytest rc={rc}")
        return "passed"

    def _5d():
        # bench_5d is a script; exec it in-process (__name__ = __main__)
        g = {"__name__": "__main__"}
        with open(os.path.join(os.path.dirname(__file__), "bench_5d.py")) as f:
            code = f.read()
        old_argv = sys.argv
        sys.argv = ["bench_5d.py"]
        try:
            exec(compile(code, "bench_5d.py", "exec"), g)
        finally:
            sys.argv = old_argv
        return "ran (see stderr)"

    def _mdr():
        g = {"__name__": "__main__"}
        with open(os.path.join(os.path.dirname(__file__), "prof_mdr.py")) as f:
            code = f.read()
        old_argv = sys.argv
        sys.argv = ["prof_mdr.py"]
        try:
            exec(compile(code, "prof_mdr.py", "exec"), g)
        finally:
            sys.argv = old_argv
        return "ran (see stderr)"

    stage("bench", _bench)
    stage("smoke", _smoke)
    stage("5d", _5d)
    stage("mdr", _mdr)

    with open("/tmp/tpu_requalify.json", "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out.get("stages", {}).get("bench", {})))


if __name__ == "__main__":
    main()
