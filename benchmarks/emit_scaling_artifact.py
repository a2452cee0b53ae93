"""Collect the machine-readable scaling/overlap/skew-balance artifacts into
SCALING_r{N}.json at the repo root (VERDICT r3 item 8: the >=80% scaling
and overlap claims must be re-checkable without reading prose).

Runs, on the virtual CPU mesh:
  * benchmarks/scaling.py       — per-N total-work inflation (agg/join/sort)
  * benchmarks/overlap_bench.py — exchange/compute overlap vs phase sum
  * benchmarks/skewed_pipeline.py balance — salted-vs-unsalted shard
    imbalance under Zipf keys

Env: QE_ROUND (default 4), QE_SCALING_ROWS (default 2^22).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_json_lines(stdout: str):
    return [json.loads(ln) for ln in stdout.splitlines()
            if ln.startswith("{")]


def run(args, timeout=3600):
    out = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True,
        timeout=timeout, cwd=REPO,
    )
    if out.returncode != 0:
        print(out.stderr[-3000:], file=sys.stderr)
        return {"error": f"rc={out.returncode}", "cmd": " ".join(args)}
    lines = last_json_lines(out.stdout)
    return lines[-1] if lines else {"error": "no json", "cmd": " ".join(args)}


def main():
    rnd = int(os.environ.get("QE_ROUND", "4"))
    rows = os.environ.get("QE_SCALING_ROWS", str(1 << 22))
    art = {
        "scaling": run(["benchmarks/scaling.py", rows]),
        "overlap": run(["benchmarks/overlap_bench.py"]),
        "skew_balance": run(["benchmarks/skewed_pipeline.py", "balance"]),
    }
    path = os.path.join(REPO, f"SCALING_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
