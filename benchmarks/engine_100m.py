"""Engine steady-state at 100M rows: re-dispatch the compiled SQL query
10x and report per-dispatch latency + device memory between dispatches
(ROADMAP round-3 item 1 / VERDICT round-2 item 3: the round-2 engine
compiled and ran ONCE at 100M but OOM'd on re-dispatch because
intermediates + prior result buffers coexisted).

Prints one JSON line: {"metric": "engine_100m_steady_state", ...}.

Env: QE_100M_ROWS (default 10^8), QE_100M_ITERS (default 10).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import query_engine_tpu  # noqa: F401  (x64)
import jax

from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.core.schema import Field, Schema
from query_engine_tpu.core.types import DataType
from query_engine_tpu.engine.session import Session


def mem():
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        return {
            "in_use_gb": round(ms.get("bytes_in_use", 0) / 1e9, 2),
            "peak_gb": round(ms.get("peak_bytes_in_use", 0) / 1e9, 2),
        }
    except Exception:
        return {}


def main():
    n = int(os.environ.get("QE_100M_ROWS", 100_000_000))
    iters = int(os.environ.get("QE_100M_ITERS", 10))
    nd = 1024
    rng = np.random.default_rng(7)
    print(f"# building {n} rows", file=sys.stderr)
    fact = ColumnBatch.from_pydict({
        "age": rng.integers(18, 65, n),
        "salary": rng.integers(50_000, 150_000, n),
        "dept": rng.integers(0, nd, n),
    }, Schema([Field("age", DataType.int64()),
               Field("salary", DataType.int64()),
               Field("dept", DataType.int64())]))
    dim = ColumnBatch.from_pydict({
        "dept_id": np.arange(nd), "bonus": rng.integers(0, 1000, nd),
    })
    s = Session()
    s.register_table("f", fact)
    s.register_table("d", dim)
    q = ("SELECT f.dept, COUNT(*) AS c, SUM(f.salary + d.bonus) AS s "
         "FROM f JOIN d ON f.dept = d.dept_id "
         "WHERE f.age > 25 GROUP BY f.dept ORDER BY s DESC LIMIT 10")

    t0 = time.time()
    try:
        s.sql(q)
    except Exception as e:
        print(json.dumps({
            "metric": "engine_100m_steady_state", "rows": n,
            "ok": False, "fail_at": "first_dispatch",
            "error": repr(e)[:500], "mem": mem(),
        }))
        return
    print(f"# first dispatch+compile {time.time() - t0:.1f}s mem={mem()}",
          file=sys.stderr)

    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        try:
            r = s.sql(q)
        except Exception as e:
            print(json.dumps({
                "metric": "engine_100m_steady_state", "rows": n,
                "ok": False, "fail_at": f"redispatch_{i}",
                "error": repr(e)[:500], "mem": mem(),
                "ms_so_far": [round(t * 1e3, 1) for t in ts],
            }))
            return
        dt = time.perf_counter() - t0
        ts.append(dt)
        del r
        print(f"# dispatch {i}: {dt * 1e3:.1f} ms mem={mem()}",
              file=sys.stderr)
    best = min(ts)
    print(json.dumps({
        "metric": "engine_100m_steady_state", "rows": n, "ok": True,
        "iters": iters, "ms_best": round(best * 1e3, 1),
        "ms_all": [round(t * 1e3, 1) for t in ts],
        "rows_per_sec": round(n / best, 1), "mem": mem(),
    }))


if __name__ == "__main__":
    main()
