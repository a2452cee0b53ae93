"""Phase breakdown of the SPMD distributed sort on the virtual CPU mesh:
cumulative-prefix programs (sample -> bucket -> exchange -> compact ->
final sort), timed at N in {1,2,8}, so the 1.38-1.44x total-work inflation
(SCALING_r04) is attributed to a phase instead of guessed at.

    python benchmarks/probe_sort_phases.py [total_rows]
"""

import json
import os
import subprocess
import sys
import time

TOTAL_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(n_devices: int, total_rows: int) -> None:
    sys.path.insert(0, REPO)
    import numpy as np
    import query_engine_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from query_engine_tpu.parallel.mesh import make_mesh
    from query_engine_tpu.parallel import spmd
    from query_engine_tpu.ops import kernels as K

    devs = jax.devices()[:n_devices]
    mesh = make_mesh(devs)
    n = mesh.devices.size
    axis = "data"
    recv_factor = spmd.DEFAULT_RECV_FACTOR
    n_samples = 64

    rng = np.random.default_rng(3)
    cap_total = total_rows
    key_h = rng.integers(0, int(os.environ.get("QE_PROBE_KEYSPACE", "1000000")), cap_total)
    import jax.sharding as jsh
    sh = jsh.NamedSharding(mesh, P(axis))
    key = jax.device_put(jnp.asarray(key_h, jnp.int64), sh)
    kv = jax.device_put(jnp.ones(cap_total, bool), sh)
    data = jax.device_put(jnp.asarray(key_h * 3, jnp.int64), sh)
    dv = jax.device_put(jnp.ones(cap_total, bool), sh)
    shard_rows = jnp.full((n,), cap_total // n, jnp.int64)

    def phases(stop):
        def step(key, kv, shard_rows, d0, v0):
            my = jax.lax.axis_index(axis)
            n_rows = shard_rows[my]
            cap = key.shape[0]
            datas, valids = [d0], [v0]
            okey = K.orderable_i64(key)
            live = jnp.arange(cap) < n_rows
            skey = jnp.where(live & kv, okey,
                             jnp.int64(np.iinfo(np.int64).max))
            skey_sorted = jnp.sort(skey)
            take = jnp.linspace(0, cap - 1, n_samples).astype(jnp.int64)
            samples = skey_sorted[take]
            all_samples = jax.lax.all_gather(samples, axis).reshape(-1)
            all_sorted = jnp.sort(all_samples)
            bidx = (jnp.arange(1, n)
                    * (all_sorted.shape[0] // n)).astype(jnp.int64)
            pivots = all_sorted[bidx]
            pid = jnp.searchsorted(pivots, skey, side="right").astype(
                jnp.int32)
            if stop == "sample":
                return (jnp.sum(pid.astype(jnp.int64)).reshape(1),)
            sc = spmd.send_cap(cap, n, recv_factor)
            idx, counts = spmd.bucket_rows(pid, live, n, sc)
            if stop == "bucket":
                return (jnp.sum(idx.astype(jnp.int64)).reshape(1)
                        + jnp.sum(counts).reshape(1),)
            rd, rv, rlive = spmd.exchange_columns(
                axis, idx, counts, [key] + datas, [kv] + valids
            )
            if stop == "exchange":
                return (sum(jnp.sum(x.astype(jnp.int64)) for x in rd
                            ).reshape(1),)
            if recv_factor is None:
                oc = cap * n
            else:
                oc = min(spmd._cap128(int(cap * recv_factor)), cap * n)
            cd, cv, ccount = spmd.compact_received(rlive, rd, rv, oc)
            if stop == "compact":
                return (sum(jnp.sum(x.astype(jnp.int64)) for x in cd
                            ).reshape(1),)
            perm = K.sort_permutation([cd[0]], [cv[0]], [True], [False],
                                      ccount)
            out = [d[perm] for d in cd] + [v[perm] for v in cv]
            return (sum(jnp.sum(x.astype(jnp.int64)) for x in out
                        ).reshape(1),)

        return jax.jit(spmd.shard_map(
            step, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(axis), P(axis)),
            out_specs=(P(axis),),
        ))

    res = {"n": n_devices}
    for stop in ("sample", "bucket", "exchange", "compact", "full"):
        f = phases(stop)
        float(np.asarray(f(key, kv, shard_rows, data, dv)[0]).sum())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(f(key, kv, shard_rows, data, dv)[0]).sum())
            ts.append(time.perf_counter() - t0)
        res[stop] = round(min(ts) * 1e3, 1)
    print(json.dumps(res))


def main() -> None:
    rows = {}
    for nd in (1, 2, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={nd}"
                            ).strip()
        env["_QE_PROBE_CHILD"] = str(nd)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(TOTAL_ROWS)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"N={nd} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            sys.exit(1)
        r = json.loads(line[-1])
        rows[nd] = r
        prev = 0.0
        deltas = {}
        for k in ("sample", "bucket", "exchange", "compact", "full"):
            deltas[k] = round(r[k] - prev, 1)
            prev = r[k]
        print(f"N={nd}: cumulative {r}")
        print(f"       per-phase {deltas}")
    print(json.dumps(rows))


if __name__ == "__main__":
    if "_QE_PROBE_CHILD" in os.environ:
        child(int(os.environ["_QE_PROBE_CHILD"]), TOTAL_ROWS)
    else:
        main()
