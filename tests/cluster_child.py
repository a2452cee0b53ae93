"""Child process for tests/test_cluster.py: joins a 2-process
jax.distributed cluster over a local coordinator, runs the SPMD
distributed aggregate across the process boundary, and (on process 0)
writes the gathered per-group results as JSON.

Run: python tests/cluster_child.py <coordinator_port> <process_id> <out>
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import query_engine_tpu  # noqa: F401  (x64 + cache config)
    import jax
    from jax.experimental import multihost_utils

    from query_engine_tpu.columnar.batch import ColumnBatch
    from query_engine_tpu.parallel import cluster, spmd
    from query_engine_tpu.parallel.mesh import ShardedTable

    info = cluster.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert info.process_count == 2, info
    assert info.process_index == pid, info
    assert jax.device_count() == 2, jax.devices()
    assert jax.local_device_count() == 1, jax.local_devices()

    mesh = cluster.global_mesh()
    rng = np.random.default_rng(11)  # identical data on both hosts
    n = 4096
    batch = ColumnBatch.from_pydict({
        "k": rng.integers(0, 16, n),
        "v": rng.integers(0, 1000, n),
    })
    st = ShardedTable(batch, mesh)
    agg = spmd.make_distributed_aggregate(
        mesh, aggs=[("count_star", -1), ("sum", 0)], n_args=1,
        group_capacity=64,
    )
    out = agg(
        st.datas[0], st.valids[0], st.shard_rows, st.datas[1], st.valids[1]
    )
    # outputs are row-sharded across the two processes: gather them to
    # every host (the host-boundary read path the single-process tests
    # cannot exercise)
    gathered = [np.asarray(multihost_utils.process_allgather(o, tiled=True))
                for o in out]
    fkey, fkv = gathered[0].reshape(-1), gathered[1].reshape(-1)
    cnt = gathered[2].reshape(-1)
    sm = gathered[4].reshape(-1)
    ngs = gathered[-1].reshape(-1)
    per = fkey.shape[0] // 2
    results = {}
    for s in range(2):
        for i in range(int(ngs[s])):
            j = s * per + i
            key = int(fkey[j]) if bool(fkv[j]) else None
            assert key not in results, "group split across processes"
            results[str(key)] = [int(cnt[j]), int(sm[j])]
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(results, f)
    cluster.shutdown()


if __name__ == "__main__":
    main()
