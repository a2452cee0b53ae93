"""SPMD distributed kernels on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.parallel.mesh import ShardedTable, make_mesh
from query_engine_tpu.parallel import spmd


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def test_sharded_table_roundtrip(mesh):
    rng = np.random.default_rng(0)
    n = 1000
    batch = ColumnBatch.from_pydict(
        {"k": rng.integers(0, 50, n).tolist(), "v": rng.integers(0, 100, n).tolist()}
    )
    st = ShardedTable(batch, mesh)
    back = st.to_batch()
    assert back.num_rows == n
    assert back.to_pydict() == batch.to_pydict()


def test_distributed_aggregate_matches_local(mesh):
    rng = np.random.default_rng(1)
    n = 2000
    keys = rng.integers(0, 37, n)
    vals = rng.integers(-50, 50, n)
    # some nulls in both key and value
    kv = rng.random(n) > 0.05
    vv = rng.random(n) > 0.1
    batch = ColumnBatch.from_pydict(
        {
            "k": [int(k) if ok else None for k, ok in zip(keys, kv)],
            "v": [int(v) if ok else None for v, ok in zip(vals, vv)],
        }
    )
    st = ShardedTable(batch, mesh)
    agg = spmd.make_distributed_aggregate(
        mesh, aggs=[("count_star", -1), ("sum", 0), ("min", 0), ("max", 0), ("avg", 0)],
        n_args=1,
    )
    out = agg(
        st.datas[0], st.valids[0], st.shard_rows, st.datas[1], st.valids[1]
    )
    # unpack: key, kv, then (val, valid) per combined column, then ng per shard
    fkey, fkv = np.asarray(out[0]), np.asarray(out[1])
    planes = [np.asarray(o) for o in out[2:-1]]
    ngs = np.asarray(out[-1])
    per = fkey.shape[0] // 8

    results = {}
    for s in range(8):
        ng = ngs[s]
        for i in range(ng):
            j = s * per + i
            key = fkey[j] if fkv[j] else None
            cnt = planes[0][j]
            sm = planes[2][j] if planes[3][j] else None
            mn = planes[4][j] if planes[5][j] else None
            mx = planes[6][j] if planes[7][j] else None
            avs = planes[8][j] if planes[9][j] else None
            avc = planes[10][j]
            avg = (avs / avc) if avs is not None and avc > 0 else None
            assert key not in results, "group split across shards!"
            results[key] = (cnt, sm, mn, mx, avg)

    # expected via pure python
    import collections

    exp = collections.defaultdict(lambda: [0, None, None, None, [0.0, 0]])
    for k, ok, v, okv in zip(keys, kv, vals, vv):
        key = int(k) if ok else None
        e = exp[key]
        e[0] += 1
        if okv:
            e[1] = int(v) if e[1] is None else e[1] + int(v)
            e[2] = int(v) if e[2] is None else min(e[2], int(v))
            e[3] = int(v) if e[3] is None else max(e[3], int(v))
            e[4][0] += float(v)
            e[4][1] += 1
    assert set(results) == set(exp)
    for key, (cnt, sm, mn, mx, avg) in results.items():
        e = exp[key]
        assert cnt == e[0], key
        assert sm == e[1], key
        assert mn == e[2] and mx == e[3], key
        eavg = e[4][0] / e[4][1] if e[4][1] else None
        if eavg is None:
            assert avg is None
        else:
            assert avg == pytest.approx(eavg)


def test_distributed_sort_global_order(mesh):
    rng = np.random.default_rng(2)
    n = 1500
    keys = rng.integers(-1000, 1000, n)
    batch = ColumnBatch.from_pydict(
        {"k": keys.tolist(), "payload": list(range(n))}
    )
    st = ShardedTable(batch, mesh)
    dsort = spmd.make_distributed_sort(mesh, n_cols=1)
    out = dsort(st.datas[0], st.valids[0], st.shard_rows, st.datas[1], st.valids[1])
    key_plane = np.asarray(out[0])
    counts = np.asarray(out[-2])  # [-1] = recv-overflow flag
    assert int(np.asarray(out[-1]).sum()) == 0
    per = key_plane.shape[0] // 8
    collected = []
    for s in range(8):
        collected.extend(key_plane[s * per: s * per + counts[s]].tolist())
    assert len(collected) == n
    assert collected == sorted(keys.tolist())


def test_distributed_join_counts(mesh):
    rng = np.random.default_rng(3)
    nl, nr = 800, 600
    lk = rng.integers(0, 100, nl)
    rk = rng.integers(0, 100, nr)
    lb = ColumnBatch.from_pydict({"k": lk.tolist(), "lv": list(range(nl))})
    rb = ColumnBatch.from_pydict({"k": rk.tolist(), "rv": list(range(nr))})
    stl = ShardedTable(lb, mesh)
    strr = ShardedTable(rb, mesh)
    djoin = spmd.make_distributed_join_counts(mesh, 1, 1)
    out = djoin(
        stl.datas[0], stl.valids[0], stl.shard_rows,
        strr.datas[0], strr.valids[0], strr.shard_rows,
        stl.datas[1], stl.valids[1], strr.datas[1], strr.valids[1],
    )
    totals = np.asarray(out[0])
    total = int(totals.sum())
    # expected: sum over keys of count_l * count_r
    import collections

    cl = collections.Counter(lk.tolist())
    cr = collections.Counter(rk.tolist())
    expected = sum(cl[k] * cr.get(k, 0) for k in cl)
    assert total == expected


def test_skew_aware_salted_join(mesh):
    """Hot-key skew: 80% of probe rows share one key. Salted exchange must
    produce identical totals while spreading probe rows across shards."""
    rng = np.random.default_rng(11)
    nl, nr = 1600, 100
    lk = np.where(rng.random(nl) < 0.8, 7, rng.integers(0, 50, nl))
    rk = np.arange(nr) % 50
    lb = ColumnBatch.from_pydict({"k": lk.tolist(), "lv": list(range(nl))})
    rb = ColumnBatch.from_pydict({"k": rk.tolist(), "rv": list(range(nr))})
    stl = ShardedTable(lb, mesh)
    strr = ShardedTable(rb, mesh)

    import collections

    cl = collections.Counter(lk.tolist())
    cr = collections.Counter(rk.tolist())
    expected = sum(cl[k] * cr.get(k, 0) for k in cl)

    for salt in (1, 4):
        # recv_factor=None: salt=1 deliberately melts one shard (80% of
        # rows on one key), which the default bounded exchange would (by
        # design) flag as overflow rather than absorb
        djoin = spmd.make_distributed_join_counts(
            mesh, 1, 1, salt=salt, recv_factor=None
        )
        out = djoin(
            stl.datas[0], stl.valids[0], stl.shard_rows,
            strr.datas[0], strr.valids[0], strr.shard_rows,
            stl.datas[1], stl.valids[1], strr.datas[1], strr.valids[1],
        )
        totals = np.asarray(out[0])
        assert int(totals.sum()) == expected, f"salt={salt}"
        # probe-row balance: with salting the hottest shard holds far fewer
        # probe rows than the full hot key
        lcounts = np.asarray(out[1])
        if salt == 1:
            unsalted_max = lcounts.max()
        else:
            assert lcounts.max() < unsalted_max * 0.55, (
                f"salting did not spread load: {lcounts} vs max {unsalted_max}"
            )


def test_distributed_aggregate_multikey(mesh):
    rng = np.random.default_rng(21)
    n = 1200
    k1 = rng.integers(0, 6, n)
    k2 = rng.integers(0, 5, n)
    v = rng.integers(0, 100, n)
    batch = ColumnBatch.from_pydict(
        {"k1": k1.tolist(), "k2": k2.tolist(), "v": v.tolist()}
    )
    st = ShardedTable(batch, mesh)
    agg = spmd.make_distributed_aggregate(
        mesh, aggs=[("count_star", -1), ("sum", 0)], n_args=1, n_keys=2,
    )
    out = agg(
        st.datas[0], st.datas[1], st.valids[0], st.valids[1],
        st.shard_rows, st.datas[2], st.valids[2],
    )
    fk1, fk2 = np.asarray(out[0]), np.asarray(out[1])
    cnt = np.asarray(out[4])
    sm = np.asarray(out[6])
    ngs = np.asarray(out[-1])
    per = fk1.shape[0] // 8
    got = {}
    for s in range(8):
        for i in range(ngs[s]):
            j = s * per + i
            key = (fk1[j], fk2[j])
            assert key not in got, "group split across shards"
            got[key] = (cnt[j], sm[j])
    import collections

    exp = collections.defaultdict(lambda: [0, 0])
    for a, b, x in zip(k1, k2, v):
        exp[(a, b)][0] += 1
        exp[(a, b)][1] += int(x)
    assert set(got) == set(exp)
    for key in exp:
        assert got[key] == tuple(exp[key]), key


def test_overlapped_exchange_aggregate_matches_sequential(mesh):
    """Double-buffered chunked exchange (parallel/overlap.py) produces the
    same per-bucket sums/counts as the barrier-separated two-program walk."""
    import jax.numpy as jnp

    from query_engine_tpu.parallel.overlap import (
        make_overlapped_exchange_aggregate,
        make_sequential_exchange_aggregate,
    )

    n_dev = 8
    per = 1 << 10
    rows = per * n_dev
    rng = np.random.default_rng(9)
    key = jnp.asarray(rng.integers(0, 500, rows))
    kv = jnp.asarray(rng.random(rows) > 0.1)
    val = jnp.asarray(rng.integers(-50, 50, rows))
    shard_rows = np.full(n_dev, per - 7, np.int64)

    ov = make_overlapped_exchange_aggregate(mesh, n_chunks=4)
    s1, c1 = ov(key, kv, val, shard_rows)
    exch, agg = make_sequential_exchange_aggregate(mesh)
    s2, c2 = agg(*exch(key, kv, val, shard_rows))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    # and against a host-side model
    import collections

    k_np = np.asarray(key)[np.asarray(kv)
                           & (np.arange(rows) % per < per - 7)]
    v_np = np.asarray(val)[np.asarray(kv)
                           & (np.arange(rows) % per < per - 7)]
    assert int(np.sum(np.asarray(c1))) == len(k_np)
    assert int(np.sum(np.asarray(s1))) == int(np.sum(v_np))


def test_global_dictionary_merge_distributed_groupby_orderby(mesh):
    """SURVEY §7 hard-part 3: shards ingest DISJOINT string sets with
    per-host dictionaries; after the global merge + SPMD recode, a
    distributed GROUP BY and a distributed ORDER BY on the string column
    are correct and decode through the global dictionary."""
    import jax.numpy as jnp

    from query_engine_tpu.parallel.dict_merge import ingest_sharded_strings
    from query_engine_tpu.parallel import spmd

    n_dev, cap = 8, 128
    rng = np.random.default_rng(21)
    pool = [f"city_{i:03d}" for i in range(40)]
    shard_vals = []
    for s in range(n_dev):
        # disjoint slices: shard s only sees pool[5s : 5s+5]
        mine = pool[5 * s: 5 * s + 5]
        shard_vals.append([mine[rng.integers(0, 5)] for _ in range(100)])

    codes, valid, rows, gdict = ingest_sharded_strings(mesh, shard_vals, cap)
    assert list(gdict.values) == sorted(pool[:40])  # sorted global union

    # distributed GROUP BY string -> COUNT(*)
    prog = spmd.make_distributed_aggregate(
        mesh, [("count_star", 0)], n_args=1, group_capacity=64
    )
    vals = jnp.zeros(cap * n_dev, jnp.int64)
    out = prog(codes, valid, rows, vals, jnp.ones(cap * n_dev, bool))
    fkey, fkv = np.asarray(out[0]), np.asarray(out[1])
    cnt = np.asarray(out[2])
    ngs = np.asarray(out[-1]).reshape(-1)
    per = fkey.shape[0] // n_dev
    got = {}
    for s in range(n_dev):
        for i in range(ngs[s]):
            j = s * per + i
            name = gdict[fkey[j]]
            assert name not in got, "group split across shards"
            got[name] = int(cnt[j])
    import collections

    exp = collections.Counter(v for vs in shard_vals for v in vs)
    assert got == dict(exp)

    # distributed ORDER BY string: global sort of codes == lexicographic
    sort_prog = spmd.make_distributed_sort(mesh, n_cols=0)
    sout = sort_prog(codes, valid, rows)
    skey = np.asarray(sout[0])
    scnt = np.asarray(sout[-2]).reshape(-1)  # [-1] = recv-overflow flag
    per_s = skey.shape[0] // n_dev
    collected = []
    for s in range(n_dev):
        collected.extend(
            gdict.decode(skey[s * per_s: s * per_s + scnt[s]]).tolist()
        )
    assert collected == sorted(v for vs in shard_vals for v in vs)


def test_bounded_recv_capacity_and_overflow_flag(mesh):
    """recv_factor bounds per-shard receive planes (keeps local work
    O(rows/N)); the trailing overflow flag trips when a hot key exceeds
    the balanced bound — and salting spreads the key so it fits again."""
    rng = np.random.default_rng(13)
    nl, nr = 1600, 100
    hot = np.full(nl, 7)  # EVERY probe row hits one key
    rk = np.arange(nr) % 50
    lb = ColumnBatch.from_pydict({"k": hot.tolist(), "lv": list(range(nl))})
    rb = ColumnBatch.from_pydict({"k": rk.tolist(), "rv": list(range(nr))})
    stl = ShardedTable(lb, mesh)
    strr = ShardedTable(rb, mesh)

    def run(salt, factor):
        prog = spmd.make_distributed_join_counts(
            mesh, 1, 1, salt=salt, recv_factor=factor
        )
        out = prog(
            stl.datas[0], stl.valids[0], stl.shard_rows,
            strr.datas[0], strr.valids[0], strr.shard_rows,
            stl.datas[1], stl.valids[1], strr.datas[1], strr.valids[1],
        )
        return int(np.asarray(out[0]).sum()), int(np.asarray(out[-1]).sum())

    expected = nl * 2  # key 7 appears twice on the build side (100 rows % 50)
    # unbounded: always correct
    total, ovf = run(1, None)
    assert total == expected and ovf == 0
    # bounded without salt: the hot shard overflows (flag trips)
    _, ovf = run(1, 2.0)
    assert ovf > 0
    # bounded WITH salt: hot key spreads across 4 shards and fits
    total, ovf = run(4, 2.0)
    assert ovf == 0 and total == expected
