"""Operator kernel tests (sort, group, aggregate, join, window) on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

import query_engine_tpu  # noqa: F401  (enables x64)
from query_engine_tpu.ops import kernels as K


def pad(arr, cap, fill=0):
    out = np.full(cap, fill, dtype=np.asarray(arr).dtype)
    out[: len(arr)] = arr
    return jnp.asarray(out)


def test_f64_orderable_bits():
    xs = np.array([-np.inf, -1e300, -2.5, -1.0, -0.0, 0.0, 1e-300, 1.0, 2.5, np.inf])
    ys = np.asarray(K._f64_orderable_bits(jnp.asarray(xs)))
    assert all(ys[i] <= ys[i + 1] for i in range(len(ys) - 1))
    assert ys[4] == ys[5]  # -0.0 == +0.0


def test_sort_permutation_multikey_desc_nulls():
    cap = 8
    a = pad([3, 1, 3, 2, 1], cap)
    av = pad([True, True, True, True, False], cap, fill=False)
    b = pad([10.0, 20.0, 5.0, 7.0, 9.0], cap, fill=0.0)
    bv = pad([True] * 5, cap, fill=False)
    # ORDER BY a ASC NULLS LAST, b DESC
    perm = K.sort_permutation([a, b], [av, bv], [True, False], [False, False], 5)
    order = np.asarray(perm)[:5].tolist()
    # a=1 rows: row1 (b=20); a=2: row3; a=3: rows 0 (b=10) then 2 (b=5); null a last: row4
    assert order == [1, 3, 0, 2, 4]


def test_group_ids_nulls_group_together():
    cap = 8
    k = pad([101, 102, 101, 103, 102, 0], cap)
    kv = pad([True, True, True, True, True, False], cap, fill=False)
    gid, ng, rep = K.group_ids([k], [kv], 6)
    gid = np.asarray(gid)[:6]
    assert int(ng) == 4  # {101, 102, 103, NULL}
    # same key -> same gid
    assert gid[0] == gid[2] and gid[1] == gid[4]
    assert len({gid[0], gid[1], gid[3], gid[5]}) == 4


def test_segment_aggregate_semantics():
    cap = 8
    # groups: [0,0,1,1,1], values [1, null, 3, 4, null]
    gid = pad([0, 0, 1, 1, 1], cap)
    x = pad([1, 999, 3, 4, 999], cap)
    xv = pad([True, False, True, True, False], cap, fill=False)
    cnt_star, _ = K.segment_aggregate("count_star", None, None, gid, 5, cap)
    assert np.asarray(cnt_star)[:2].tolist() == [2, 3]
    cnt, _ = K.segment_aggregate("count", x, xv, gid, 5, cap)
    assert np.asarray(cnt)[:2].tolist() == [1, 2]
    s, sv = K.segment_aggregate("sum", x, xv, gid, 5, cap)
    assert np.asarray(s)[:2].tolist() == [1, 7]
    assert np.asarray(sv)[:2].tolist() == [True, True]
    a, _ = K.segment_aggregate("avg", x, xv, gid, 5, cap)
    assert np.asarray(a)[:2].tolist() == [1.0, 3.5]
    mn, _ = K.segment_aggregate("min", x, xv, gid, 5, cap)
    mx, _ = K.segment_aggregate("max", x, xv, gid, 5, cap)
    assert np.asarray(mn)[:2].tolist() == [1, 3]
    assert np.asarray(mx)[:2].tolist() == [1, 4]
    # all-null group -> invalid
    gid2 = pad([0, 0], cap)
    x2 = pad([5, 6], cap)
    x2v = pad([False, False], cap, fill=False)
    s2, s2v = K.segment_aggregate("sum", x2, x2v, gid2, 2, cap)
    assert not bool(np.asarray(s2v)[0])


def _run_inner_join(lkeys, lvalid, rkeys, rvalid):
    cap_l, cap_r = 8, 8
    ld = pad(lkeys, cap_l)
    lv = pad(lvalid, cap_l, fill=False)
    rd = pad(rkeys, cap_r)
    rv = pad(rvalid, cap_r, fill=False)
    nl, nr = len(lkeys), len(rkeys)
    lr, rr = K.join_ranks([(ld, lv)], [(rd, rv)], nl, nr)
    (total, counts, offsets, rank_start, right_by_rank,
     lm, rm) = K.join_counts(lr, rr, nl, nr)
    T = int(total)
    out_cap = max(8, T)
    li, ri, valid = K.join_emit_inner(
        counts, rank_start, right_by_rank, lr, total, out_cap)
    pairs = [
        (int(l), int(r))
        for l, r, v in zip(np.asarray(li), np.asarray(ri), np.asarray(valid))
        if v
    ]
    return pairs, np.asarray(lm), np.asarray(rm)


def test_inner_join_with_duplicates_and_nulls():
    # left keys: [101, 102, 101, None], right keys: [101, 103, 101, None]
    pairs, lm, rm = _run_inner_join(
        [101, 102, 101, 0], [True, True, True, False],
        [101, 103, 101, 0], [True, True, True, False],
    )
    # 2 left 101-rows x 2 right 101-rows = 4 pairs; nulls never match
    assert sorted(pairs) == [(0, 0), (0, 2), (2, 0), (2, 2)]
    assert lm[:4].tolist() == [True, False, True, False]
    assert rm[:4].tolist() == [True, False, True, False]


def test_unmatched_and_cross():
    matched = pad([True, False, True, False], 8, fill=False)
    # note: pad fill False would count as unmatched without live mask
    idx, cnt = K.unmatched_indices(jnp.asarray(matched), 4, 8)
    assert int(cnt) == 2
    assert np.asarray(idx)[:2].tolist() == [1, 3]
    li, ri, v = K.cross_join_indices(2, 3, 8)
    got = [(int(a), int(b)) for a, b, ok in zip(*map(np.asarray, (li, ri, v))) if ok]
    assert got == [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)]


def test_window_primitives():
    cap = 8
    # partitions (sorted): [A A A | B B], order values [10 10 20 | 5 7]
    part = pad([1, 1, 1, 2, 2], cap)
    order = pad([10, 10, 20, 5, 7], cap)
    pad_mask = ~K.live_mask(cap, 5)
    seg_change, peer_change, seg = K.window_segments([part], [order], pad_mask)
    rn = np.asarray(K.row_number_sorted(seg_change))[:5].tolist()
    assert rn == [1, 2, 3, 1, 2]
    rk = np.asarray(K.rank_sorted(seg_change, peer_change))[:5].tolist()
    assert rk == [1, 1, 3, 1, 2]
    dr = np.asarray(K.dense_rank_sorted(seg_change, peer_change))[:5].tolist()
    assert dr == [1, 1, 2, 1, 2]
    # LAG 1 within segment
    vals = pad([10, 10, 20, 5, 7], cap)
    vv = pad([True] * 5, cap, fill=False)
    lag, lagv = K.shift_in_segment(vals, vv, seg, 1)
    assert np.asarray(lagv)[:5].tolist() == [False, True, True, False, True]
    assert np.asarray(lag)[1:3].tolist() == [10, 10]
    # NTILE(2) over first segment of 3: buckets 1,1,2
    nt = np.asarray(K.ntile_sorted(seg_change, 2, pad_mask))[:5].tolist()
    assert nt == [1, 1, 2, 1, 2]
    # FIRST/LAST via seg start/end
    st = np.asarray(K._seg_start_pos(seg_change))[:5].tolist()
    en = np.asarray(K._seg_end_pos(seg_change))[:5].tolist()
    assert st == [0, 0, 0, 3, 3]
    assert en == [2, 2, 2, 4, 4]


def test_compaction():
    cap = 8
    mask = pad([True, False, True, True, False], cap, fill=True)  # pad True on purpose
    cnt = int(K.filter_count(jnp.asarray(mask), 5))
    assert cnt == 3
    idx = np.asarray(K.compaction_indices(jnp.asarray(mask), 5, 8))
    assert idx[:3].tolist() == [0, 2, 3]


def test_group_ids_direct_matches_sorted():
    cap = 16
    k = pad([5, 9, 5, -3, 9, 0], cap)
    kv = pad([True, True, True, True, True, False], cap, fill=False)
    g1, n1, r1 = K.group_ids([k], [kv], 6)
    g2, n2, r2 = K.group_ids_direct(k, kv, 6, -3, 13)
    assert int(n1) == int(n2) == 4
    a = np.asarray(g1)[:6].tolist()
    b = np.asarray(g2)[:6].tolist()
    assert a == b  # same dense ids in key order, null last
    assert np.asarray(r1)[:4].tolist() == np.asarray(r2)[:4].tolist()


def test_group_ids_direct_all_null_and_empty():
    cap = 8
    k = pad([1, 2], cap)
    kv = pad([False, False], cap, fill=False)
    g, n, r = K.group_ids_direct(k, kv, 2, 0, 4)
    assert int(n) == 1  # single NULL group
    g0, n0, _ = K.group_ids_direct(k, kv, 0, 0, 4)
    assert int(n0) == 0


def test_segment_sum_i64_chunked_exact():
    import jax

    rng = np.random.default_rng(3)
    for cap, nseg in [(1 << 10, 64), (1 << 16, 1 << 16)]:  # 16-bit & 8-bit chunk paths
        vals = jnp.asarray(
            rng.integers(-(1 << 40), 1 << 40, cap), jnp.int64
        )
        gid = jnp.asarray(rng.integers(0, min(nseg, 64), cap, dtype=np.int32))
        ok = jnp.asarray(rng.random(cap) > 0.1)
        got = K._segment_sum_i64(vals, ok, gid, nseg)
        ref = jax.ops.segment_sum(
            jnp.where(ok, vals, 0), gid, num_segments=nseg
        )
        assert bool(jnp.all(got == ref)), cap


# ---- min/max through the orderable-integer image (32-bit scatter paths) ----
def test_segment_minmax_all_dtypes_exact():
    import numpy as np
    import jax.numpy as jnp
    from query_engine_tpu.ops import kernels as K

    rng = np.random.default_rng(0)
    n, S = 5000, 64
    gid_np = rng.integers(0, S, n)
    gid = jnp.asarray(gid_np, jnp.int32)
    ok_np = rng.random(n) > 0.1
    ok = jnp.asarray(ok_np)
    cases = {
        "i64_extreme": rng.choice(
            [0, 1, -1, 2**62, -2**62, 2**63 - 1, -(2**63), 12345, -98765], n
        ).astype(np.int64),
        "i64_rand": rng.integers(-(2**60), 2**60, n),
        "i32": rng.integers(-(2**31), 2**31 - 1, n).astype(np.int32),
        "f64": np.where(
            rng.random(n) < 0.05,
            np.choose(rng.integers(0, 4, n), [np.inf, -np.inf, 0.0, -0.0]),
            rng.normal(0, 1e10, n),
        ),
        "f32": rng.normal(0, 1e5, n).astype(np.float32),
        "bool": rng.random(n) > 0.5,
    }
    for name, data in cases.items():
        dj = jnp.asarray(data)
        for fn, red in (("min", np.min), ("max", np.max)):
            got, has = K.segment_aggregate(fn, dj, ok, gid, n, S)
            got, has = np.asarray(got), np.asarray(has)
            for g in range(S):
                m = ok_np & (gid_np == g)
                assert has[g] == m.any()
                if m.any():
                    assert got[g] == red(data[m]), (name, fn, g)


@pytest.mark.slow
def test_segment_sum_i64_chunk_tiers_exact():
    import numpy as np
    import jax.numpy as jnp
    from query_engine_tpu.ops import kernels as K

    rng = np.random.default_rng(1)
    for cap_exp in (15, 20, 24, 25):
        cap = 1 << cap_exp
        m = min(cap, 1 << 16)
        vals = rng.integers(-(2**62), 2**62, m)
        gids = rng.integers(0, 8, m)
        d = jnp.zeros(cap, jnp.int64).at[:m].set(jnp.asarray(vals))
        okm = jnp.zeros(cap, bool).at[:m].set(True)
        g = jnp.zeros(cap, jnp.int32).at[:m].set(jnp.asarray(gids, jnp.int32))
        got = np.asarray(K._segment_sum_i64(d, okm, g, 8))
        want = np.array([vals[gids == i].sum() for i in range(8)])
        assert (got == want).all(), cap_exp


def test_rank_member_matches_membership():
    """rank_member == set membership over join ranks (the searchsorted
    replacement used by INTERSECT/EXCEPT and IN-subqueries)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    nl, nr = 500, 300
    lk = rng.integers(0, 100, nl)
    rk = rng.integers(50, 150, nr)
    lv = rng.random(nl) > 0.1
    rv = rng.random(nr) > 0.1
    lr, rr = K.join_ranks(
        [(jnp.asarray(lk), jnp.asarray(lv))],
        [(jnp.asarray(rk), jnp.asarray(rv))],
        np.int64(nl), np.int64(nr),
    )
    member = np.asarray(K.rank_member(lr, rr, K.live_mask(nr, np.int64(nr))))
    rset = set(rk[rv].tolist())
    for i in range(nl):
        expect = bool(lv[i]) and int(lk[i]) in rset
        assert member[i] == expect, i


def test_run_broadcast_first_scan():
    import jax.numpy as jnp

    vals = jnp.asarray([5, 0, 0, 7, 0, 9, 0, 0], jnp.int64)
    starts = jnp.asarray([1, 0, 0, 1, 0, 1, 0, 0], bool)
    out = np.asarray(K._run_broadcast_first(vals, starts))
    assert out.tolist() == [5, 5, 5, 7, 7, 9, 9, 9]


def test_window_frame_scan_equals_gather_semantics():
    """Scan-based range_current/partition frames == brute-force windows."""
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    n = 200
    part = np.sort(rng.integers(0, 5, n))
    order = rng.integers(0, 8, n)
    vals = rng.integers(-50, 50, n)
    # sort by (part, order) to get window order
    perm = np.lexsort((order, part))
    p_s, o_s, v_s = part[perm], order[perm], vals[perm]
    seg_change = np.zeros(n, bool); seg_change[0] = True
    seg_change[1:] = p_s[1:] != p_s[:-1]
    peer_change = seg_change.copy()
    peer_change[1:] |= o_s[1:] != o_s[:-1]
    for frame, slicer in (
        (("partition",), lambda i: (p_s == p_s[i])),
        (("range_current",),
         lambda i: (p_s == p_s[i]) & ((p_s != p_s[i]) | (
             np.arange(n) <= np.max(np.nonzero(
                 (p_s == p_s[i]) & (o_s == o_s[i]))[0])))),
    ):
        got, gv = K.window_aggregate_sorted(
            "sum", jnp.asarray(v_s), jnp.ones(n, bool),
            jnp.asarray(seg_change), jnp.asarray(peer_change),
            jnp.zeros(n, bool), frame,
        )
        got = np.asarray(got)
        for i in range(0, n, 13):
            expect = int(v_s[slicer(i)].sum())
            assert got[i] == expect, (frame, i)


def test_fk_gather_by_rank_matches_lookup_plus_gather():
    """Fused rank-space gather == fk_join_right_lookup + per-column gather
    (the FK join emit fast path), including unmatched and null handling."""
    import jax.numpy as jnp

    rng = np.random.default_rng(29)
    nl, nr, n_ranks = 400, 100, 128
    # unique build ranks in [0, n_ranks); some build rows dead/null
    rr_vals = rng.permutation(n_ranks)[:nr].astype(np.int32)
    r_live = rng.random(nr) > 0.1
    lr_vals = rng.integers(-2, n_ranks, nl).astype(np.int32)  # -ve = null key
    l_live = rng.random(nl) > 0.1
    datas = [
        jnp.asarray(rng.integers(0, 900, nr)),
        jnp.asarray(rng.random(nr) > 0.5),
    ]
    valids = [jnp.asarray(rng.random(nr) > 0.2), jnp.ones(nr, bool)]
    bounds = [(0, 1024), None]

    fused = K.fk_gather_by_rank(
        datas, valids, bounds, jnp.asarray(rr_vals), jnp.asarray(r_live),
        jnp.asarray(lr_vals), jnp.asarray(l_live), n_ranks,
    )
    assert fused is not None
    f_d, f_v, f_m = fused

    ri, matched = K.fk_join_right_lookup(
        jnp.asarray(np.where(l_live, lr_vals, -1)),
        jnp.asarray(np.where(r_live, rr_vals, -1)),
        np.int64(nl), np.int64(nr), n_ranks,
    )
    g_d, g_v = K.gather_columns(datas, valids, ri, matched)
    assert np.array_equal(np.asarray(f_m), np.asarray(matched))
    for i in range(2):
        vm = np.asarray(g_v[i])
        assert np.array_equal(np.asarray(f_v[i]), vm), i
        assert np.array_equal(
            np.asarray(f_d[i])[vm], np.asarray(g_d[i])[vm]
        ), i


def test_fk_gather_by_rank_unpackable_returns_none():
    import jax.numpy as jnp

    out = K.fk_gather_by_rank(
        [jnp.asarray(np.random.rand(8))], [jnp.ones(8, bool)], [None],
        jnp.arange(8, dtype=jnp.int32), jnp.ones(8, bool),
        jnp.arange(16, dtype=jnp.int32), jnp.ones(16, bool), 32,
    )
    assert out is None  # f64 column cannot pack -> caller falls back


@pytest.mark.slow
def test_group_ids_composite_ranges_matches_default():
    """Bounded multi-key grouping via the single composite i64 operand
    produces the same dense ids/groups as the multi-operand sort."""
    import jax.numpy as jnp

    rng = np.random.default_rng(41)
    n = 2000
    k1 = jnp.asarray(rng.integers(100, 5000, n))
    v1 = jnp.asarray(rng.random(n) > 0.1)
    k2 = jnp.asarray(rng.integers(-8, 8, n).astype(np.int32))
    v2 = jnp.asarray(rng.random(n) > 0.1)
    k3 = jnp.asarray(rng.random(n) > 0.5)  # bool key
    v3 = jnp.ones(n, bool)
    nrows = np.int64(n - 13)
    args = ([k1, k2, k3], [v1, v2, v3], nrows)
    g0, n0, r0 = K.group_ids(*args)
    g1, n1, r1 = K.group_ids(
        *args, ranges=[(100, 8192), (-8, 16), (0, 2)]
    )
    assert int(n0) == int(n1)
    assert np.array_equal(np.asarray(g0)[: n - 13], np.asarray(g1)[: n - 13])
    ng = int(n0)
    assert np.array_equal(np.asarray(r0)[:ng], np.asarray(r1)[:ng])


def test_join_ranks_counts_fused_matches_legacy():
    """join_ranks_counts / join_count_total (sorted-space scans) agree
    with join_ranks + join_counts on every output, incl. NULL keys."""
    import numpy as np
    import jax.numpy as jnp
    from query_engine_tpu.ops import kernels as K

    rng = np.random.default_rng(17)
    cap_l, cap_r = 512, 256
    nl, nr = 490, 230
    ld = jnp.asarray(rng.integers(0, 50, cap_l))
    lv = jnp.asarray(rng.random(cap_l) > 0.1)
    rd = jnp.asarray(rng.integers(0, 50, cap_r))
    rv = jnp.asarray(rng.random(cap_r) > 0.1)

    lr0, rr0 = K.join_ranks([(ld, lv)], [(rd, rv)], nl, nr)
    legacy = K.join_counts(lr0, rr0, nl, nr)
    (lt, lc, lo, lrs, lrbr, llm, lrm) = legacy

    (lr1, rr1, total, counts, offsets, rank_start, right_by_rank,
     lmatched, rmatched) = K.join_ranks_counts(
        [(ld, lv)], [(rd, rv)], nl, nr
    )
    assert np.array_equal(np.asarray(lr1), np.asarray(lr0))
    assert np.array_equal(np.asarray(rr1), np.asarray(rr0))
    assert int(total) == int(lt)
    assert np.array_equal(np.asarray(counts), np.asarray(lc))
    assert np.array_equal(np.asarray(offsets), np.asarray(lo))
    assert np.array_equal(np.asarray(rank_start), np.asarray(lrs))
    assert np.array_equal(np.asarray(right_by_rank), np.asarray(lrbr))
    assert np.array_equal(np.asarray(lmatched), np.asarray(llm))
    assert np.array_equal(np.asarray(rmatched), np.asarray(lrm))

    t2, ml, mr = K.join_count_total([(ld, lv)], [(rd, rv)], nl, nr)
    assert int(t2) == int(lt)
    assert int(ml) == int(np.asarray(llm).sum())
    assert int(mr) == int(np.asarray(lrm).sum())


def test_segment_sum_i64_16bit_chunk_branch():
    """The runtime 16-bit chunk branch (per-segment counts < 2^16) must
    agree exactly with the safe-width branch and plain segment_sum."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from query_engine_tpu.ops import kernels as K

    rng = np.random.default_rng(5)
    cap = 1 << 16  # > 2^15: selects the 8-bit default width
    n_seg = 512
    data = jnp.asarray(rng.integers(-(1 << 40), 1 << 40, cap))
    ok = jnp.asarray(rng.random(cap) > 0.1)
    gid = jnp.asarray(rng.integers(0, n_seg, cap).astype(np.int32))
    counts = jax.ops.segment_sum(
        ok.astype(jnp.int32), gid, num_segments=n_seg
    ).astype(jnp.int64)
    expected = jax.ops.segment_sum(
        jnp.where(ok, data, 0), gid, num_segments=n_seg
    )
    got = K._segment_sum_i64(
        data, ok, gid, n_seg,
        value_bounds=(-(1 << 40), 1 << 40), counts=counts,
    )
    assert np.array_equal(np.asarray(got), np.asarray(expected))

    # force the safe branch: one segment holding > 2^16 rows
    gid_hot = jnp.zeros(cap, dtype=jnp.int32)
    counts_hot = jax.ops.segment_sum(
        ok.astype(jnp.int32), gid_hot, num_segments=n_seg
    ).astype(jnp.int64)
    expected_hot = jax.ops.segment_sum(
        jnp.where(ok, data, 0), gid_hot, num_segments=n_seg
    )
    got_hot = K._segment_sum_i64(
        data, ok, gid_hot, n_seg,
        value_bounds=(-(1 << 40), 1 << 40), counts=counts_hot,
    )
    assert np.array_equal(np.asarray(got_hot), np.asarray(expected_hot))
