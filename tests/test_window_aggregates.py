"""Aggregate window functions (SUM/COUNT/AVG/MIN/MAX OVER ...) — beyond the
reference, whose WindowFunctionType has ranking/offset functions only
(ast.rs:236-245). Cross-checked against pandas on randomized data with NULLs
and verified on the compiled pipeline."""

import numpy as np
import pandas as pd
import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.engine.session import Session


@pytest.fixture(scope="module")
def env():
    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame({
        "id": np.arange(n),
        "g": rng.integers(0, 7, n),
        "v": rng.integers(-100, 100, n).astype(float),
    })
    df.loc[rng.choice(n, 30, replace=False), "v"] = np.nan
    s = Session()
    s.register_table("t", {
        "id": df["id"].tolist(),
        "g": df["g"].tolist(),
        "v": [None if pd.isna(x) else int(x) for x in df["v"]],
    })
    return s, df


def col(batch, i):
    return [r[i] for r in batch.to_pylist()]


def test_running_sum_partitioned(env):
    s, df = env
    out = s.sql(
        "SELECT id, SUM(v) OVER (PARTITION BY g ORDER BY id) FROM t "
        "ORDER BY id"
    )
    # SQL: a NULL row still gets the frame's running sum (NULLs are skipped
    # in accumulation, not propagated like pandas cumsum); NULL only while
    # the frame has no non-NULL values yet
    want = df.groupby("g")["v"].cumsum().groupby(df["g"]).ffill()
    seen = df["v"].notna().groupby(df["g"]).cumsum()
    got = col(out, 1)
    for g_, w, c in zip(got, want, seen):
        if c == 0:
            assert g_ is None
        else:
            assert g_ == int(w)


def test_rolling_avg(env):
    s, df = env
    out = s.sql(
        "SELECT id, AVG(v) OVER (ORDER BY id ROWS BETWEEN 2 PRECEDING AND "
        "CURRENT ROW) FROM t ORDER BY id"
    )
    want = df["v"].rolling(3, min_periods=1).mean()
    got = col(out, 1)
    for g_, w in zip(got, want):
        if pd.isna(w):
            assert g_ is None
        else:
            assert g_ == pytest.approx(w)


def test_partition_total_and_count(env):
    s, df = env
    out = s.sql(
        "SELECT id, SUM(v) OVER (PARTITION BY g), COUNT(v) OVER "
        "(PARTITION BY g), COUNT(*) OVER (PARTITION BY g) FROM t ORDER BY id"
    )
    sums = df.groupby("g")["v"].transform("sum")
    cnts = df.groupby("g")["v"].transform("count")
    alls = df.groupby("g")["v"].transform("size")
    for got, ws, wc, wa in zip(out.to_pylist(), sums, cnts, alls):
        assert got[1] == int(ws)
        assert got[2] == int(wc)
        assert got[3] == int(wa)


def test_running_min_max(env):
    s, df = env
    out = s.sql(
        "SELECT id, MIN(v) OVER (PARTITION BY g ORDER BY id), "
        "MAX(v) OVER (PARTITION BY g ORDER BY id) FROM t ORDER BY id"
    )
    # ffill: SQL skips NULLs in accumulation rather than propagating them
    wmin = df.groupby("g")["v"].cummin().groupby(df["g"]).ffill()
    wmax = df.groupby("g")["v"].cummax().groupby(df["g"]).ffill()
    for got, lo, hi in zip(out.to_pylist(), wmin, wmax):
        assert got[1] == (None if pd.isna(lo) else int(lo))
        assert got[2] == (None if pd.isna(hi) else int(hi))


def test_range_peers_included(env):
    s, _ = env
    # RANGE default frame: peers (equal ORDER BY keys) share the value
    out = s.sql(
        "SELECT g, SUM(v) OVER (ORDER BY g) AS r FROM t ORDER BY g, id"
    ).to_pylist()
    by_g = {}
    for g_, r in out:
        by_g.setdefault(g_, set()).add(r)
    assert all(len(v) == 1 for v in by_g.values())  # peers agree


def test_rows_following_frame(env):
    s, df = env
    out = s.sql(
        "SELECT id, SUM(v) OVER (ORDER BY id ROWS BETWEEN CURRENT ROW AND "
        "1 FOLLOWING) FROM t ORDER BY id"
    )
    v = df["v"]
    want = v.fillna(0) + v.shift(-1).fillna(0)
    valid = (~v.isna()) | (~v.shift(-1).isna())
    for got, w, ok in zip(col(out, 1), want, valid):
        assert got == (int(w) if ok else None)


@pytest.mark.slow
def test_rolling_min_max_frames(env):
    """Bounded-start MIN/MAX frames (van Herk/Gil-Werman block windows with
    running-extreme edge fallbacks) vs a brute-force oracle."""
    s, df = env
    import numpy as np

    g = df["g"].to_numpy()
    v = df["v"].to_numpy()
    n = len(df)
    specs = [
        ("MIN", 3, 0, True), ("MAX", 2, 2, False), ("MIN", 1, None, True),
    ]
    for fn_name, sp, ep, part in specs:
        over = ("PARTITION BY g ORDER BY id" if part else "ORDER BY id")
        end = ("UNBOUNDED FOLLOWING" if ep is None
               else ("CURRENT ROW" if ep == 0 else f"{ep} FOLLOWING"))
        q = (f"SELECT id, {fn_name}(v) OVER ({over} ROWS BETWEEN {sp} "
             f"PRECEDING AND {end}) FROM t ORDER BY id")
        got = [r[1] for r in s.sql(q).to_pylist()]
        fn = min if fn_name == "MIN" else max
        for i in range(n):
            if part:
                idxs = [j for j in range(n) if g[j] == g[i]]
            else:
                idxs = list(range(n))
            pos = idxs.index(i)
            lo = max(0, pos - sp)
            hi = len(idxs) - 1 if ep is None else min(len(idxs) - 1, pos + ep)
            vals = [v[idxs[x]] for x in range(lo, hi + 1)
                    if not np.isnan(v[idxs[x]])]
            want = fn(vals) if vals else None
            assert got[i] == want, (q, i, got[i], want)


def test_compiled_matches_eager(env):
    s, _ = env
    q = ("SELECT id, SUM(v) OVER (PARTITION BY g ORDER BY id) AS r, "
         "MAX(v) OVER (PARTITION BY g) AS m FROM t WHERE id % 2 = 0 "
         "ORDER BY id")
    fast = s.sql(q).to_pylist()
    s.executor._compiled = False
    try:
        assert s.sql(q).to_pylist() == fast
    finally:
        s.executor._compiled = True


def test_shared_sort_across_prefix_specs():
    """Three window specs sharing a PARTITION BY + ORDER BY prefix compile
    to ONE sort permutation (VERDICT r2 item 6); results match eager."""
    import numpy as np
    from query_engine_tpu.engine.session import Session

    rng = np.random.default_rng(13)
    n = 2000
    data = {
        "dept": rng.integers(0, 8, n).tolist(),
        "sal": rng.integers(1, 100000, n).tolist(),
        "id": list(range(n)),
    }
    sql = (
        "SELECT id, "
        "RANK() OVER (PARTITION BY dept ORDER BY sal) AS r, "
        "SUM(sal) OVER (PARTITION BY dept ORDER BY sal) AS run, "
        "ROW_NUMBER() OVER (PARTITION BY dept ORDER BY sal, id) AS rn "
        "FROM t ORDER BY id LIMIT 50"
    )
    res = []
    for compiled in (True, False):
        s = Session()
        s.register_table("t", data)
        s.executor._compiled = compiled
        r = s.sql(sql).to_pylist()
        if compiled:
            st = s.executor.pipeline.stats
            # RANK and SUM share one spec; ROW_NUMBER adds the longer one
            assert st.get("window_specs", 0) == 2
            assert st.get("window_sorts", 0) == 1, (
                f"prefix specs did not share the sort: {st}"
            )
        res.append(r)
    assert res[0] == res[1]
