"""Differential tests: engine results vs pandas on randomized tables.

Complements the hand-computed golden suite with breadth: nulls, strings,
negative numbers, duplicate keys, empty results.
"""

import numpy as np
import pandas as pd
import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.engine.session import Session


def make_tables(seed=0, n=500, m=60):
    rng = np.random.default_rng(seed)
    t = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 25, n),
        "v": rng.integers(-1000, 1000, n),
        "f": np.round(rng.normal(0, 100, n), 3),
        "s": rng.choice(["alpha", "beta", "gamma", "delta", None], n,
                        p=[0.3, 0.3, 0.2, 0.1, 0.1]),
    })
    # sprinkle nulls into k and v
    t.loc[rng.choice(n, n // 10, replace=False), "k"] = None
    t.loc[rng.choice(n, n // 10, replace=False), "v"] = None
    d = pd.DataFrame({
        "k": np.arange(m) % 30,
        "label": [f"L{i % 7}" for i in range(m)],
    })
    return t, d


@pytest.fixture(scope="module")
def env():
    t, d = make_tables()
    s = Session()
    s.register_table("t", {
        c: [None if pd.isna(x) else (int(x) if c in ("id", "k", "v") else x)
            for x in t[c]]
        for c in t.columns
    })
    s.register_table("d", {
        "k": d["k"].tolist(), "label": d["label"].tolist(),
    })
    return s, t, d


def _null_safe_key(rows):
    return sorted(
        rows,
        key=lambda r: tuple((v is None, "" if v is None else str(type(v)), v if v is not None else 0) for v in r),
    )


def rows_of(batch):
    return _null_safe_key(
        [tuple(None if v is None else v for v in r) for r in batch.to_pylist()]
    )


def pd_rows(df):
    out = []
    for r in df.itertuples(index=False):
        row = []
        for v in r:
            if pd.isna(v):
                row.append(None)
            elif isinstance(v, (np.integer,)):
                row.append(int(v))
            elif isinstance(v, (np.floating, float)):
                row.append(float(v))
            else:
                row.append(v)
        out.append(tuple(row))
    return _null_safe_key(out)


def test_filter_parity(env):
    s, t, _ = env
    got = rows_of(s.sql("SELECT id FROM t WHERE v > 250 AND k < 10"))
    exp = pd_rows(t[(t.v > 250) & (t.k < 10)][["id"]])
    assert got == exp


def test_groupby_parity(env):
    s, t, _ = env
    got = rows_of(s.sql(
        "SELECT k, COUNT(*), COUNT(v), SUM(v), MIN(v), MAX(v) FROM t GROUP BY k"
    ))
    g = t.groupby("k", dropna=False)
    exp = []
    for k, grp in g:
        k_out = None if pd.isna(k) else int(k)
        sv = grp.v.dropna()
        exp.append((
            k_out, len(grp), int(sv.count()),
            int(sv.sum()) if len(sv) else None,
            int(sv.min()) if len(sv) else None,
            int(sv.max()) if len(sv) else None,
        ))
    assert got == _null_safe_key(exp)


def test_avg_float_parity(env):
    s, t, _ = env
    got = s.sql("SELECT AVG(f) FROM t WHERE f IS NOT NULL").to_pylist()[0][0]
    exp = t.f.mean()
    assert got == pytest.approx(exp, rel=1e-12)


def test_inner_join_parity(env):
    s, t, d = env
    got = rows_of(s.sql(
        "SELECT t.id, d.label FROM t JOIN d ON t.k = d.k WHERE t.v > 0"
    ))
    merged = t[t.v > 0].merge(d, on="k")
    exp = pd_rows(merged[["id", "label"]])
    assert got == exp


def test_left_join_parity(env):
    s, t, d = env
    got = rows_of(s.sql(
        "SELECT t.id, d.label FROM t LEFT JOIN d ON t.k = d.k"
    ))
    merged = t.merge(d, on="k", how="left")
    exp = pd_rows(merged[["id", "label"]])
    assert got == exp


def test_string_group_parity(env):
    s, t, _ = env
    got = rows_of(s.sql("SELECT s, COUNT(*) FROM t GROUP BY s"))
    exp = _null_safe_key([
        (None if pd.isna(k) else k, int(c))
        for k, c in t.groupby("s", dropna=False).size().items()
    ])
    assert got == exp


def test_order_by_multi_key_parity(env):
    s, t, _ = env
    got = s.sql(
        "SELECT id FROM t WHERE k IS NOT NULL AND v IS NOT NULL "
        "ORDER BY k ASC, v DESC, id ASC LIMIT 50"
    ).to_pylist()
    tt = t.dropna(subset=["k", "v"]).sort_values(
        ["k", "v", "id"], ascending=[True, False, True]
    ).head(50)
    exp = [(int(i),) for i in tt.id]
    assert got == exp


def test_distinct_parity(env):
    s, t, _ = env
    got = rows_of(s.sql("SELECT DISTINCT k FROM t"))
    exp = _null_safe_key([
        (None if pd.isna(k) else int(k),) for k in t.k.unique()
    ])
    assert got == exp


def test_window_row_number_parity(env):
    s, t, _ = env
    got = s.sql(
        "SELECT id, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v ASC, id ASC) "
        "FROM t WHERE k IS NOT NULL AND v IS NOT NULL ORDER BY id"
    ).to_pylist()
    tt = t.dropna(subset=["k", "v"]).copy()
    tt["rn"] = tt.sort_values(["v", "id"]).groupby("k").cumcount() + 1
    exp = [(int(r.id), int(r.rn)) for r in tt.sort_values("id").itertuples()]
    assert got == exp
