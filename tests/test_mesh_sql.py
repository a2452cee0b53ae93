"""SQL-level SPMD tests: full queries through Session(mesh=...) on the
virtual 8-device mesh, bit-identical to the single-device engine.

This certifies the distributed compiled pipelines (parallel/
mesh_pipeline.py): the SQL-reachable shard_map + lax.all_to_all path the
reference's distributed executor only simulates
(crates/query-distributed/src/executor.rs:242-251, worker.rs:132-137).
"""

import numpy as np
import pytest

import jax

from query_engine_tpu.engine.session import Session
from query_engine_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces an 8-device CPU mesh"
    return make_mesh(devs[:8])


RNG = np.random.default_rng(7)
N_ORDERS = 4000
ORDERS = {
    "o_id": list(range(N_ORDERS)),
    "cust": RNG.integers(0, 60, N_ORDERS).tolist(),
    "amount": RNG.integers(1, 1000, N_ORDERS).tolist(),
    "tag": RNG.choice(["red", "green", "blue", "cyan"], N_ORDERS).tolist(),
    "score": RNG.normal(50, 10, N_ORDERS).round(3).tolist(),
}
# sprinkle NULLs
for i in range(0, N_ORDERS, 97):
    ORDERS["cust"][i] = None
for i in range(0, N_ORDERS, 131):
    ORDERS["amount"][i] = None
CUSTOMERS = {
    "c_id": list(range(60)),
    "region": RNG.integers(0, 6, 60).tolist(),
    "name": [f"cust_{i:03d}" for i in range(60)],
}


def make_sessions(mesh):
    out = []
    for m in (None, mesh):
        s = Session(mesh=m)
        s.register_table("orders", ORDERS)
        s.register_table("customers", CUSTOMERS)
        out.append(s)
    return out


def check(mesh, sql, ordered=True, mesh_used=True, float_tol=None):
    """Run on both engines; compare bit-exactly (as sets when unordered).
    float_tol: relative tolerance for float cells — partial/final float
    aggregation legitimately reassociates the sum order."""
    single, dist = make_sessions(mesh)
    a = single.sql(sql).to_pylist()
    b = dist.sql(sql).to_pylist()
    if float_tol is not None:
        def close(x, y):
            if isinstance(x, float) and isinstance(y, float):
                return x == pytest.approx(y, rel=float_tol)
            return x == y

        assert len(a) == len(b), f"row count mismatch for {sql}"
        for ra, rb in zip(a, b):
            assert len(ra) == len(rb) and all(
                close(x, y) for x, y in zip(ra, rb)
            ), f"approx mismatch for {sql}: {ra} vs {rb}"
    elif ordered:
        assert a == b, f"ordered mismatch for {sql}\n{a[:5]}\n{b[:5]}"
    else:
        assert sorted(map(repr, a)) == sorted(map(repr, b)), (
            f"set mismatch for {sql}"
        )
    if mesh_used:
        st = dist.mesh_pipeline.stats
        assert st["compiles"] + st["hits"] >= 1, (
            f"mesh path not used for {sql}: {st}"
        )
    return b


def test_filter_join_group_sort(mesh):
    # the VERDICT round-2 'done' criterion query shape
    single, dist = make_sessions(mesh)
    sql = (
        "SELECT c.region, SUM(o.amount) AS total, COUNT(*) AS cnt "
        "FROM orders o JOIN customers c ON o.cust = c.c_id "
        "WHERE o.amount > 100 GROUP BY c.region ORDER BY total DESC"
    )
    assert single.sql(sql).to_pylist() == dist.sql(sql).to_pylist()
    st = dist.mesh_pipeline.stats
    # integer SUM/COUNT ride the partial->all_to_all->final decomposition
    # (exchange moves per-shard GROUPS, not rows) and stay bit-exact
    assert st.get("agg_partial_final", 0) >= 1, st


def test_filter_sort_limit(mesh):
    check(
        mesh,
        "SELECT o_id, amount FROM orders WHERE amount > 900 "
        "ORDER BY amount DESC, o_id LIMIT 17",
    )
    check(
        mesh,
        "SELECT o_id FROM orders WHERE amount BETWEEN 10 AND 40 "
        "ORDER BY o_id LIMIT 10 OFFSET 5",
    )


def test_left_join_null_keys(mesh):
    # NULL cust rows survive a LEFT JOIN with NULL right-side columns
    check(
        mesh,
        "SELECT o.o_id, c.name FROM orders o "
        "LEFT JOIN customers c ON o.cust = c.c_id "
        "WHERE o.amount < 50 ORDER BY o.o_id",
    )


def test_right_and_full_join(mesh):
    check(
        mesh,
        "SELECT c.c_id, o.o_id FROM orders o "
        "RIGHT JOIN customers c ON o.cust = c.c_id "
        "WHERE c.region = 2 ORDER BY c.c_id, o.o_id",
    )
    check(
        mesh,
        "SELECT c.c_id, o.o_id FROM orders o "
        "FULL JOIN customers c ON o.cust = c.c_id "
        "ORDER BY c.c_id NULLS FIRST, o.o_id LIMIT 50",
    )


def test_string_group_keys(mesh):
    check(
        mesh,
        "SELECT tag, COUNT(*) AS n, AVG(score) AS avg_s FROM orders "
        "GROUP BY tag ORDER BY tag",
        float_tol=1e-12,  # partial/final f64 sums reassociate
    )


def test_multi_key_group_and_sort(mesh):
    check(
        mesh,
        "SELECT cust, tag, SUM(amount) AS s FROM orders "
        "WHERE amount IS NOT NULL GROUP BY cust, tag "
        "ORDER BY cust NULLS LAST, tag",
    )


def test_global_aggregates(mesh):
    check(
        mesh,
        "SELECT COUNT(*), COUNT(amount), SUM(amount), MIN(amount), "
        "MAX(amount), AVG(amount) FROM orders",
    )
    check(mesh, "SELECT MIN(tag), MAX(tag) FROM orders WHERE amount > 500")


def test_having_and_expressions(mesh):
    check(
        mesh,
        "SELECT cust, SUM(amount) AS s FROM orders GROUP BY cust "
        "HAVING SUM(amount) > 20000 ORDER BY s DESC",
    )
    check(
        mesh,
        "SELECT o_id, amount * 2 + 1 AS a2 FROM orders "
        "WHERE amount % 7 = 3 AND tag = 'red' ORDER BY o_id",
    )


def test_distinct(mesh):
    check(mesh, "SELECT DISTINCT cust FROM orders ORDER BY cust NULLS LAST")
    check(mesh, "SELECT DISTINCT tag, cust % 5 FROM orders", ordered=False)


def test_count_distinct_grouped(mesh):
    # DISTINCT aggregates ride the row-exchange path (groups co-located)
    check(
        mesh,
        "SELECT tag, COUNT(DISTINCT cust) AS u FROM orders "
        "GROUP BY tag ORDER BY tag",
    )


def test_scalar_subquery_filter(mesh):
    check(
        mesh,
        "SELECT o_id, amount FROM orders "
        "WHERE amount > (SELECT AVG(amount) + 400 FROM orders) "
        "ORDER BY o_id",
    )


def test_join_string_keys(mesh):
    single, dist = make_sessions(mesh)
    lookup = {
        "tag": ["red", "green", "blue", "cyan", "unknown"],
        "prio": [3, 1, 2, 0, 9],
    }
    for s in (single, dist):
        s.register_table("tags", lookup)
    sql = (
        "SELECT t.prio, COUNT(*) AS n FROM orders o "
        "JOIN tags t ON o.tag = t.tag GROUP BY t.prio ORDER BY t.prio"
    )
    assert single.sql(sql).to_pylist() == dist.sql(sql).to_pylist()


def test_skewed_keys_overflow_retry(mesh):
    """Every row shares one join key: the bounded exchange must overflow
    and the driver grow-and-retry to the correct result."""
    single, dist = make_sessions(mesh)
    skew = {"k": [1] * 3000, "v": list(range(3000))}
    dim = {"k": [1, 2], "w": [10, 20]}
    for s in (single, dist):
        s.register_table("skew", skew)
        s.register_table("dim", dim)
    sql = (
        "SELECT SUM(s.v + d.w) AS t FROM skew s JOIN dim d ON s.k = d.k"
    )
    assert single.sql(sql).to_pylist() == dist.sql(sql).to_pylist()
    assert dist.mesh_pipeline.stats["overflow_retries"] >= 1


def test_unsupported_shapes_fall_back_correctly(mesh):
    # global LAG has no mesh lowering (needs neighbor-row transport):
    # subtree demotes to an eager leaf (or the query falls back entirely)
    # but results must match
    check(
        mesh,
        "SELECT o_id, LAG(amount, 1) OVER (ORDER BY o_id) AS prev "
        "FROM orders WHERE amount > 990 ORDER BY o_id LIMIT 5",
        mesh_used=False,
    )
    # inner limits fall back too
    check(
        mesh,
        "SELECT o_id FROM (SELECT o_id FROM orders ORDER BY amount DESC "
        "LIMIT 100) sub WHERE o_id % 2 = 0 ORDER BY o_id",
        mesh_used=False,
    )


def test_empty_result(mesh):
    check(mesh, "SELECT o_id FROM orders WHERE amount > 100000 ORDER BY o_id")


def test_dml_invalidates_mesh_shards(mesh):
    single, dist = make_sessions(mesh)
    sql = "SELECT cust, SUM(amount) AS s FROM orders GROUP BY cust ORDER BY cust NULLS LAST"
    assert single.sql(sql).to_pylist() == dist.sql(sql).to_pylist()
    for s in (single, dist):
        s.sql("INSERT INTO orders (o_id, cust, amount, tag, score) "
              "VALUES (99999, 3, 500, 'red', 1.0)")
        s.sql("DELETE FROM orders WHERE amount < 20")
    assert single.sql(sql).to_pylist() == dist.sql(sql).to_pylist()


def test_program_reuse_across_calls(mesh):
    single, dist = make_sessions(mesh)
    sql = ("SELECT cust, COUNT(*) FROM orders WHERE amount > 500 "
           "GROUP BY cust ORDER BY cust NULLS LAST")
    a = dist.sql(sql)
    c0 = dist.mesh_pipeline.stats["compiles"]
    b = dist.sql(sql)
    assert dist.mesh_pipeline.stats["compiles"] == c0, "program not reused"
    assert dist.mesh_pipeline.stats["hits"] >= 1
    assert a.to_pylist() == b.to_pylist() == single.sql(sql).to_pylist()


def test_env_mesh_enable(monkeypatch):
    """QE_MESH_DEVICES=8 turns a plain Session into a mesh session — the
    path every entry point (REPL/CLI/pgwire/Flight) inherits."""
    monkeypatch.setenv("QE_MESH_DEVICES", "8")
    s = Session()
    assert s.mesh_pipeline is not None and s.mesh_pipeline.n == 8
    s.register_table("t", {"k": [1, 2, 1, 2], "v": [10, 20, 30, 40]})
    r = s.sql("SELECT k, SUM(v) AS s FROM t GROUP BY k ORDER BY k")
    assert r.to_pylist() == [(1, 40), (2, 60)]


@pytest.mark.slow
def test_partitioned_windows_on_mesh(mesh):
    """Window functions with a shared PARTITION BY distribute: one
    exchange co-locates partitions, the single-chip window kernels run
    per shard. Unique ORDER BY keys keep results deterministic."""
    check(
        mesh,
        "SELECT o_id, "
        "ROW_NUMBER() OVER (PARTITION BY cust ORDER BY amount, o_id) AS rn, "
        "SUM(amount) OVER (PARTITION BY cust ORDER BY amount, o_id) AS run "
        "FROM orders WHERE amount > 800 ORDER BY o_id",
    )
    # mixed partition keys fall back (still correct)
    check(
        mesh,
        "SELECT o_id, "
        "RANK() OVER (PARTITION BY cust ORDER BY amount, o_id) AS r1, "
        "RANK() OVER (PARTITION BY tag ORDER BY amount, o_id) AS r2 "
        "FROM orders WHERE amount > 950 ORDER BY o_id",
        mesh_used=False,
    )


def test_set_ops_on_mesh(mesh):
    """UNION [ALL] concatenates per shard; INTERSECT/EXCEPT co-locate
    equal rows by full-row hash then resolve locally."""
    check(
        mesh,
        "SELECT cust FROM orders WHERE amount > 900 "
        "UNION ALL SELECT c_id FROM customers WHERE region = 1",
        ordered=False,
    )
    check(
        mesh,
        "SELECT cust FROM orders WHERE amount > 500 "
        "UNION SELECT c_id FROM customers",
        ordered=False,
    )
    check(
        mesh,
        "SELECT cust FROM orders WHERE amount > 200 "
        "INTERSECT SELECT c_id FROM customers WHERE region < 3",
        ordered=False,
    )
    check(
        mesh,
        "SELECT c_id FROM customers "
        "EXCEPT SELECT cust FROM orders WHERE amount > 700",
        ordered=False,
    )


def test_unbounded_dup_join_count_emit_sync(mesh):
    """A join where NEITHER side has a bounded key multiplicity (both sides
    repeat every key ~20-30x) runs on the mesh through the count->emit
    sync: one cached count shard_map program returns the max per-shard
    output size (lax.pmax), then the emit program builds with that static
    capacity. Results stay bit-identical to the single-device engine."""
    rng = np.random.default_rng(21)
    ta = {
        "k": rng.integers(0, 20, 600).tolist(),
        "va": rng.integers(0, 100, 600).tolist(),
    }
    tb = {
        "k": rng.integers(0, 20, 400).tolist(),
        "vb": rng.integers(0, 100, 400).tolist(),
    }
    # sprinkle NULL keys (never match)
    for i in range(0, 600, 83):
        ta["k"][i] = None
    sqls = [
        ("SELECT a.k, a.va, b.vb FROM ta a JOIN tb b ON a.k = b.k", False),
        ("SELECT a.k, COUNT(*) AS c, SUM(a.va + b.vb) AS s "
         "FROM ta a JOIN tb b ON a.k = b.k GROUP BY a.k ORDER BY a.k",
         True),
        ("SELECT a.k, a.va, b.vb FROM ta a LEFT JOIN tb b "
         "ON a.k = b.k WHERE a.va > 30", False),
    ]
    for sql, ordered in sqls:
        single, dist = Session(), Session(mesh=mesh)
        for s in (single, dist):
            s.register_table("ta", ta)
            s.register_table("tb", tb)
        a = single.sql(sql).to_pylist()
        b = dist.sql(sql).to_pylist()
        if ordered:
            assert a == b, f"ordered mismatch for {sql}"
        else:
            assert sorted(map(repr, a)) == sorted(map(repr, b)), (
                f"set mismatch for {sql}"
            )
        st = dist.mesh_pipeline.stats
        assert st.get("joins_counted", 0) >= 1, (
            f"mesh count->emit not used for {sql}: {st}"
        )


def test_global_rank_windows_on_mesh(mesh):
    """Rank-family windows with NO PARTITION BY lower to the mesh: range
    exchange on the first ORDER BY key (ties co-locate), local ranks,
    cross-shard offset patches from all_gather'd shard totals."""
    sqls = [
        # ROW_NUMBER with a tie-breaking second key
        "SELECT o_id, ROW_NUMBER() OVER (ORDER BY amount DESC, o_id) AS rn "
        "FROM orders WHERE amount > 700 ORDER BY rn LIMIT 40",
        # RANK/DENSE_RANK with heavy ties on the primary key (cust has
        # ~65 dups per value -> ties MUST co-locate for correctness)
        "SELECT o_id, RANK() OVER (ORDER BY cust) AS r, "
        "DENSE_RANK() OVER (ORDER BY cust) AS d "
        "FROM orders WHERE amount IS NOT NULL ORDER BY o_id LIMIT 60",
        # DESC order + NULL keys in the order column
        "SELECT o_id, DENSE_RANK() OVER (ORDER BY cust DESC) AS d "
        "FROM orders ORDER BY o_id LIMIT 50",
        # three specs sharing the first key
        "SELECT o_id, ROW_NUMBER() OVER (ORDER BY amount, o_id) AS rn, "
        "RANK() OVER (ORDER BY amount) AS r, "
        "DENSE_RANK() OVER (ORDER BY amount) AS d "
        "FROM orders WHERE cust IS NOT NULL ORDER BY o_id LIMIT 60",
    ]
    for sql in sqls:
        check(mesh, sql)
    # aggregate ON TOP of a global window stays on the mesh
    check(
        mesh,
        "SELECT COUNT(*) AS c, MAX(r) AS mx FROM ("
        "SELECT RANK() OVER (ORDER BY amount) AS r FROM orders "
        "WHERE amount IS NOT NULL) sub",
    )


@pytest.mark.slow
def test_global_aggregate_windows_on_mesh(mesh):
    """Prefix-frame (running) and whole-table window aggregates with no
    PARTITION BY lower to the mesh: local results combine with an
    all_gather'd carry from prior shards (prefix) or all shards
    (whole-table)."""
    # running totals over a tied key: RANGE..CURRENT includes peers, so
    # results are tie-order independent and bit-exact
    check(
        mesh,
        "SELECT o_id, SUM(amount) OVER (ORDER BY cust) AS rs, "
        "COUNT(amount) OVER (ORDER BY cust) AS rc, "
        "MIN(amount) OVER (ORDER BY cust) AS rmin, "
        "MAX(amount) OVER (ORDER BY cust) AS rmax "
        "FROM orders ORDER BY o_id LIMIT 80",
    )
    # whole-table aggregates (no ORDER BY): every row gets the global value
    check(
        mesh,
        "SELECT o_id, SUM(amount) OVER () AS s, COUNT(*) OVER () AS c, "
        "MIN(amount) OVER () AS lo, MAX(amount) OVER () AS hi "
        "FROM orders WHERE cust = 7 ORDER BY o_id",
    )
    # AVG over the whole table (float: partial sums reassociate)
    check(
        mesh,
        "SELECT o_id, AVG(score) OVER () AS a FROM orders "
        "WHERE cust = 3 ORDER BY o_id",
        float_tol=1e-12,
    )
    # mixed rank + running aggregate sharing the ORDER BY key
    check(
        mesh,
        "SELECT o_id, RANK() OVER (ORDER BY amount) AS r, "
        "SUM(amount) OVER (ORDER BY amount) AS rs "
        "FROM orders WHERE amount IS NOT NULL AND cust < 10 "
        "ORDER BY o_id",
    )
    # NULL amounts inside the running SUM (skipped, validity carries)
    check(
        mesh,
        "SELECT o_id, SUM(amount) OVER (ORDER BY o_id) AS rs "
        "FROM orders WHERE cust = 11 OR amount IS NULL "
        "ORDER BY o_id LIMIT 60",
    )


@pytest.mark.slow
def test_global_lag_lead_on_mesh(mesh):
    """LAG/LEAD with no PARTITION BY lower to the mesh via boundary
    halos: each shard all_gathers its edge rows, builds the k rows
    globally adjacent to its range, and patches its first/last k rows.
    Admitted only over order-pristine inputs, so within-tie order (and
    therefore the result) is bit-identical to the single-device engine."""
    sqls = [
        "SELECT o_id, LAG(amount) OVER (ORDER BY o_id) AS lg, "
        "LEAD(amount) OVER (ORDER BY o_id) AS ld "
        "FROM orders ORDER BY o_id LIMIT 60",
        # offset > 1 plus a default value; unique composite order
        "SELECT o_id, LAG(amount, 3) OVER (ORDER BY cust, o_id) AS lg3, "
        "LEAD(amount, 2, -1) OVER (ORDER BY cust, o_id) AS ld2 "
        "FROM orders WHERE amount IS NOT NULL ORDER BY o_id LIMIT 80",
        # heavy ties on the single order key: within-tie order must match
        # the single-device stable sort exactly (order-pristine machinery)
        "SELECT o_id, LAG(amount) OVER (ORDER BY cust) AS lg "
        "FROM orders ORDER BY o_id LIMIT 80",
        # DESC order with NULLs in both the key and the argument
        "SELECT o_id, LAG(cust) OVER (ORDER BY amount DESC, o_id) AS lg "
        "FROM orders ORDER BY o_id LIMIT 60",
        # dictionary-encoded (string) argument rides as codes
        "SELECT o_id, LAG(tag) OVER (ORDER BY o_id) AS lt "
        "FROM orders WHERE cust < 20 ORDER BY o_id LIMIT 50",
    ]
    for sql in sqls:
        check(mesh, sql)


@pytest.mark.slow
def test_global_rows_frames_on_mesh(mesh):
    """Bounded ROWS frames with no PARTITION BY: edge rows combine the
    local clamped aggregate with halo suffix/prefix aggregates; unbounded
    sides add whole-shard carries."""
    sqls = [
        "SELECT o_id, SUM(amount) OVER (ORDER BY o_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s3 "
        "FROM orders ORDER BY o_id LIMIT 80",
        # both-bounded window spanning shard boundaries on both sides
        "SELECT o_id, MIN(amount) OVER (ORDER BY o_id "
        "ROWS BETWEEN 2 PRECEDING AND 4 FOLLOWING) AS lo, "
        "MAX(amount) OVER (ORDER BY o_id "
        "ROWS BETWEEN 2 PRECEDING AND 4 FOLLOWING) AS hi, "
        "COUNT(amount) OVER (ORDER BY o_id "
        "ROWS BETWEEN 2 PRECEDING AND 4 FOLLOWING) AS c "
        "FROM orders ORDER BY o_id LIMIT 80",
        # rows-prefix (UNBOUNDED PRECEDING: whole-prior-shard carry) with
        # a bounded FOLLOWING edge
        "SELECT o_id, SUM(amount) OVER (ORDER BY o_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 FOLLOWING) AS s "
        "FROM orders WHERE cust < 30 ORDER BY o_id LIMIT 80",
        # unbounded FOLLOWING (whole-following-shard carry)
        "SELECT o_id, MAX(amount) OVER (ORDER BY o_id "
        "ROWS BETWEEN 1 PRECEDING AND UNBOUNDED FOLLOWING) AS m "
        "FROM orders WHERE cust < 30 ORDER BY o_id LIMIT 80",
        # ties on the order key + NULL arguments inside the frame
        "SELECT o_id, SUM(amount) OVER (ORDER BY cust "
        "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS s "
        "FROM orders ORDER BY o_id LIMIT 80",
    ]
    for sql in sqls:
        check(mesh, sql)


@pytest.mark.slow
def test_global_ntile_first_last_on_mesh(mesh):
    """NTILE recomputes from the global rank + total count; FIRST_VALUE /
    unbounded-end LAST_VALUE broadcast the global first/last row's value;
    default-frame LAST_VALUE is the last tie peer (fully local)."""
    sqls = [
        # NTILE over a tied key: tile assignment is order-dependent
        "SELECT o_id, NTILE(7) OVER (ORDER BY cust) AS t "
        "FROM orders ORDER BY o_id LIMIT 80",
        # uneven tiles (total % tiles != 0) with a unique composite key
        "SELECT o_id, NTILE(13) OVER (ORDER BY amount, o_id) AS t "
        "FROM orders WHERE amount IS NOT NULL ORDER BY o_id LIMIT 80",
        "SELECT o_id, FIRST_VALUE(amount) OVER (ORDER BY cust, o_id) AS f "
        "FROM orders ORDER BY o_id LIMIT 60",
        # last tie peer (default frame) and global last (unbounded end)
        "SELECT o_id, LAST_VALUE(amount) OVER (ORDER BY cust) AS lp, "
        "LAST_VALUE(amount) OVER (ORDER BY cust ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND UNBOUNDED FOLLOWING) AS lg "
        "FROM orders ORDER BY o_id LIMIT 60",
    ]
    for sql in sqls:
        check(mesh, sql)


def test_order_sensitive_window_fallback(mesh):
    """Order-sensitive global windows over a REORDERING input (join below)
    are not order-pristine — they must fall back and still be correct."""
    check(
        mesh,
        "SELECT s.o_id, LAG(s.amount) OVER (ORDER BY s.o_id) AS lg FROM ("
        "SELECT o.o_id AS o_id, o.amount AS amount FROM orders o "
        "JOIN customers c ON o.cust = c.c_id) s ORDER BY s.o_id LIMIT 60",
        mesh_used=False,
    )
