"""Window functions: the full tour.

Reference parity note: examples/window_query.rs prints a plan and its
executor passes window nodes through unchanged (executor.rs:76-80); here
every window function family executes on device — ranking, offsets,
value picks, and aggregate frames — and multiple specs that share a
PARTITION BY + ORDER BY prefix share ONE sort permutation inside the
compiled program.

Run: JAX_PLATFORMS=cpu python examples/window_query.py
"""
from _common import demo_session, show

s = demo_session()

# ---- ranking family --------------------------------------------------------
show("ROW_NUMBER / RANK / DENSE_RANK / NTILE per department", s.sql(
    "SELECT name, dept_id, salary, "
    "ROW_NUMBER() OVER (PARTITION BY dept_id ORDER BY salary DESC) AS rn, "
    "RANK() OVER (PARTITION BY dept_id ORDER BY salary DESC) AS rk, "
    "DENSE_RANK() OVER (PARTITION BY dept_id ORDER BY salary DESC) AS drk, "
    "NTILE(2) OVER (ORDER BY salary) AS half "
    "FROM employees ORDER BY dept_id NULLS LAST, salary DESC"))

# ---- offset family ---------------------------------------------------------
show("LAG / LEAD with defaults", s.sql(
    "SELECT name, salary, "
    "LAG(salary, 1) OVER (ORDER BY salary) AS prev_salary, "
    "LEAD(salary, 1, 0) OVER (ORDER BY salary) AS next_or_zero "
    "FROM employees ORDER BY salary"))

# ---- value picks -----------------------------------------------------------
show("FIRST_VALUE / LAST_VALUE over the whole partition", s.sql(
    "SELECT name, dept_id, salary, "
    "FIRST_VALUE(name) OVER (PARTITION BY dept_id ORDER BY salary DESC) "
    "AS top_earner, "
    "LAST_VALUE(name) OVER (PARTITION BY dept_id ORDER BY salary DESC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lowest "
    "FROM employees ORDER BY dept_id NULLS LAST, salary DESC"))

# ---- aggregate frames ------------------------------------------------------
# (the reference's WindowFunctionType has no aggregate members at all,
#  ast.rs:236-245)
show("Running totals and rolling means", s.sql(
    "SELECT name, salary, "
    "SUM(salary) OVER (ORDER BY salary) AS running_total, "
    "AVG(salary) OVER (ORDER BY salary "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_avg3, "
    "COUNT(*) OVER (PARTITION BY dept_id) AS dept_size "
    "FROM employees ORDER BY salary"))

# ---- shared sort across specs ----------------------------------------------
# RANK (dept; salary) and the running SUM (dept; salary) share a spec;
# ROW_NUMBER (dept; salary, id) extends it with a tiebreaker — all three
# ride ONE sort permutation (the prefix-sharing optimizer):
sql3 = (
    "SELECT name, "
    "RANK() OVER (PARTITION BY dept_id ORDER BY salary) AS rk, "
    "SUM(salary) OVER (PARTITION BY dept_id ORDER BY salary) AS run, "
    "ROW_NUMBER() OVER (PARTITION BY dept_id ORDER BY salary, id) AS rn "
    "FROM employees ORDER BY id"
)
st = s.executor.pipeline.stats
before = (st.get("window_specs", 0), st.get("window_sorts", 0))
show("Three specs, one sort", s.sql(sql3))
print(f"this query: {st.get('window_specs', 0) - before[0]} window specs, "
      f"{st.get('window_sorts', 0) - before[1]} sort performed")
