"""Statistical SQL tour: variance family, ordered-set aggregates
(MEDIAN / PERCENTILE / MODE), two-argument statistics (COVAR / CORR /
REGR_*), boolean aggregates, STRING_AGG, the FILTER clause, and the
distribution-analysis window functions (PERCENT_RANK / CUME_DIST /
NTH_VALUE).

The reference executor supports COUNT/SUM/AVG/MIN/MAX only
(crates/query-executor/src/operators.rs:745-848) — everything below is
engine superset surface. The decomposable families (variance, covar, bool)
lower into SUM/COUNT + formula projections, so they run identically on one
chip, on a device mesh, and through 100M-row chunked execution.
"""
import numpy as np

from _common import show

from query_engine_tpu.engine.session import Session

rng = np.random.default_rng(7)
n = 10_000
hours = rng.uniform(20, 60, n).round(1)
# salary correlates with hours + dept offset + noise
dept = rng.integers(1, 5, n)
salary = (900 * hours + 4000 * dept + rng.normal(0, 8000, n)).round(2)
remote = rng.random(n) < 0.4

s = Session()
s.register_table("work", {
    "dept": [int(x) for x in dept],
    "hours": [float(x) for x in hours],
    "salary": [float(x) for x in salary],
    "remote": [bool(x) for x in remote],
    "name": [f"emp{i:05d}" for i in range(n)],
})

show("Variance family (lowered to SUM/SUMSQ/COUNT -> distributes for free)",
     s.sql("SELECT dept, STDDEV(salary) AS sd, VAR_POP(hours) AS vh "
           "FROM work GROUP BY dept ORDER BY dept"))

show("Ordered-set aggregates: MEDIAN / PERCENTILE_CONT / PERCENTILE_DISC / "
     "MODE",
     s.sql("SELECT dept, MEDIAN(salary) AS med, "
           "PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY salary) AS p90, "
           "PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY hours) AS h50, "
           "MODE() WITHIN GROUP (ORDER BY dept) AS m "
           "FROM work GROUP BY dept ORDER BY dept"))

show("Two-argument statistics: does salary track hours?",
     s.sql("SELECT dept, CORR(salary, hours) AS r, "
           "REGR_SLOPE(salary, hours) AS slope, "
           "REGR_INTERCEPT(salary, hours) AS icept, "
           "REGR_R2(salary, hours) AS r2, REGR_COUNT(salary, hours) AS n "
           "FROM work GROUP BY dept ORDER BY dept"))

show("FILTER clause: one pass, many conditional aggregates",
     s.sql("SELECT dept, COUNT(*) AS all_rows, "
           "COUNT(*) FILTER (WHERE remote) AS remote_rows, "
           "AVG(salary) FILTER (WHERE remote) AS remote_avg, "
           "AVG(salary) FILTER (WHERE NOT remote) AS office_avg "
           "FROM work GROUP BY dept ORDER BY dept"))

show("Boolean aggregates (MIN/MAX over a 0/1 mask underneath)",
     s.sql("SELECT dept, BOOL_AND(hours > 21) AS all_over21, "
           "BOOL_OR(salary > 80000) AS any_high "
           "FROM work GROUP BY dept ORDER BY dept"))

show("STRING_AGG over the top earners",
     s.sql("WITH top AS (SELECT dept, name, salary FROM work "
           "ORDER BY salary DESC LIMIT 8) "
           "SELECT dept, STRING_AGG(name, ', ') AS who FROM top "
           "GROUP BY dept ORDER BY dept"))

show("Where does each row sit in its department's pay distribution?",
     s.sql("SELECT name, dept, salary, "
           "ROUND(PERCENT_RANK() OVER "
           "  (PARTITION BY dept ORDER BY salary), 3) AS pct_rank, "
           "ROUND(CUME_DIST() OVER "
           "  (PARTITION BY dept ORDER BY salary), 3) AS cume, "
           "NTH_VALUE(name, 1) OVER (PARTITION BY dept ORDER BY salary "
           "  DESC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
           "  FOLLOWING) AS dept_top "
           "FROM work ORDER BY salary DESC LIMIT 10"))

show("Math/string scalar batch",
     s.sql("SELECT LEFT(name, 3) AS prefix, "
           "ROUND(EXP(LN(salary)) - salary, 6) AS ln_exp_roundtrip, "
           "SIGN(salary - 60000) AS above_60k, "
           "GREATEST(hours, 40.0) AS padded_hours "
           "FROM work LIMIT 5"))
