"""User-defined scalar functions (reference examples/udf_query.rs)."""
import jax.numpy as jnp

from _common import demo_session, show
from query_engine_tpu.core.types import DataType
from query_engine_tpu.core.udf import ScalarUdf, UdfSignature

s = demo_session()


def double_it(args):
    (data, valid), = args
    return data * 2, valid


s.udfs.register(ScalarUdf(
    "double_it", UdfSignature((DataType.int64(),), DataType.int64()), double_it,
))
show("UDF double_it(salary)", s.sql(
    "SELECT name, double_it(salary) AS doubled FROM employees ORDER BY id LIMIT 3"))
