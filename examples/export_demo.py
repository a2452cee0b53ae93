"""Query + export to parquet/csv/json (reference CLI export path)."""
import os
import tempfile

from _common import demo_session

s = demo_session()
result = s.sql("SELECT name, salary FROM employees WHERE salary > 80000")
out = os.path.join(tempfile.gettempdir(), "qe_export.parquet")
import pyarrow as pa
import pyarrow.parquet as pq

pq.write_table(pa.Table.from_batches([result.to_arrow()]), out)
print(f"wrote {result.num_rows} rows to {out}")
print(pq.read_table(out).to_pydict())
