"""Device-resident streaming append buffer.

The reference's streaming loop re-materializes the window buffer on every
emission (stream.rs:108-243 buffers host batches; round-2's engine path
additionally re-uploaded the concatenated buffer per window). This table
keeps the stream's rows IN device HBM: each incoming batch is written
once into capacity-doubling device planes (lax.dynamic_update_slice at
the append offset), string columns delta-merge their dictionaries
(sorted union + device recode of the resident codes — compute on device,
no host round-trip), and window emission snapshots the planes zero-copy.
Per-window host->device traffic is O(incoming batch), not O(buffer).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from query_engine_tpu.columnar.batch import (
    Column, ColumnBatch, padded_capacity,
)
from query_engine_tpu.core.schema import Schema

_write_jits = {}
_remap_jits = {}


def _write(plane, vplane, data, valid, offset):
    key = (plane.shape[0], data.shape[0], str(plane.dtype))
    fn = _write_jits.get(key)
    if fn is None:

        @jax.jit
        def fn(plane, vplane, data, valid, offset):
            return (
                jax.lax.dynamic_update_slice(plane, data, (offset,)),
                jax.lax.dynamic_update_slice(vplane, valid, (offset,)),
            )

        _write_jits[key] = fn
    return fn(plane, vplane, data, valid, offset)


def _remap_codes(plane, remap):
    key = (plane.shape[0], remap.shape[0])
    fn = _remap_jits.get(key)
    if fn is None:

        @jax.jit
        def fn(plane, remap):
            return remap[jnp.clip(plane, 0, remap.shape[0] - 1)]

        _remap_jits[key] = fn
    return fn(plane, remap)


class DeviceStreamTable:
    """Append-only (with clear/retain) device table for one stream."""

    def __init__(self, schema: Schema, initial_capacity: int = 1024):
        self.schema = schema
        self.capacity = padded_capacity(initial_capacity)
        self.num_rows = 0
        self.datas: List[jnp.ndarray] = []
        self.valids: List[jnp.ndarray] = []
        self.dicts: List[Optional[object]] = []
        for f in schema:
            self.datas.append(
                jnp.zeros(self.capacity, dtype=f.data_type.device_dtype)
            )
            self.valids.append(jnp.zeros(self.capacity, dtype=bool))
            self.dicts.append(None)  # adopt the first batch's dictionary
        # instrumentation: rows/bytes that crossed host->device, appends
        self.upload_rows = 0
        self.upload_bytes = 0
        self.appends = 0
        self.dict_merges = 0

    # ---- growth ---------------------------------------------------------
    def _ensure(self, need_rows: int) -> None:
        if need_rows <= self.capacity:
            return
        new_cap = padded_capacity(need_rows)
        grown_d, grown_v = [], []
        for d, v in zip(self.datas, self.valids):
            nd = jnp.zeros(new_cap, dtype=d.dtype).at[: self.capacity].set(d)
            nv = jnp.zeros(new_cap, dtype=bool).at[: self.capacity].set(v)
            grown_d.append(nd)
            grown_v.append(nv)
        self.datas, self.valids = grown_d, grown_v
        self.capacity = new_cap

    # ---- append ---------------------------------------------------------
    def append(self, batch: ColumnBatch) -> None:
        if list(batch.schema.names()) != list(self.schema.names()):
            raise ValueError(
                f"stream batch schema {batch.schema.names()} != "
                f"{self.schema.names()}"
            )
        k = batch.num_rows
        if k == 0:
            return
        bcap = batch.capacity
        self._ensure(self.num_rows + bcap)
        off = self.num_rows
        for i, c in enumerate(batch.columns):
            data = c.data
            if c.dictionary is not None:
                data, inc_remap = self._merge_dict(i, c)
                if inc_remap is not None:
                    data = _remap_codes(jnp.asarray(data), inc_remap)
            d = jnp.asarray(data)
            v = jnp.asarray(c.validity)
            self.upload_bytes += d.nbytes + v.nbytes
            self.datas[i], self.valids[i] = _write(
                self.datas[i], self.valids[i], d, v, np.int64(off)
            )
        self.num_rows += k
        self.upload_rows += k
        self.appends += 1

    def _merge_dict(self, i: int, col: Column):
        """Delta-merge the column's dictionary into the table's. Returns
        (incoming code plane, remap for incoming codes or None). Resident
        codes are recoded ON DEVICE when the union reorders them."""
        cur = self.dicts[i]
        if cur is None or len(cur) == 0:
            self.dicts[i] = col.dictionary
            return col.data, None
        if cur is col.dictionary:
            return col.data, None
        merged, self_remap, other_remap = cur.merge(col.dictionary)
        self.dicts[i] = merged
        if not np.array_equal(self_remap, np.arange(len(cur))):
            self.dict_merges += 1
            # recode resident plane (device compute, no host transfer)
            self.datas[i] = _remap_codes(
                self.datas[i], jnp.asarray(self_remap.astype(np.int32))
            )
        if np.array_equal(other_remap, np.arange(len(col.dictionary))):
            return col.data, None
        return col.data, jnp.asarray(other_remap.astype(np.int32))

    # ---- window lifecycle -----------------------------------------------
    def clear(self) -> None:
        """Tumbling-window reset: planes stay allocated."""
        self.num_rows = 0

    def retain_last(self, rows: int) -> None:
        """Sliding-window retention: keep the trailing `rows` rows."""
        rows = min(rows, self.num_rows)
        if rows == self.num_rows:
            return
        start = self.num_rows - rows
        for i in range(len(self.datas)):
            d = self.datas[i]
            v = self.valids[i]
            self.datas[i] = (
                jnp.zeros_like(d)
                .at[:rows]
                .set(jax.lax.dynamic_slice(d, (start,), (rows,)))
            )
            self.valids[i] = (
                jnp.zeros_like(v)
                .at[:rows]
                .set(jax.lax.dynamic_slice(v, (start,), (rows,)))
            )
        self.num_rows = rows

    def snapshot(self) -> ColumnBatch:
        """Zero-copy view of the current window (jax arrays are immutable:
        later appends never mutate a snapshot's planes)."""
        cols = [
            Column(d, v, f.data_type, dic)
            for d, v, f, dic in zip(
                self.datas, self.valids, self.schema, self.dicts
            )
        ]
        return ColumnBatch(self.schema, cols, self.num_rows)
