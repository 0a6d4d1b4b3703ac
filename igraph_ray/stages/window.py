"""Event-time windowing: gap-based sessionization and tumbling-window
aggregates — the classic event-stream operators plain Ray Data has no
built-in for (reference scope: a data-processing engine's
sessionize/window surface; semantics match the standard SQL
window-function formulation, see the LAG/SUM-OVER twin in
``__ray_entry__.oracle_sql()['sessions']``).

Ray-Data shape (scale notes):

* ``sessionize`` — ONE hash shuffle on the session key
  (``groupby(hpart).map_groups``); inside each partition everything is
  a numpy lexsort + boundary scan + ``np.add.reduceat`` — no per-row
  or per-key Python.  A key's whole history must co-locate (inherent
  to gap sessions); skew path for a single hot key is time-range
  splitting with boundary stitching, documented not needed at current
  scales.
* ``tumbling_window`` — no shuffle beyond the final grouped aggregate:
  the window id is a vectorized epoch floor computed map-side, and
  counts/sums are pre-combined per (window, group) inside each batch
  before the small ``groupby``.

All sums are over int64 columns (exact, order-insensitive) so results
hash-compare bitwise against a SQL twin; float money-like columns
should be converted to integer cents upstream (``floor(x*100 + 0.5)``,
one fixed IEEE chain).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from igraph_ray.utils import hash_int64


def _np_parts(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 500_000))))


def _ts_int64(col: pa.ChunkedArray) -> np.ndarray:
    """timestamp[us] / int64 column -> int64 numpy (epoch micros)."""
    arr = col.to_numpy(zero_copy_only=False)
    return arr.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
        arr.dtype, np.datetime64
    ) else arr.astype(np.int64)


def sessionize(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    gap_us: int,
    sum_cols: tuple[str, ...] = (),
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Per-session aggregates under gap-based sessionization.

    A new session starts at a key's first event and whenever the time
    since the key's previous event is STRICTLY greater than ``gap_us``
    microseconds.  Output one row per session: ``(key, session_id
    [1-based per key, in time order], session_start, session_end
    [int64 epoch micros], n_events, sum_<c> for each sum col)``.

    ``sum_cols`` must be integer columns (exact order-insensitive
    sums).  Timestamps may be Arrow timestamp[us] or int64.
    """
    if num_parts is None:
        num_parts = _np_parts(ds.count())
    np_parts = np.uint64(num_parts)

    def tag(batch: pa.Table) -> pa.Table:
        k = (
            batch.column(key_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cols = {
            "hpart": pa.array(
                (hash_int64(k) % np_parts).astype(np.int32)
            ),
            "k": pa.array(k),
            "t": pa.array(_ts_int64(batch.column(ts_col))),
        }
        for c in sum_cols:
            cols[c] = pa.array(
                batch.column(c)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        return pa.table(cols)

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        n = len(k)
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.int64()),
                    "session_end": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    **{
                        f"sum_{c}": pa.array([], pa.int64())
                        for c in sum_cols
                    },
                }
            )
        order = np.lexsort((t, k))
        k_s, t_s = k[order], t[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k_s[1:] != k_s[:-1]
        new_sess = new_key.copy()
        new_sess[1:] |= (t_s[1:] - t_s[:-1]) > gap_us
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], n] - 1
        # 1-based session id within each key: running session count
        # minus the count at the key's first session
        sess_no = np.cumsum(new_sess)  # 1-based global running count
        key_first = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0)
        )
        sid = sess_no - sess_no[key_first] + 1
        cols = {
            key_col: pa.array(k_s[starts]),
            "session_id": pa.array(sid[starts].astype(np.int64)),
            "session_start": pa.array(t_s[starts]),
            "session_end": pa.array(t_s[ends]),
            "n_events": pa.array(
                np.diff(np.r_[starts, n]).astype(np.int64)
            ),
        }
        for c in sum_cols:
            v = group.column(c).to_numpy(zero_copy_only=False)[order]
            cols[f"sum_{c}"] = pa.array(np.add.reduceat(v, starts))
        return pa.table(cols)

    return tagged.groupby("hpart").map_groups(merge, batch_format="pyarrow")


def running_agg(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    order_tie_col: str,
    sum_col: str,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Per-key running (cumulative) aggregates in event-time order —
    the ``SUM(...) OVER (PARTITION BY key ORDER BY ts, tie ROWS
    UNBOUNDED PRECEDING)`` window-function surface.

    Output one row per input row: ``(key, ts [int64 epoch micros],
    tie, row_number [1-based per key], run_sum)``.  ``sum_col`` must be
    int64 (exact, so the cumulative values are order-independent given
    the total (key, ts, tie) order); ``order_tie_col`` must make the
    sort key unique per key for a deterministic result.

    Same scale shape as ``sessionize``: one hash shuffle on the key,
    then a numpy lexsort + ``cumsum`` with per-key reset via segment
    subtraction — no per-row Python.
    """
    if num_parts is None:
        num_parts = _np_parts(ds.count())
    np_parts = np.uint64(num_parts)

    def tag(batch: pa.Table) -> pa.Table:
        k = (
            batch.column(key_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(k) % np_parts).astype(np.int32)
                ),
                "k": pa.array(k),
                "t": pa.array(_ts_int64(batch.column(ts_col))),
                "tie": pa.array(
                    batch.column(order_tie_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "v": pa.array(
                    batch.column(sum_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        tie = group.column("tie").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        n = len(k)
        order = np.lexsort((tie, t, k))
        k_s, t_s, tie_s, v_s = k[order], t[order], tie[order], v[order]
        new_key = np.empty(n, dtype=bool)
        if n:
            new_key[0] = True
            new_key[1:] = k_s[1:] != k_s[:-1]
        cs = np.cumsum(v_s)
        idx = np.arange(n)
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        # cumulative sum within key = global cumsum minus the cumsum
        # just before the key's first row
        base = np.where(seg_start > 0, cs[np.maximum(seg_start - 1, 0)], 0)
        run = cs - base
        rn = idx - seg_start + 1
        return pa.table(
            {
                key_col: pa.array(k_s),
                ts_col: pa.array(t_s),
                order_tie_col: pa.array(tie_s),
                "row_number": pa.array(rn.astype(np.int64)),
                "run_sum": pa.array(run.astype(np.int64)),
            }
        )

    return tagged.groupby("hpart").map_groups(merge, batch_format="pyarrow")


def tumbling_window(
    ds: ray.data.Dataset,
    ts_col: str,
    width_us: int,
    by: tuple[str, ...] = (),
    sum_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Tumbling (fixed, non-overlapping) event-time windows.

    Window id = ``floor(epoch_us / width_us) * width_us`` (the window's
    start, int64 epoch micros; floor division toward -inf so pre-epoch
    timestamps fall in the right window).  Output one row per
    (window_start, *by): ``n_events`` plus ``sum_<c>`` for each int64
    sum column.  Counts/sums are pre-combined per batch map-side, so
    the shuffle carries O(batches x windows x groups) rows, never the
    event stream.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = _ts_int64(batch.column(ts_col))
        w = (t // width_us) * width_us  # numpy // floors toward -inf
        cols = {"window_start": pa.array(w)}
        for c in by:
            cols[c] = batch.column(c)
        for c in sum_cols:
            cols[c] = pc.cast(batch.column(c), pa.int64())
        tbl = pa.table(cols)
        aggs = [("window_start", "count")] + [(c, "sum") for c in sum_cols]
        part = tbl.group_by(["window_start", *by]).aggregate(aggs)
        out = {
            "window_start": part.column("window_start"),
            **{c: part.column(c) for c in by},
            "n_events": pc.cast(
                part.column("window_start_count"), pa.int64()
            ),
            **{
                f"sum_{c}": pc.cast(part.column(f"{c}_sum"), pa.int64())
                for c in sum_cols
            },
        }
        return pa.table(out)

    grouped = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start", *by])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            *[Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols],
        )
    )
    return grouped


def hopping_window(
    ds: ray.data.Dataset,
    ts_col: str,
    width_us: int,
    hop_us: int,
    by: tuple[str, ...] = (),
    sum_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Hopping (sliding) event-time windows: every ``hop_us`` a window
    of length ``width_us`` opens; an event at time t belongs to every
    window start ``s = m*hop`` with ``s <= t < s + width``.

    Map-side each row is expanded to its (width/hop)-ish window
    replicas with ``np.repeat`` and pre-combined per (window, group)
    within the batch; the shuffle carries the combined partials only —
    same scale shape as ``tumbling_window`` with a constant replication
    factor.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = _ts_int64(batch.column(ts_col))
        m_lo = (t - width_us) // hop_us + 1
        m_hi = t // hop_us
        counts = np.maximum(m_hi - m_lo + 1, 0)
        idx = np.repeat(np.arange(len(t)), counts)
        # intra-replica offset 0..count-1 per row
        offs = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        w = (m_lo[idx] + offs) * hop_us
        cols = {"window_start": pa.array(w)}
        for c in by:
            cols[c] = batch.column(c).take(pa.array(idx.astype(np.int64)))
        for c in sum_cols:
            cols[c] = pc.cast(
                batch.column(c).take(pa.array(idx.astype(np.int64))),
                pa.int64(),
            )
        tbl = pa.table(cols)
        aggs = [("window_start", "count")] + [(c, "sum") for c in sum_cols]
        part = tbl.group_by(["window_start", *by]).aggregate(aggs)
        return pa.table(
            {
                "window_start": part.column("window_start"),
                **{c: part.column(c) for c in by},
                "n_events": pc.cast(
                    part.column("window_start_count"), pa.int64()
                ),
                **{
                    f"sum_{c}": pc.cast(part.column(f"{c}_sum"), pa.int64())
                    for c in sum_cols
                },
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start", *by])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            *[Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols],
        )
    )


def moving_agg(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    order_tie_col: str,
    val_col: str,
    window_rows: int,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Per-key sliding row-window aggregates in event-time order — the
    ``LAG/LEAD/SUM(...) OVER (PARTITION BY key ORDER BY ts, tie ROWS
    BETWEEN w-1 PRECEDING AND CURRENT ROW)`` window-function surface.

    Output one row per input row: ``(key, ts, tie, lag_<v> [prev row's
    value, null on each key's first row], lead_<v> [next row's value,
    null on the last], mov_sum [sum of the trailing ``window_rows``
    rows including current], mov_n [actual rows in that window])``.
    ``val_col`` must be int64; ``order_tie_col`` must make the per-key
    sort key unique.

    Same scale shape as ``running_agg``: one hash shuffle on the key,
    then lexsort + cumsum with per-key clamped window starts — no
    per-row Python.
    """
    if window_rows <= 0:
        raise ValueError("window_rows must be positive")
    if num_parts is None:
        num_parts = _np_parts(ds.count())
    np_parts = np.uint64(num_parts)

    def tag(batch: pa.Table) -> pa.Table:
        k = (
            batch.column(key_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(k) % np_parts).astype(np.int32)
                ),
                "k": pa.array(k),
                "t": pa.array(_ts_int64(batch.column(ts_col))),
                "tie": pa.array(
                    batch.column(order_tie_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "v": pa.array(
                    batch.column(val_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    w = int(window_rows)

    def merge(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        tie = group.column("tie").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        n = len(k)
        order = np.lexsort((tie, t, k))
        k_s, t_s, tie_s, v_s = k[order], t[order], tie[order], v[order]
        new_key = np.empty(n, dtype=bool)
        if n:
            new_key[0] = True
            new_key[1:] = k_s[1:] != k_s[:-1]
        idx = np.arange(n)
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        # trailing-w window start, clamped at the key's first row
        win_start = np.maximum(seg_start, idx - (w - 1))
        cs = np.concatenate([[0], np.cumsum(v_s)])  # cs[i] = sum of first i
        mov_sum = cs[idx + 1] - cs[win_start]
        mov_n = idx - win_start + 1
        # lag/lead: neighbors within the same key, else null
        lag_vals = np.empty(n, dtype=np.int64)
        lead_vals = np.empty(n, dtype=np.int64)
        if n:
            lag_vals[1:] = v_s[:-1]
            lag_vals[0] = 0
            lead_vals[:-1] = v_s[1:]
            lead_vals[-1] = 0
        last_of_key = np.empty(n, dtype=bool)
        if n:
            last_of_key[:-1] = new_key[1:]
            last_of_key[-1] = True
        return pa.table(
            {
                key_col: pa.array(k_s),
                ts_col: pa.array(t_s),
                order_tie_col: pa.array(tie_s),
                f"lag_{val_col}": pa.array(lag_vals, mask=new_key),
                f"lead_{val_col}": pa.array(lead_vals, mask=last_of_key),
                "mov_sum": pa.array(mov_sum.astype(np.int64)),
                "mov_n": pa.array(mov_n.astype(np.int64)),
            }
        )

    return tagged.groupby("hpart").map_groups(merge, batch_format="pyarrow")


def rank_functions(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    tie_col: str,
    ntiles: int = 4,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Per-key SQL rank family over an int64 value column — the
    ``RANK() / DENSE_RANK() / PERCENT_RANK() / NTILE(b) OVER
    (PARTITION BY key ORDER BY value [, tie])`` window surface.

    Output one row per input row: ``(key, value, tie, row_number,
    rnk, dense_rank, percent_rank, ntile)``.

    Semantics (ANSI / DuckDB):

    - ``row_number`` and ``ntile`` order by ``(value, tie)`` (the tie
      column must make that order unique for determinism);
    - ``rnk`` / ``dense_rank`` / ``percent_rank`` order by ``value``
      alone, so equal values share a rank;
    - ``percent_rank = (rnk - 1) / (n_key - 1)`` (0.0 for singleton
      keys) — one IEEE division over exact ints, so the SQL twin
      matches bitwise;
    - ``ntile`` hands the first ``n_key % ntiles`` buckets one extra
      row each (DuckDB's distribution).

    One hash shuffle on the key, then a per-group lexsort + segment
    algebra — no per-row Python, same scale shape as
    :func:`running_agg`.
    """
    if num_parts is None:
        num_parts = _np_parts(ds.count())
    np_parts = np.uint64(num_parts)
    nt = np.int64(ntiles)

    def tag(batch: pa.Table) -> pa.Table:
        k = (
            batch.column(key_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(k) % np_parts).astype(np.int32)
                ),
                "k": pa.array(k),
                "v": pa.array(
                    batch.column(value_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "tie": pa.array(
                    batch.column(tie_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        tie = group.column("tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, v, k))
        k, v, tie = k[order], v[order], tie[order]
        m = len(k)
        if m == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    value_col: pa.array([], pa.int64()),
                    tie_col: pa.array([], pa.int64()),
                    "row_number": pa.array([], pa.int64()),
                    "rnk": pa.array([], pa.int64()),
                    "dense_rank": pa.array([], pa.int64()),
                    "percent_rank": pa.array([], pa.float64()),
                    "ntile": pa.array([], pa.int64()),
                }
            )
        gpos = np.arange(m, dtype=np.int64)
        new_key = np.empty(m, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        seg_start = np.maximum.accumulate(np.where(new_key, gpos, 0))
        rn = gpos - seg_start + 1
        seg_len = np.diff(
            np.append(np.flatnonzero(new_key), m)
        )
        n_of_row = np.repeat(seg_len, seg_len)
        new_val = new_key | np.concatenate([[True], v[1:] != v[:-1]])
        first_eq = np.maximum.accumulate(np.where(new_val, gpos, 0))
        rnk = first_eq - seg_start + 1
        dr_global = np.cumsum(new_val)
        dense = dr_global - np.repeat(
            dr_global[np.flatnonzero(new_key)] - 1, seg_len
        )
        pct = np.where(
            n_of_row > 1, (rnk - 1) / np.maximum(n_of_row - 1, 1), 0.0
        )
        # DuckDB NTILE: q = n // b, r = n % b; first r buckets get q+1
        q, r = n_of_row // nt, n_of_row % nt
        big = r * (q + 1)
        rn0 = rn - 1
        in_big = rn0 < big
        with np.errstate(divide="ignore", invalid="ignore"):
            bucket = np.where(
                in_big,
                rn0 // np.maximum(q + 1, 1) + 1,
                r + (rn0 - big) // np.maximum(q, 1) + 1,
            )
        return pa.table(
            {
                key_col: pa.array(k),
                value_col: pa.array(v),
                tie_col: pa.array(tie),
                "row_number": pa.array(rn),
                "rnk": pa.array(rnk),
                "dense_rank": pa.array(dense.astype(np.int64)),
                "percent_rank": pa.array(pct),
                "ntile": pa.array(bucket.astype(np.int64)),
            }
        )

    return tagged.groupby("hpart").map_groups(merge, batch_format="pyarrow")
