"""Stream-shaped operators over the events table.

Ray Data is a (streaming-)batch engine: windows are expressed as a
computed window-start column + groupby (tumbling), or per-key sorted
map_groups (sessionization) — the partitioning/ordering assumptions
are explicit (ray_guide.md streaming section)."""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


def tumbling_counts(ds: Any, every: str = "hour") -> Any:
    """Tumbling-window aggregate: (event_type, window_start) ->
    count + sum(value). The floor is computed vectorized per batch
    BEFORE the shuffle, so the groupby moves pre-keyed rows."""
    from ray.data.aggregate import Count, Sum

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch.column("ts"), unit=every)
        return batch.append_column("window_start", w)

    keyed = ds.map_batches(add_window, batch_format="pyarrow")
    return keyed.groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"))


def sessionize(ds: Any, gap_seconds: int = 1800) -> Any:
    """Per-user sessionization: sort each user's events by ts inside
    map_groups, split on gaps > gap_seconds. Partitioning assumption:
    one user's events fit in one group (holds for user-keyed logs;
    salt by day for pathological users)."""
    import pandas as pd

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff().dt.total_seconds().fillna(0)
        sid = (gaps > gap_seconds).cumsum()
        out = g.groupby(sid).agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("event_id", "count"), sum_value=("value", "sum"))
        out["user_id"] = g["user_id"].iloc[0]
        return out.reset_index(drop=True)

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
