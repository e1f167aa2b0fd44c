"""events_rolling_sum / event_transitions on a synthetic mini events table
with SHORT user runs (1 and 2 events — windows smaller than 3 rows) and ties
broken by event_id, checked against the exact DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gtfs_conflation_pipeline_ray.pipelines.queries import (
    SQL_EVENT_TRANSITIONS, SQL_EVENTS_ROLLING_SUM, q_event_transitions,
    q_events_rolling_sum)


def _mini_events(tmp_path):
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": [base + pd.Timedelta(seconds=s) for s in
               [10, 20, 30, 40, 10, 10, 5, 99]],
        "user_id": np.array([1, 1, 1, 1, 2, 2, 3, 3], np.int64),
        "event_type": ["view", "click", "view", "purchase",
                       "view", "view", "click", "error"],
        "value": [1.01, 2.02, 3.03, 4.04, 5.05, 6.06, 7.07, 8.08],
        "props": ["{}"] * 8,
    })
    # user 2 has a TS TIE (both at +10s) -> order decided by event_id
    tab = pa.Table.from_pandas(df, preserve_index=False).set_column(
        1, "ts", pa.Array.from_pandas(df["ts"]).cast(pa.timestamp("us")))
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    out = con.execute(sql).df()
    con.close()
    return out


def test_rolling_sum_short_runs_and_ties(tmp_path):
    sf = _mini_events(tmp_path)
    got = q_events_rolling_sum(sf).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    exp = _oracle(sf, SQL_EVENTS_ROLLING_SUM).sort_values(
        "event_id").reset_index(drop=True)
    assert (got["roll3_c"].to_numpy() == exp["roll3_c"].to_numpy()).all()
    # pinned: user 1 full window = 101+202+303 then 202+303+404
    by_eid = dict(zip(got.event_id, got.roll3_c))
    assert by_eid[2] == 101 + 202 + 303
    assert by_eid[3] == 202 + 303 + 404
    assert by_eid[4] == 505          # run length 1 so far
    assert by_eid[5] == 505 + 606    # run length 2


def test_transitions_mini(tmp_path):
    sf = _mini_events(tmp_path)
    got = q_event_transitions(sf).to_pandas()
    exp = _oracle(sf, SQL_EVENT_TRANSITIONS)
    g = {(r.from_type, r.to_type): r.n for r in got.itertuples()}
    e = {(r.from_type, r.to_type): r.n for r in exp.itertuples()}
    assert g == e
    assert g[("click", "error")] == 1   # user 3: click(5s) -> error(99s)
    assert g[("view", "view")] == 1     # user 2's tie ordered by event_id
