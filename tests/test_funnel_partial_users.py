"""q_events_funnel on users who do NOT complete the funnel.

The shipped testdata happens to contain only full-funnel users at
every sf, which masked an ANSI-mode crash (element_at on an empty
array throws under spark.sql.ansi.enabled=true, the Spark 4 default).
This fixture crafts every partial shape: no views at all, click
before the first view (stage resets), views only, and no purchases —
each must yield a NULL-staged row like the oracle's LEFT JOINs, never
an error."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from aind_exaspim_data_transformation_spark.queries import QUERIES


def _write_events(path, rows):
    ts, uid, et = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    list(ts), pa.timestamp("us")
                ),
                "user_id": pa.array(list(uid), pa.int64()),
                "event_type": pa.array(list(et)),
                "value": pa.array([1.0] * len(rows)),
            }
        ),
        path,
    )


def test_partial_funnel_users_yield_nulls_not_errors(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: full funnel
        (at(0), 1, "view"),
        (at(1), 1, "click"),
        (at(2), 1, "purchase"),
        # user 2: click BEFORE first view, never again -> stage 1
        (at(0), 2, "click"),
        (at(1), 2, "view"),
        # user 3: views only -> stage 1
        (at(0), 3, "view"),
        # user 4: no views at all -> stage 0
        (at(0), 4, "click"),
        (at(1), 4, "purchase"),
        # user 5: view + click, purchase before the click -> stage 2
        (at(0), 5, "view"),
        (at(1), 5, "purchase"),
        (at(2), 5, "click"),
    ]
    _write_events(str(tmp_path / "events.parquet"), rows)
    got = {
        r["user_id"]: (
            r["funnel_stage"],
            r["first_view"],
            r["first_click"],
            r["first_purchase"],
        )
        for r in QUERIES["q_events_funnel"](spark, str(tmp_path)).collect()
    }
    assert got[1][0] == 3
    assert got[2] == (1, "2024-01-01 12:01:00", None, None)
    assert got[3] == (1, "2024-01-01 12:00:00", None, None)
    assert got[4] == (0, None, None, None)
    assert got[5] == (2, "2024-01-01 12:00:00", "2024-01-01 12:02:00", None)
