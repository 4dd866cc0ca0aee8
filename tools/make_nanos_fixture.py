#!/usr/bin/env python3
"""Regenerate the genuine TIMESTAMP(NANOS) parquet fixture used by
EventsReaderSpec's end-to-end legacy-shape test.

The in-spec "nanos_long" shape is authored by Spark as a plain INT64
column, which never exercises the actual legacy physical type. This
fixture is written by pyarrow with timestamp[ns] + store_schema=False,
producing the real `Timestamp(isAdjustedToUTC=false, NANOS)` annotation
the rounds-1-8 driver testdata carried — unreadable by Spark unless
`spark.sql.legacy.parquet.nanosAsLong=true` is set at session build.

Dev-side only (pyarrow is a driver/container tool, not a library dep);
the output is checked in at src/test/resources/events_nanos/.
"""
import datetime as dt
import pyarrow as pa
import pyarrow.parquet as pq

base = dt.datetime(2024, 3, 1, 12, 0, 0)
rows = [
    (1, base,                                              10, "view",     1.5,  "{}"),
    (2, base + dt.timedelta(minutes=5),                    10, "click",    2.0,  "{}"),
    (3, base + dt.timedelta(hours=1),                      11, "purchase", 99.5, '{"k":"v"}'),
    (4, base + dt.timedelta(hours=2, microseconds=123456), 11, "view",     0.0,  "{}"),
    (5, base + dt.timedelta(days=1),                       12, "refund",   -5.0, "{}"),
]
table = pa.table({
    "event_id":   pa.array([r[0] for r in rows], pa.int64()),
    "ts":         pa.array([r[1] for r in rows], pa.timestamp("ns")),
    "user_id":    pa.array([r[2] for r in rows], pa.int64()),
    "event_type": pa.array([r[3] for r in rows], pa.string()),
    "value":      pa.array([r[4] for r in rows], pa.float64()),
    "props":      pa.array([r[5] for r in rows], pa.string()),
})
out = "src/test/resources/events_nanos/events.parquet/part-0.parquet"
pq.write_table(table, out, version="2.6", coerce_timestamps=None,
               store_schema=False)
print(pq.ParquetFile(out).schema)
