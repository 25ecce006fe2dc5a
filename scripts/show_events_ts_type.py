#!/usr/bin/env python3
"""One-line repro for the events.ts physical-type drift (r7 post-mortem).

The driver regenerates /root/testdata between rounds and the parquet
physical type of events.ts has changed across regenerations (ns-precision
TIMESTAMP read by Spark as epoch-nanos long under nanosAsLong in r1-r6;
us-precision TIMESTAMP resolved as TIMESTAMP_NTZ since r7). Run this to
see what the current testdata carries; SparkEntry.tsMicros/tsTimestamp
must handle whatever it prints (TsAdaptiveSuite pins the known shapes).

Usage: python3 scripts/show_events_ts_type.py [sf_dir]
"""
import sys

import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
f = pq.ParquetFile(f"{sf}/events.parquet")
print("arrow schema:")
print(f.schema_arrow)
print("\nparquet physical ts column:")
print(f.schema_arrow.field("ts").type)
