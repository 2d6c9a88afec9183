"""Synthetic Redset-shaped fixtures (FIXTURES.md F1/F2).

Deterministic generators for the dirty-data paths the reference cleans:
literal "NULL"/empty strings, unparseable timestamps, CSV multi-id lists
with bad tokens, 999999 sentinels, duplicate rows (Kafka replay), final
ingestions with no successor.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

T0 = datetime(2024, 3, 1, 0, 0, 0)


def redset_raw_rows(n: int = 200, seed: int = 7) -> pd.DataFrame:
    """Raw (pre-clean) Redset log rows with dirty variants, all as strings —
    the shape of JSON-decoded Kafka messages."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ts = T0 + timedelta(minutes=i * 7)
        dirty = rng.random()
        rows.append(
            {
                "instance_id": str(rng.randint(1, 5)) if dirty > 0.05 else "NULL",
                "cluster_size": f"{rng.uniform(1, 8):.1f}" if dirty > 0.1 else "",
                "user_id": str(rng.randint(1, 20)),
                "database_id": str(rng.randint(1, 3)),
                "query_id": str(i),
                "arrival_timestamp": (
                    ts.strftime("%Y-%m-%d %H:%M:%S") if dirty > 0.08 else "not-a-date"
                ),
                "compile_duration_ms": (
                    f"{rng.uniform(10, 90000):.2f}" if dirty > 0.12 else "NULL"
                ),
                "queue_duration_ms": str(rng.randint(0, 5000)),
                "execution_duration_ms": str(rng.choice([5, 50, 500, 5000, 50000])),
                "feature_fingerprint": rng.choice(["abc123", "UNKNOWN", ""]),
                "was_aborted": rng.choice(["true", "false", "False", "NULL"]),
                "was_cached": rng.choice(["true", "false"]),
                "cache_source_query_id": rng.choice(["", "NULL", str(rng.randint(0, n))]),
                "query_type": rng.choice(
                    ["select", "select", "select", "insert", "copy", "update", "delete", "analyze"]
                ),
                "num_permanent_tables_accessed": str(rng.randint(0, 5)),
                "num_external_tables_accessed": "0",
                "num_system_tables_accessed": str(rng.randint(0, 2)),
                "read_table_ids": rng.choice(
                    ["42", "42,7", "42,7,999999", "[]", "NULL", "a,b", "", "7,13,21"]
                ),
                "write_table_ids": rng.choice(["42", "7", "[]", ""]),
                "mbytes_scanned": f"{rng.uniform(0, 1000):.1f}",
                "mbytes_spilled": rng.choice(["0", "0", "0", f"{rng.uniform(0, 500):.1f}"]),
                "num_joins": str(rng.randint(0, 10)),
                "num_scans": str(rng.randint(0, 20)),
                "num_aggregations": str(rng.randint(0, 8)),
            }
        )
    return pd.DataFrame(rows)


def flat_rows(seed: int = 11) -> pd.DataFrame:
    """FLATTENED_SCHEMA fixture meeting FIXTURES.md F2's constraints:
    interval chains with interleaved selects, read-only and write-only
    tables, a final ingestion with no successor, replay duplicates."""
    rng = random.Random(seed)
    rows = []
    qid = 0

    def add(instance, write_t, read_t, ts, qtype):
        nonlocal qid
        rows.append(
            {
                "instance_id": instance,
                "query_id": qid,
                "write_table_id": write_t,
                "read_table_id": read_t,
                "arrival_timestamp": ts,
                "query_type": qtype,
            }
        )
        qid += 1

    for instance in (1, 2):
        for table in (10, 20):
            base = T0 + timedelta(hours=instance, minutes=table)
            # 4 ingestions at +0, +60, +120, +180 min (last has no successor)
            for k in range(4):
                add(instance, table, None, base + timedelta(minutes=60 * k), "insert")
            # selects interleaved inside the intervals (>=10 in one interval
            # for NTILE coverage), reading the same table
            for m in range(12):
                add(
                    instance,
                    None,
                    table,
                    base + timedelta(minutes=5 * (m + 1)),
                    "select",
                )
            # transforms inside intervals
            add(instance, table, None, base + timedelta(minutes=75), "update")
            add(instance, table, None, base + timedelta(minutes=130), "delete")
        # read-only table (selects only, no ingestion → no bracketing match)
        for m in range(3):
            add(instance, None, 99, T0 + timedelta(minutes=9 * m), "select")
        # write-only table (transform only)
        add(instance, 77, None, T0 + timedelta(minutes=30), "update")
        # sentinel reads
        add(instance, None, 999999, T0 + timedelta(minutes=45), "select")

    pdf = pd.DataFrame(rows)
    # replay duplicates (Kafka at-least-once)
    dups = pdf.sample(n=5, random_state=rng.randint(0, 999))
    out = pd.concat([pdf, dups], ignore_index=True)
    out["write_table_id"] = out["write_table_id"].astype("Int64")
    out["read_table_id"] = out["read_table_id"].astype("Int64")
    return out
