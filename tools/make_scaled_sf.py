"""Synthesize a larger scale factor from driver testdata for scaling probes.

The driver provides sf0.001/0.01/0.1 only; the 2x-of-baseline bench gate is
measured at sf0.1.  This script builds an sf{0.1*factor} dataset (default
10x -> "sf1") by replicating each table ``factor`` times with per-replica
key offsets, mirroring how TPC-H scale factors actually grow:

* fact/dim keys (orders, lineitem, customer, supplier, part, events,
  documents, embeddings) shift per replica -> key domains grow linearly,
  join fan-in stays constant;
* region/nation stay fixed (constant-size dimensions at every TPC-H sf);
* events timestamps jitter per replica (no 10x tie pile-up at one instant);
* document text is interleaved with replica-specific tokens every 3rd token
  so replicas are DISTINCT documents (5-gram Jaccard ~ 0 across replicas),
  not a 10x exact-duplicate explosion that would measure dedup output
  growth instead of runtime scaling;
* embeddings perturb per (replica, dim) so near-identical-vector skew
  doesn't grow artificially.

Usage::

    python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

KEY_OFF = 1_000_000  # per-replica shift for dim-style keys
BIG_OFF = 10_000_000  # per-replica shift for fact keys (orderkey, event_id)


def main(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def copy(table: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    def src_t(table: str) -> str:
        return f"'{src}/{table}.parquet'"

    rep = f"range(0, {factor}) r(i)"

    copy("region", f"SELECT * FROM {src_t('region')}")
    copy("nation", f"SELECT * FROM {src_t('nation')}")
    copy(
        "customer",
        f"""SELECT c_custkey + r.i * {KEY_OFF} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {src_t('customer')}, {rep}""",
    )
    copy(
        "supplier",
        f"""SELECT s_suppkey + r.i * {KEY_OFF} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM {src_t('supplier')}, {rep}""",
    )
    copy(
        "part",
        f"""SELECT p_partkey + r.i * {KEY_OFF} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {src_t('part')}, {rep}""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + r.i * {BIG_OFF} AS o_orderkey,
                   o_custkey + r.i * {KEY_OFF} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src_t('orders')}, {rep}""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey + r.i * {BIG_OFF} AS l_orderkey,
                   l_partkey + r.i * {KEY_OFF} AS l_partkey,
                   l_suppkey + r.i * {KEY_OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src_t('lineitem')}, {rep}""",
    )
    copy(
        "events",
        f"""SELECT event_id + r.i * {BIG_OFF} AS event_id,
                   ts + r.i * INTERVAL 17 SECOND AS ts,
                   user_id, event_type, value, props
            FROM {src_t('events')}, {rep}""",
    )

    # documents: python-side token interleave (replica-distinct text)
    docs = pd.read_parquet(f"{src}/documents.parquet")
    out = []
    for i in range(factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + i * KEY_OFF
        if i > 0:
            d["text"] = [
                " ".join(
                    tok if j % 3 != 2 else f"{tok} q{i}z{j % 7}"
                    for j, tok in enumerate(t.split(" "))
                )
                for t in d["text"]
            ]
            d["n_chars"] = d["text"].str.len()
        out.append(d)
    pd.concat(out, ignore_index=True).to_parquet(
        f"{dst}/documents.parquet", index=False
    )
    print(f"documents: {len(docs) * factor} rows")

    emb = pd.read_parquet(f"{src}/embeddings.parquet")
    out = []
    for i in range(factor):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + i * KEY_OFF
        if i > 0:
            e["embedding"] = [
                [x + (((i * 31 + j * 7) % 11) - 5) * 0.01 for j, x in enumerate(v)]
                for v in e["embedding"]
            ]
        out.append(e)
    pd.concat(out, ignore_index=True).to_parquet(
        f"{dst}/embeddings.parquet", index=False
    )
    print(f"embeddings: {len(emb) * factor} rows")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, factor)
