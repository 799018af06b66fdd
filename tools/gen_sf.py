"""Deterministic scale-up generator for local scale-headroom runs.

The driver ships sf0.001/0.01/0.1; proving the constants hold one order
of magnitude up (VERDICT r8 #1) needs an sf1 the driver doesn't ship.
This tool tiles the LARGEST driver-provided scale by an integer factor
with key shifts, so every distribution the driver's generator chose —
value ranges, date spans, group cardinalities, skew — is preserved
EXACTLY on the relational tables while all key spaces grow ×factor:

- region/nation: fixed dimensions, copied as-is (as TPC-H does).
- customer/supplier/part/orders/lineitem/events: ``factor`` copies with
  every key column shifted by ``copy × stride`` (stride = the source
  key-space size), FK edges re-pointed consistently, non-key columns
  untouched.  Events keep their timestamps: growth means more events in
  the same window, which is what a ×10 traffic year looks like.
- documents: copy 0 verbatim; copies ≥ 1 REGENERATE each text by
  resampling that document's own word multiset (seeded per (copy, id),
  same length) — a naive verbatim tile would hand the near-dup
  operators ``factor`` exact clones of every doc, quadratically
  inflating pair joins and making "did it scale linearly" unanswerable.
  Topic/vocab/length distributions are preserved.
- embeddings: copy 0 verbatim; copies ≥ 1 add seeded N(0, 0.05·σ)
  jitter per element — cluster structure preserved, no artificial
  exact-duplicate vectors (the SemDeDup blow-up analog).

Usage:
    python tools/gen_sf.py [--base /root/testdata/sf0.1] \
        [--out .localdata/sf1] [--factor 10]

Output is ~10× the base directory (~170 MB for sf1); everything is
seeded — two runs produce byte-identical logical content.
"""

from __future__ import annotations

import argparse
import hashlib
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def key_strides(con, base: str) -> dict[str, int]:
    """Key-space sizes MEASURED from the base directory (max key + 1),
    so the tool works against any base scale without editing literals
    — the shift for copy cp is ``cp × stride`` per key family."""
    out = {}
    for name, table, col in (
        ("cust", "customer", "c_custkey"),
        ("supp", "supplier", "s_suppkey"),
        ("part", "part", "p_partkey"),
        ("ord", "orders", "o_orderkey"),
        ("ev", "events", "event_id"),
        ("user", "events", "user_id"),
        ("doc", "documents", "doc_id"),
        ("vec", "embeddings", "vec_id"),
    ):
        out[name] = (
            con.sql(
                f"SELECT max({col}) + 1 FROM '{base}/{table}.parquet'"
            ).fetchone()[0]
        )
    return out


def _tile_sql(table: str, base: str, factor: int, k: dict[str, int]) -> str:
    src = f"'{base}/{table}.parquet'"
    copies = f"(SELECT unnest(range({factor})) AS cp)"
    if table == "customer":
        return f"""
        SELECT c_custkey + cp * {k['cust']} AS c_custkey,
               format('Customer#{{:09d}}', c_custkey + cp * {k['cust']})
                 AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src} CROSS JOIN {copies}"""
    if table == "supplier":
        return f"""
        SELECT s_suppkey + cp * {k['supp']} AS s_suppkey,
               format('Supplier#{{:09d}}', s_suppkey + cp * {k['supp']})
                 AS s_name,
               s_nationkey, s_acctbal
        FROM {src} CROSS JOIN {copies}"""
    if table == "part":
        return f"""
        SELECT p_partkey + cp * {k['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src} CROSS JOIN {copies}"""
    if table == "orders":
        return f"""
        SELECT o_orderkey + cp * {k['ord']} AS o_orderkey,
               o_custkey + cp * {k['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src} CROSS JOIN {copies}"""
    if table == "lineitem":
        return f"""
        SELECT l_orderkey + cp * {k['ord']} AS l_orderkey,
               l_partkey + cp * {k['part']} AS l_partkey,
               l_suppkey + cp * {k['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src} CROSS JOIN {copies}"""
    if table == "events":
        return f"""
        SELECT event_id + cp * {k['ev']} AS event_id, ts,
               user_id + cp * {k['user']} AS user_id,
               event_type, value, props
        FROM {src} CROSS JOIN {copies}"""
    raise ValueError(table)


def _seed(copy: int, ident: int) -> int:
    h = hashlib.md5(f"sfgen:{copy}:{ident}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def gen_documents(base: str, out: str, factor: int, stride: int) -> None:
    t = pq.read_table(f"{base}/documents.parquet")
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    srcs = t.column("source").to_pylist()
    out_rows = {"doc_id": [], "text": [], "lang": [], "source": [],
                "n_chars": []}
    for cp in range(factor):
        for i, did in enumerate(ids):
            new_id = did + cp * stride
            if cp == 0 or texts[i] is None:
                text = texts[i]
            else:
                words = texts[i].split()
                rng = np.random.default_rng(_seed(cp, did))
                text = " ".join(
                    words[j] for j in rng.integers(0, len(words), len(words))
                )
            out_rows["doc_id"].append(new_id)
            out_rows["text"].append(text)
            out_rows["lang"].append(langs[i])
            out_rows["source"].append(srcs[i])
            out_rows["n_chars"].append(len(text) if text is not None else None)
    pq.write_table(
        pa.table(
            out_rows,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string()),
                 ("lang", pa.string()), ("source", pa.string()),
                 ("n_chars", pa.int64())]
            ),
        ),
        f"{out}/documents.parquet",
        # many row groups: Spark parallelizes a single parquet file by
        # row group, and one 50k-row group would pin every documents
        # scan to one task (pyarrow's default is one giant group)
        row_group_size=4096,
    )


def gen_embeddings(base: str, out: str, factor: int, stride: int) -> None:
    t = pq.read_table(f"{base}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
    sigma = 0.05 * float(emb.std())
    all_ids, all_emb, all_lab = [], [], []
    for cp in range(factor):
        all_ids.append(ids + cp * stride)
        if cp == 0:
            all_emb.append(emb)
        else:
            rng = np.random.default_rng(_seed(cp, 0))
            all_emb.append(
                (emb + rng.normal(0.0, sigma, emb.shape)).astype(np.float32)
            )
        all_lab.append(labels)
    ids_f = np.concatenate(all_ids)
    emb_f = np.concatenate(all_emb)
    lab_f = np.concatenate(all_lab)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids_f, pa.int64()),
                "embedding": pa.array(
                    list(emb_f), pa.list_(pa.float32())
                ),
                "label": pa.array(lab_f, pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
        row_group_size=2048,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    k = key_strides(con, args.base)
    for table in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{args.base}/{table}.parquet') TO "
            f"'{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")
    for table in ("customer", "supplier", "part", "orders", "lineitem",
                  "events"):
        con.sql(
            f"COPY ({_tile_sql(table, args.base, args.factor, k)}) TO "
            f"'{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM '{args.out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")
    gen_documents(args.base, args.out, args.factor, k["doc"])
    gen_embeddings(args.base, args.out, args.factor, k["vec"])
    print("documents + embeddings done ->", args.out)


if __name__ == "__main__":
    main()
