"""Round-14 optimization pins.

The hoisted single-constant kernel forms (hyperplane buckets, IVF
nearest-cells) must stay BIT-IDENTICAL to the reference fold: per-
element float64 products accumulated strictly left-to-right, lowest-id
tie-breaks.  The references here are plain Python floats (IEEE float64,
same sequential order), so any re-association or type drift in the SQL
kernels fails these, not the round gate.
"""

from pyspark.sql import functions as F


def _emb(spark, n=40, dim=16):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    (F.col("id") * (i + 3) % 17) / 7.0
                    - ((F.col("id") + i) % 5) / 3.0
                ).cast("float")
                for i in range(dim)
            ]
        ).alias("embedding"),
    )


def test_hyperplane_bucket_array_matches_reference_fold(spark):
    from ubw_spark.operators.similarity import (
        _hyperplanes,
        hyperplane_bucket_array,
    )

    dim, bits, tables, seed = 16, 4, 16, 42
    emb = _emb(spark, dim=dim)
    got = {
        r["vec_id"]: [(s["t"], s["b"]) for s in r["__tb"]]
        for r in hyperplane_bucket_array(
            emb, "embedding", dim, bits, tables, seed
        ).collect()
    }
    planes = _hyperplanes(dim, bits, tables, seed)
    for r in emb.collect():
        exp = []
        for t in range(tables):
            b = 0
            for j in range(bits):
                acc = 0.0
                for x, c in zip(r["embedding"], planes[t, j]):
                    acc = acc + float(x) * float(c)  # left-to-right
                if acc >= 0.0:
                    b += 1 << j
            exp.append((t, b))
        assert got[r["vec_id"]] == exp


def test_nearest_cells_matches_driver_reference(spark):
    from ubw_spark.operators.ivf import assign_ivf_cells, nearest_cells_py

    cents = [
        [0.1 * i + 0.01 * j for j in range(16)] for i in range(8)
    ]
    emb = _emb(spark, dim=16)
    got = {
        r["vec_id"]: r["ivf_cell"]
        for r in assign_ivf_cells(emb, cents).collect()
    }
    for r in emb.collect():
        exp = nearest_cells_py(
            [float(x) for x in r["embedding"]], cents, 1
        )[0]
        assert got[r["vec_id"]] == exp


def test_lsh_index_parallel_writes_complete_store(spark, tmp_path):
    """write_minhash_index submits its three store writes from a thread
    pool; the committed version must still hold all three stores plus
    both sidecars, and the manifest must flip only after all landed."""
    import os

    from ubw_spark.operators.lsh_index import write_minhash_index
    from ubw_spark.operators.versioned import SCHEMA_FILE, resolve_root

    docs = spark.range(24).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon token"),
            (F.col("id") % 4).cast("string"),
        ).alias("text"),
    )
    path = str(tmp_path / "lsh_par")
    write_minhash_index(docs, "doc_id", "text", path)
    root = resolve_root(path)
    for sub in ("bands", "docs", "sigs"):
        d = os.path.join(root, sub)
        assert os.path.isdir(d), f"missing store {sub}"
        assert os.path.exists(os.path.join(d, SCHEMA_FILE))
        assert any(f.endswith(".parquet") for _r, _d, fs in os.walk(d)
                   for f in fs)
    assert os.path.exists(os.path.join(root, "_LSH_PARAMS"))
