"""Versioned directory layout for persisted index stores.

Every long-lived index in this repo (MinHash-LSH bands/docs, IVF cell
layout, IVFPQ code layout) needs the same three lifecycle properties at
object-store scale:

- **rewrites never mutate a directory a reader may hold open** — a new
  version directory is written complete, then a one-line ``_CURRENT``
  manifest flips to it;
- **the flip is a single small-object write** — atomic locally via
  ``os.replace``, atomic on S3/GCS as one PUT (directory renames there
  are copy+delete and race readers — the reason rmtree+move is banned);
- **the previous version survives one rewrite cycle** as a grace copy
  for readers that resolved the manifest just before the flip; older
  versions are garbage-collected.

This is the lakehouse-log pointer trick (Delta/Iceberg metadata file)
reduced to the one pointer an index needs.  Readers resolve ONCE per
query so a mid-query flip cannot split a plan across versions.

A manifest that exists but does not parse RAISES: falling back to an
older layout on corruption would silently serve stale data (documents
compacted out would resurface) — absent-manifest and corrupt-manifest
are different conditions, and only the first means "legacy flat
layout".
"""

from __future__ import annotations

import os
import posixpath
import re
import shutil

#: Manifest file at the store root naming the live version directory.
MANIFEST = "_CURRENT"
#: {5,} not {5}: version_dir's {:05d} is a MINIMUM width — v100000 is
#: six digits, and a five-digit-only match would make the legacy sweep
#: delete the live version dir the moment a long-lived store passes
#: v99999.
_VDIR_RE = re.compile(r"^v(\d{5,})$")


def version_dir(path: str, version: int) -> str:
    return posixpath.join(path, f"v{version:05d}")


def current_version(path: str) -> int | None:
    """The live version number from ``path/_CURRENT``, or None when the
    store has no manifest (legacy flat layout, or not written yet)."""
    try:
        with open(posixpath.join(path, MANIFEST)) as f:
            raw = f.read().strip()
    except FileNotFoundError:
        return None
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"corrupt index manifest {path}/{MANIFEST}: {raw!r} — refusing "
            "to fall back to an older layout; restore the manifest to the "
            "latest complete vNNNNN directory"
        ) from None


def resolve_root(path: str) -> str:
    """Directory holding the live store: the manifest's version dir, or
    ``path`` itself for a pre-manifest flat layout (still readable)."""
    v = current_version(path)
    return path if v is None else version_dir(path, v)


def write_manifest(path: str, version: int) -> None:
    """Atomically flip the pointer (write temp, rename over
    ``_CURRENT``; one PUT on an object store)."""
    os.makedirs(path, exist_ok=True)
    tmp = posixpath.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, posixpath.join(path, MANIFEST))


def gc_versions(path: str, keep_from: int) -> None:
    """Delete version dirs older than ``keep_from`` (grace policy: the
    caller passes ``new_version - 1`` so the immediately previous
    version survives one cycle for in-flight readers)."""
    for name in os.listdir(path):
        m = _VDIR_RE.match(name)
        if m and int(m.group(1)) < keep_from:
            shutil.rmtree(posixpath.join(path, name))


def begin_rewrite(path: str) -> tuple[int | None, int, str]:
    """(current_version, new_version, new_root) for a rewrite cycle —
    the caller writes the new root COMPLETELY, then calls
    :func:`commit_rewrite`."""
    cur = current_version(path)
    new_v = 0 if cur is None else cur + 1
    return cur, new_v, version_dir(path, new_v)


def commit_rewrite(
    path: str,
    cur: int | None,
    new_v: int,
    *,
    legacy_names: tuple[str, ...] = (),
    legacy_prefixes: tuple[str, ...] = (),
) -> None:
    """Flip the manifest to ``new_v``, GC versions past grace, and —
    once a versioned copy has existed for a full cycle — remove the
    NAMED pre-manifest flat stores left at the root by older releases
    (``legacy_names`` exact dir names, ``legacy_prefixes`` dir-name
    prefixes like ``ivf_cell=``).  Only what the caller names is ever
    deleted: the store root may legitimately hold user co-located
    directories (backups, checkpoints) that a blanket
    everything-but-vNNNNN sweep would silently destroy."""
    write_manifest(path, new_v)
    gc_versions(path, new_v - 1)
    if cur is not None and (legacy_names or legacy_prefixes):
        for name in os.listdir(path):
            p = posixpath.join(path, name)
            if not os.path.isdir(p) or _VDIR_RE.match(name):
                continue
            if name in legacy_names or name.startswith(legacy_prefixes):
                shutil.rmtree(p)


def link_carryover(
    src_root: str, dst_root: str, *, skip_files: tuple[str, ...] = ()
) -> None:
    """Hardlink every data file of the live version into a new version
    dir — the carryover half of an APPEND-through-rewrite cycle: the
    new version = links to all old files + the batch's new files +
    a fresh sidecar, then one manifest flip.  A crash anywhere before
    the flip leaves the live version byte-identical (no in-place
    append ever touches a directory a reader may hold open), which is
    the property plain ``mode("append")`` into the resolved root
    cannot give when a sidecar must change in the same step.

    Cost is O(files) metadata operations, never O(bytes): hardlinks
    locally / HDFS; on S3 or GCS the equivalent is a server-side
    CopyObject per file (no data through compute) or, better, a
    file-list manifest — this module's pointer trick one level down.
    Falls back to a real copy when the filesystem refuses links
    (cross-device).

    ``skip_files``: exact file names NOT carried over (sidecars the
    caller rewrites).  Version dirs, ``_CURRENT`` and ``*.tmp`` under
    ``src_root`` are always skipped — they only appear when the source
    is a legacy flat root (src == store path)."""
    for root, dirs, files in os.walk(src_root):
        dirs[:] = [d for d in dirs if not _VDIR_RE.match(d)]
        rel = os.path.relpath(root, src_root)
        out = dst_root if rel == "." else posixpath.join(dst_root, rel)
        os.makedirs(out, exist_ok=True)
        for f in files:
            if f == MANIFEST or f.endswith(".tmp") or f in skip_files:
                continue
            src = os.path.join(root, f)
            dst = posixpath.join(out, f)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)


def compact_partitioned_store(
    spark,
    path: str,
    drop_ids,
    id_col: str,
    partition_col: str,
    *,
    broadcast_drops: bool = True,
    legacy_prefixes: tuple[str, ...] = (),
    pre_commit=None,
) -> None:
    """The shared compaction body for partitionBy-laid-out stores (IVF
    cells, IVFPQ codes, the term index): anti-join ``drop_ids`` out of
    the live version, rewrite partition-preserving into a new version
    dir, flip the manifest.  ``broadcast_drops=False`` plans a shuffled
    anti-join for corpus-fraction drop sets — the same two-posture rule
    as every compaction here.

    ``pre_commit(new_root)``: optional hook invoked after the rewrite
    lands and BEFORE the manifest flips — the one correct place to
    regenerate a stats/params sidecar for the new version (a hook that
    raises leaves the old version live and the new dir orphaned, which
    commit_rewrite's begin/commit contract already tolerates)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    old_root = resolve_root(path)
    drops = drop_ids.select(F.col(drop_ids.columns[0]).alias(id_col))
    maybe_bc = broadcast if broadcast_drops else (lambda d: d)
    kept = read_pinned_parquet(spark, old_root).join(
        maybe_bc(drops), id_col, "left_anti"
    )
    cur, new_v, new_root = begin_rewrite(path)
    (
        kept.repartition(partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(new_root)
    )
    pin_schema(new_root, kept.schema, (partition_col,))
    if pre_commit is not None:
        pre_commit(new_root)
    commit_rewrite(path, cur, new_v, legacy_prefixes=legacy_prefixes)


def store_stats(path: str) -> dict:
    """Maintenance report for a versioned store, from FS METADATA only
    (no data read — the footer_bounds discipline): the live version,
    every version dir's file count and byte size, and whether legacy
    flat stores remain at the root.  What an OPTIMIZE/GC scheduler
    consults to decide when a rewrite pays for itself."""
    versions: dict[int, dict] = {}
    legacy: list[str] = []
    for name in sorted(os.listdir(path)):
        p = posixpath.join(path, name)
        if not os.path.isdir(p):
            continue
        m = _VDIR_RE.match(name)
        if not m:
            legacy.append(name)
            continue
        files = n_bytes = 0
        for root, _dirs, fnames in os.walk(p):
            for f in fnames:
                if f.endswith(".parquet"):
                    files += 1
                    n_bytes += os.path.getsize(os.path.join(root, f))
        versions[int(m.group(1))] = {"files": files, "bytes": n_bytes}
    return {
        "current": current_version(path),
        "versions": versions,
        "legacy_dirs": legacy,
    }


#: Read-back schema sidecar written next to a store's data files.
#: Leading underscore keeps it out of Spark's data-file listing (the
#: ``_SUCCESS`` convention).
SCHEMA_FILE = "_SCHEMA"


def readback_schema(written_schema, partition_cols: tuple[str, ...] = ()):
    """The schema ``spark.read.parquet`` would INFER for a store just
    written with ``written_schema`` (optionally ``partitionBy``-ed on
    ``partition_cols``) — constructed without reading any footer, so a
    writer can pin it as a sidecar and spare every later reader the
    schema-inference job (guide §6: a per-``spark.read`` driver job of
    ~0.1-0.3 s that a store-lifecycle query pays up to 9×).

    Rules mirrored from Spark's parquet read path, pinned per store by
    tests/test_store_schema_pin.py against actual inference:

    - data columns keep their written order and dtype;
    - partition columns move to the END (partition discovery appends
      them) and integral ones read back as ``IntegerType`` (partition
      TYPE inference parses the directory-name string, and every
      partition value in this repo's stores — band, ivf_cell, tb — is
      a small int).  Stores with >2^31 partition values would need a
      LongType pin; none exists here and the pin test would catch one.
    """
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    data = [
        T.StructField(f.name, f.dataType, f.nullable, f.metadata)
        for f in written_schema
        if f.name not in partition_cols
    ]
    parts = []
    for c in partition_cols:
        f = written_schema[c]
        t = T.IntegerType() if isinstance(f.dataType, integral) else f.dataType
        parts.append(T.StructField(c, t, True))
    return T.StructType(data + parts)


def pin_schema(
    data_dir: str, written_schema, partition_cols: tuple[str, ...] = ()
) -> None:
    """Persist the read-back schema of the store at ``data_dir`` so
    :func:`read_pinned_parquet` can skip footer inference.  Call AFTER
    the data write with the schema of the frame that was written (and
    the ``partitionBy`` columns, if any)."""
    import json
    import os

    os.makedirs(data_dir, exist_ok=True)
    schema = readback_schema(written_schema, partition_cols)
    tmp = posixpath.join(data_dir, SCHEMA_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(schema.jsonValue(), f)
    os.replace(tmp, posixpath.join(data_dir, SCHEMA_FILE))


def read_pinned_parquet(spark, data_dir: str):
    """``spark.read.parquet(data_dir)`` minus the schema-inference job
    when the writer pinned a ``_SCHEMA`` sidecar (guide §6 — predicate
    pushdown, partition discovery and pruning are unchanged; only the
    footer-read inference pass is skipped).  Stores written before
    pinning existed fall back to plain inference, so this is always
    safe to call on a store directory."""
    import json

    from pyspark.sql import types as T

    try:
        with open(posixpath.join(data_dir, SCHEMA_FILE)) as f:
            schema = T.StructType.fromJson(json.load(f))
    except FileNotFoundError:
        return spark.read.parquet(data_dir)
    return spark.read.schema(schema).parquet(data_dir)


def write_sidecar(root: str, filename: str, params: dict) -> None:
    """JSON params sidecar inside an ALREADY-RESOLVED version root —
    the shared writer every store's shape/stats pin goes through."""
    import json
    import os

    os.makedirs(root, exist_ok=True)
    with open(posixpath.join(root, filename), "w") as f:
        json.dump(params, f)


def read_sidecar(root: str, filename: str, kind: str) -> dict:
    """Sidecar from an ALREADY-RESOLVED version root.  Callers must
    resolve the store root ONCE and read sidecar + data from that same
    root — resolving separately per read races a concurrent rewrite
    (the store could flip versions between the two resolves).  Raises
    with the store ``kind`` in the message when missing: probing with
    guessed params is the silent-zero/undercount failure."""
    import json

    p = posixpath.join(root, filename)
    try:
        with open(p) as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"{kind} store at {root} has no {filename} sidecar — not a "
            f"{kind} store (or written by hand); refusing to guess params"
        ) from None


def bless_sidecar(path: str, filename: str, params: dict, kind: str) -> None:
    """One-shot migration for stores written BEFORE params pinning
    existed: writes the params sidecar into the store's CURRENT version
    root from caller-supplied params, so probe/append/compact stop
    refusing a legacy store without forcing a full rebuild.

    One refusal keeps this from becoming a footgun: an EXISTING pin is
    never overwritten (silently drifting a live pin is exactly the
    mis-score failure the sidecars exist to prevent — rebuild instead).
    Unversioned paths (no ``_CURRENT`` manifest) are accepted on
    purpose: the pre-manifest FLAT layout is precisely what a legacy
    store looks like, and resolve_root writes the pin into the flat dir
    itself, where flat-layout readers will find it.  The caller owns
    BOTH claims — that the path really is a store, and that ``params``
    match what it was built with; bless an empty dir or guessed params
    and every probe inherits the lie."""
    import json
    import os

    root = resolve_root(path)
    p = posixpath.join(root, filename)
    if os.path.exists(p):
        with open(p) as f:
            stored = json.load(f)
        raise ValueError(
            f"{kind} store at {path} already has a {filename} pin "
            f"({stored!r}) — bless_sidecar only migrates UNpinned "
            "legacy stores; rebuild the index to change params"
        )
    write_sidecar(root, filename, params)
