"""Generation compaction for batch-keyed state directories (VERDICT r11
task 5).

The continuous-curation loops persist their disk-resident state as
idempotent batch-keyed subdirectories — ``<root>/batch_id=N/...`` — one
per micro-batch (streaming/curation.py band index + ``_texts`` sidecar,
streaming/semantic_curation.py cell index, operators/dedup_index.py
appends). That layout is what makes foreachBatch replay idempotent, but
it grows one directory per micro-batch forever: the 64-batch probe
(SCALE_PROBE_r11_curation.json) already showed a gentle linear
listing/scan term, and a year-long stream would accumulate ~10^5 dirs.

:func:`compact_batch_dirs` folds the ``batch_id=N`` micro-batch
directories with ``N <= upto`` into ONE generation directory
``batch_id=<max folded>`` (marked ``_GEN``) — rewriting the same rows
as fewer, larger, better-sorted files. Folds are WINDOW-scoped by
default: a fold reads only the micro-batch dirs accrued since the last
fold, never prior generations, so per-fold I/O is O(window) — the
first full-history cut measurably hurt (see compact_batch_dirs
docstring). Readers
are unaffected: consumers use ``batch_id`` only in order comparisons
against the CURRENT batch id (``< b`` / ``<= b`` for history, ``== b``
for the new side), and compaction only touches ids strictly older than
any id that can still be replayed (the caller passes
``upto = current - keep_last`` with ``keep_last >= 1``; foreachBatch can
only replay the latest uncommitted id), so collapsing old ids onto
``upto`` preserves every comparison.

Crash safety (at no instant is any row unrecoverable):

1. write the compacted rows to ``_compact_tmp_<upto>`` (Spark overwrite
   → idempotent; ``_SUCCESS`` marks completion; a leading underscore
   keeps Spark's reader from listing it as data)
2. write a manifest ``_compact_manifest_<upto>.json`` naming the source
   dirs (tmp-file + ``os.rename`` → atomic)
3. delete the source ``batch_id=N`` dirs
4. rename tmp → ``batch_id=<upto>``
5. delete the manifest

Crash before 2: sources intact, orphan tmp swept next run (including a
stale ``.json.tmp`` manifest half-write). Crash in 3-4: the manifest
names exactly what remains to delete and the ``_SUCCESS`` marker proves
the tmp holds every row — :func:`recover_compaction` (called on entry)
finishes the protocol. Crash after 4: the tmp dir is gone, which proves
the rename happened, so recovery deletes any leftover sources EXCEPT
``batch_id=<upto>`` (that name is now the promoted generation — see
:func:`_finish`) and removes the manifest.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_BATCH_RE = re.compile(r"^batch_id=(-?\d+)$")
_MANIFEST_RE = re.compile(r"^_compact_manifest_(-?\d+)\.json$")


def list_batch_ids(path: str, skip_generations: bool = False) -> list[int]:
    """Sorted batch ids present as ``batch_id=N`` subdirs (os-level — no
    Spark job, this is the cheap listing the loops do per compaction
    check). ``skip_generations`` excludes dirs carrying the ``_GEN``
    marker (already-compacted generations)."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _BATCH_RE.match(name)
        if m and os.path.isdir(os.path.join(path, name)):
            if skip_generations and os.path.exists(
                os.path.join(path, name, "_GEN")
            ):
                continue
            out.append(int(m.group(1)))
    return sorted(out)


def _tmp_dir(path: str, upto: int) -> str:
    return os.path.join(path, f"_compact_tmp_{upto}")


def _manifest(path: str, upto: int) -> str:
    return os.path.join(path, f"_compact_manifest_{upto}.json")


def _finish(path: str, upto: int, sources: list[str]) -> None:
    """Steps 3-5: delete sources, promote tmp, drop manifest. Re-entrant:
    every step tolerates having already happened.

    CRITICAL (ADVICE r12, high): ``sources`` includes ``batch_id=<upto>``
    — the same NAME the tmp dir is promoted to in step 4. On a re-entry
    after a crash-post-rename, that path is no longer the source
    micro-batch dir but the freshly promoted generation holding every
    folded row; deleting it would be permanent data loss (tmp is gone, so
    the rename can't replay, and the manifest removal would erase the
    evidence). The tmp dir discriminates the two states exactly: the
    manifest is only ever written AFTER tmp+``_SUCCESS`` exist, and
    nothing but step 4's rename removes a complete tmp — so manifest
    present + tmp absent ⇔ the rename already happened ⇔ the target is
    the promoted generation. Skip its deletion in that state."""
    tmp = _tmp_dir(path, upto)
    target = os.path.join(path, f"batch_id={upto}")
    target_name = f"batch_id={upto}"
    renamed = not os.path.isdir(tmp)
    for name in sources:
        if renamed and name == target_name:
            continue  # promoted generation, not the source (see above)
        src = os.path.join(path, name)
        if os.path.isdir(src):
            shutil.rmtree(src)
    if os.path.isdir(tmp):
        os.rename(tmp, target)
    mf = _manifest(path, upto)
    if os.path.exists(mf):
        os.remove(mf)


def recover_compaction(path: str) -> None:
    """Finish (or discard) any compaction a crash interrupted. Safe to
    call unconditionally on loop entry; does nothing on a clean state."""
    if not os.path.isdir(path):
        return
    names = os.listdir(path)
    manifests = [m for n in names if (m := _MANIFEST_RE.match(n))]
    for m in manifests:
        upto = int(m.group(1))
        tmp = _tmp_dir(path, upto)
        if os.path.isdir(tmp) and not os.path.exists(
            os.path.join(tmp, "_SUCCESS")
        ):
            # manifest written but tmp incomplete: cannot happen in the
            # protocol order (manifest follows _SUCCESS) — treat as
            # corrupt tmp, keep sources, drop both
            shutil.rmtree(tmp)
            os.remove(_manifest(path, upto))
            continue
        with open(_manifest(path, upto)) as f:
            sources = json.load(f)["sources"]
        _finish(path, upto, sources)
    for n in os.listdir(path):
        # orphan tmp with no manifest: crashed before step 2 — the
        # sources are all intact, discard the tmp (complete or not)
        if n.startswith("_compact_tmp_") and os.path.isdir(
            os.path.join(path, n)
        ) and not os.path.exists(_manifest(path, int(n.rsplit("_", 1)[1]))):
            shutil.rmtree(os.path.join(path, n))
        # orphan manifest half-write (crash between writing the .tmp and
        # its atomic rename): the final manifest never existed, so the
        # sources are fully intact — plain deletion is safe (ADVICE r12)
        if (
            n.startswith("_compact_manifest_")
            and n.endswith(".json.tmp")
            and os.path.isfile(os.path.join(path, n))
        ):
            os.remove(os.path.join(path, n))


#: Target bytes per output file for folds (VERDICT r13 task 2): a fold
#: that coalesces a multi-hundred-MB window into ONE file collapses every
#: later reader of that generation to a single scan split — the probe
#: measured the first post-major-fold batch at 13.5 s vs a ~6 s median,
#: the same split-collapse mechanism bisect/PAIR_KERNEL_r13.md documents.
#: Folds therefore size their file count from the SOURCE bytes so a
#: folded generation keeps enough files for parallel readers; 16 MiB
#: keeps probe-scale generations multi-split while production-scale
#: generations (≫ maxPartitionBytes) split fine regardless.
FOLD_TARGET_FILE_BYTES = 16 << 20


def _dir_bytes(paths: list[str]) -> int:
    total = 0
    for p in paths:
        for root, _, files in os.walk(p):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def compact_batch_dirs(
    spark: SparkSession,
    path: str,
    upto: int,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    n_files: int = 1,
    min_dirs: int = 2,
    window_only: bool = True,
    post_fold=None,
) -> int:
    """Fold ``batch_id=N`` dirs with ``N <= upto`` into one
    ``batch_id=<max folded>`` generation dir (marked with a ``_GEN``
    sentinel file Spark ignores). Returns the number of source dirs
    folded (0 = nothing to do).

    ``window_only=True`` (the default, and the r12 A/B-driven fix) folds
    only NON-generation dirs — i.e. each fold rewrites just the tail
    window of micro-batch dirs accrued since the previous fold, O(window)
    I/O per fold, and prior generations are never re-read. The first cut
    of this module re-folded the ENTIRE history every time (O(corpus)
    rewrite per fold); the 64-batch A/B showed that churn costing more
    than the mild listing term it removes (bisect/COMPACTION_AB_r12.md).
    Dir count then grows as batches/compact_every — 10^5 micro-batches
    at the default cadence is ~6k generation dirs; if that ever
    dominates, a rare second-tier major fold is the same call with
    ``window_only=False``.

    ``partition_by`` preserves an inner hive level (the LSH index keeps
    ``band_id=*``); ``sort_within`` re-sorts rows within output files so
    row-group min/max stats stay tight (``band_hash`` / ``cell_id``);
    ``n_files`` floors the output file count. The EFFECTIVE file count
    is ``max(n_files, source_bytes / FOLD_TARGET_FILE_BYTES)`` (VERDICT
    r13 task 2): folding a large window into one file collapsed every
    later reader to a single scan split — the measured 13.5 s
    post-major-fold batch. Flat state coalesces to that many files;
    hive-partitioned state range-partitions on (inner key, sort key) so
    each partition dir splits into multiple sort-clustered files with
    tight row-group stats.

    ``post_fold`` (round 14), if given, is called with the completed tmp
    directory BEFORE the promotion manifest is written — the hook for
    per-directory sidecars that must travel with the generation (the LSH
    index's Bloom sketch). A crash between the spark write and the hook
    leaves an unmanifested tmp that recovery discards — the fold simply
    re-runs; a crash after the manifest promotes a generation WITH its
    sidecar already inside.

    The caller must guarantee no ``batch_id <= upto`` can be replayed or
    concurrently written (pass ``upto = current_batch - keep_last``,
    ``keep_last >= 1``, from within the single-writer foreachBatch loop).
    """
    recover_compaction(path)
    ids = [
        b
        for b in list_batch_ids(path, skip_generations=window_only)
        if b <= upto
    ]
    if len(ids) < min_dirs:
        return 0
    hi = max(ids)
    src_dirs = [os.path.join(path, f"batch_id={b}") for b in ids]
    # read ONLY the window dirs (never the root): prior generations are
    # not re-read, so per-fold I/O is O(window), not O(corpus). basePath
    # keeps partition discovery rooted (the sources are partition dirs,
    # possibly with an inner hive level of their own)
    df: DataFrame = spark.read.option("basePath", path).parquet(*src_dirs)
    if "batch_id" in df.columns:
        df = df.drop("batch_id")
    tmp = _tmp_dir(path, hi)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    n_eff = max(
        n_files, -(-_dir_bytes(src_dirs) // FOLD_TARGET_FILE_BYTES)
    )
    if partition_by:
        # range-partition on (inner key, sort key): whole partition dirs
        # stay together when n_eff is small; large windows split each
        # dir into several sort-clustered files
        writer = df.repartitionByRange(
            n_eff, *(partition_by + (sort_within or []))
        )
    else:
        writer = df.coalesce(n_eff)
    if sort_within:
        writer = writer.sortWithinPartitions(*sort_within)
    w = writer.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    assert os.path.exists(os.path.join(tmp, "_SUCCESS"))
    # generation marker: window folds skip this dir forever after
    # (written before the manifest, so a recovered fold keeps it)
    with open(os.path.join(tmp, "_GEN"), "w") as f:
        f.write("")
    if post_fold is not None:
        post_fold(tmp)
    sources = [f"batch_id={b}" for b in ids]
    mf_tmp = _manifest(path, hi) + ".tmp"
    with open(mf_tmp, "w") as f:
        json.dump({"upto": hi, "sources": sources}, f)
    os.rename(mf_tmp, _manifest(path, hi))
    _finish(path, hi, sources)
    return len(ids)
