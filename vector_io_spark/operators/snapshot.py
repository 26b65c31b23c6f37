"""Point-in-time snapshot / restore for persisted catalog layouts
(raw-IVF, IVF-SQ8, IVFPQ, exact-PQ, token indexes — anything shaped
"root dir with artifact subdirs + maintenance markers").

Reference parity: the reference's targets all expose collection
snapshots/backups (Qdrant snapshot API, Milvus backup, Pinecone
collections); the reference itself round-trips stores by full
re-export. Here a snapshot is a CONSISTENT copy of the layout taken
under the same ``_MAINT`` mutex the maintenance ops use, so no
append / compaction / delete can mutate the tree mid-copy — and the
copy includes the `_DELTA-<token>` commit ledgers and live tombstones,
so a restored store resumes exactly-once append semantics and
delete visibility exactly where the snapshot was cut.

Integrity contract: `_SNAPSHOT_MANIFEST.json` records every copied
file's relative path and byte size; :func:`verify_snapshot` (also run
automatically by :func:`restore_index`) re-walks the snapshot against
it. Size+name is the distcp-grade check — content hashing would read
every byte twice at 100 TB; if end-to-end hashing is required, wrap
the copy primitive.

Scale shape: pure filesystem metadata + file copies through the
Hadoop FS API (works on HDFS / S3A / local identically) — no Spark
jobs, nothing corpus-sized through the driver; bytes move
FS-to-FS. The snapshot stages into ``<snap_dir>.tmp-<pid>`` and
RENAMES to ``snap_dir``. The publish rename is atomic only on
HDFS/local; on S3A a directory rename is a per-file copy, so a
concurrent reader CAN observe a partially-published tree — on object
stores, ALWAYS gate consumption on :func:`verify_snapshot` (which
:func:`restore_index` runs automatically); a partial tree fails the
manifest check. The source mutex is heartbeat-refreshed during long
copies so a 100 TB snapshot is not reaped as a crashed holder.
"""

from __future__ import annotations

import json

from vector_io_spark.operators.similarity import (
    _refresh_maint_marker,
    _take_maint_marker,
)

MANIFEST_NAME = "_SNAPSHOT_MANIFEST.json"
# heartbeat the source maintenance lock every N copied files
_HEARTBEAT_EVERY = 50


def _fs_for(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _walk_files(fs, jvm, root: str) -> dict[str, int]:
    """All non-transient files under ``root`` as {relative_path: size}.
    Transient = any path component starting with '.' (staging dirs,
    clock probes — Spark's own readers ignore these) or a maintenance
    lock (`_MAINT-*`, held by US during a snapshot). Ledger files
    (`_DELTA-*`) and tombstones are NOT transient — they are the
    maintenance state a restore must reproduce."""
    root_p = jvm.org.apache.hadoop.fs.Path(root)
    root_uri = fs.makeQualified(root_p).toString().rstrip("/")
    out: dict[str, int] = {}
    it = fs.listFiles(root_p, True)
    while it.hasNext():
        st = it.next()
        uri = st.getPath().toString()
        rel = uri[len(root_uri) + 1:]
        parts = rel.split("/")
        if any(c.startswith(".") for c in parts):
            continue
        if parts[-1].startswith("_MAINT-"):
            continue
        out[rel] = int(st.getLen())
    return out


def _refuse_streaming_state(fs, jvm, index_root: str) -> None:
    """Raise if any directory under ``index_root`` (recursively) carries
    streaming-ingest state a snapshot cannot capture consistently:
    a ``_LIVE-*`` per-batch lease (mid-write or crashed mid-write), or
    a ``_STREAM-*`` lineage marker alongside unfolded
    ``ingest_batch>=0`` partitions (an attached stream can start a new
    batch between leases — mid-copy writes would tear the snapshot).

    One recursive file walk — directory-listing cost, same order as
    the manifest walk the snapshot does anyway."""
    root_p = jvm.org.apache.hadoop.fs.Path(index_root)
    root_uri = fs.makeQualified(root_p).toString().rstrip("/")
    stream_dirs: set[str] = set()
    live_batch_dirs: set[str] = set()
    it = fs.listFiles(root_p, True)
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toString()[len(root_uri) + 1:]
        parts = rel.split("/")
        name = parts[-1]
        if name.startswith("_LIVE-"):
            raise RuntimeError(
                f"snapshot_index: {index_root} carries a streaming "
                f"ingest lease ({rel}) — quiesce the stream (or clear "
                "stale leases via its compactor) before cutting a "
                "snapshot; a mid-batch cut would capture half-written "
                "partitions."
            )
        parent = "/".join(parts[:-1])
        if name.startswith("_STREAM-"):
            stream_dirs.add(parent)
        for i, comp in enumerate(parts[:-1]):
            if comp.startswith("ingest_batch="):
                try:
                    bid = int(comp.split("=", 1)[1])
                except ValueError:
                    continue
                if bid >= 0:
                    live_batch_dirs.add("/".join(parts[:i]))
    racy = sorted(stream_dirs & live_batch_dirs)
    if racy:
        where = racy[0] or "<root>"
        raise RuntimeError(
            f"snapshot_index: {index_root} has a stream attached at "
            f"'{where}' (_STREAM-* marker) with unfolded "
            "ingest_batch>=0 partitions — the stream can start a new "
            "micro-batch during the copy (leases are released between "
            "batches), tearing the snapshot. Stop the stream and fold "
            "it with compact_neardup_index(keep_latest=False) first."
        )


def snapshot_index(spark, index_root: str, snap_dir: str) -> dict:
    """Cut a consistent snapshot of ``index_root`` into ``snap_dir``
    (see module docstring). Refuses if ``snap_dir`` exists (snapshots
    are immutable — pick a new name per cut) and while another
    maintenance op holds the store's mutex (loud RuntimeError, same
    contract as append/compaction). Returns the manifest dict."""
    jvm, _, src_fs = _fs_for(spark, index_root)
    _, snap_p, dst_fs = _fs_for(spark, snap_dir)
    if dst_fs.exists(snap_p):
        raise ValueError(
            f"snapshot_index: {snap_dir} already exists — snapshots are "
            "immutable; cut each one into a fresh directory."
        )
    # the _MAINT mutex serializes against the STATIC catalogs' appends /
    # compactions, but the batch-partitioned STREAMING stores coordinate
    # through per-batch _LIVE-* leases instead — a snapshot cut mid-batch
    # would record half-written ingest partitions as valid. The leases
    # are NOT always at the root: streaming_ivfpq_ingest guards
    # {root}/cells and the sparse ingest guards {root}/postings
    # (incremental.py:1319,1563), so scan the WHOLE tree (ADVICE r9).
    # Two refusals:
    #   1. any _LIVE-* lease anywhere (fresh or stale) — a micro-batch
    #      is (or died) mid-write;
    #   2. a _STREAM-* lineage marker coexisting with unfolded
    #      ingest_batch>=0 partitions under the same directory — the
    #      lease is deleted at the END of every successful micro-batch,
    #      so an ATTACHED stream can start a new batch during the copy;
    #      between-batch lease absence makes check #1 alone racy. A
    #      marker over a fully-folded store (only ingest_batch=-1) is
    #      allowed — quiesce + compact_neardup_index is the documented
    #      pre-snapshot step for streaming stores.
    _refuse_streaming_state(src_fs, jvm, index_root)
    lock = _take_maint_marker(spark, index_root, "snapshot_index")
    try:
        files = _walk_files(src_fs, jvm, index_root)
        if not files:
            raise ValueError(
                f"snapshot_index: {index_root} has no catalog files"
            )
        import os as _os

        tmp = f"{snap_dir}.tmp-{_os.getpid()}"
        tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
        dst_fs.delete(tmp_p, True)
        conf = spark._jsc.hadoopConfiguration()
        for i, rel in enumerate(sorted(files)):
            src = jvm.org.apache.hadoop.fs.Path(f"{index_root}/{rel}")
            dst = jvm.org.apache.hadoop.fs.Path(f"{tmp}/{rel}")
            dst_fs.mkdirs(dst.getParent())
            ok = jvm.org.apache.hadoop.fs.FileUtil.copy(
                src_fs, src, dst_fs, dst, False, conf
            )
            if not ok:
                raise RuntimeError(
                    f"snapshot_index: copy failed for {rel}"
                )
            if (i + 1) % _HEARTBEAT_EVERY == 0:
                _refresh_maint_marker(spark, lock, "snapshot_index")
        manifest = {"source_root": index_root, "files": files,
                    "n_files": len(files)}
        mf = dst_fs.create(
            jvm.org.apache.hadoop.fs.Path(f"{tmp}/{MANIFEST_NAME}"), True
        )
        mf.write(bytearray(json.dumps(manifest, sort_keys=True).encode()))
        mf.close()
        if not dst_fs.rename(tmp_p, snap_p):
            raise RuntimeError(
                f"snapshot_index: atomic publish rename to {snap_dir} "
                "failed (concurrent snapshot into the same dir?)"
            )
        return manifest
    finally:
        src_fs.delete(lock, False)


def verify_snapshot(spark, snap_dir: str) -> dict:
    """Re-walk ``snap_dir`` against its manifest: every manifest file
    must exist with the recorded size, and no unmanifested catalog file
    may appear (a partial overwrite corrupts silently otherwise).
    Returns the manifest on success, raises ValueError on any drift."""
    jvm, snap_p, fs = _fs_for(spark, snap_dir)
    mpath = jvm.org.apache.hadoop.fs.Path(f"{snap_dir}/{MANIFEST_NAME}")
    if not fs.exists(mpath):
        raise ValueError(
            f"verify_snapshot: {snap_dir} has no {MANIFEST_NAME}"
        )
    stream = fs.open(mpath)
    try:
        raw = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    manifest = json.loads(raw.decode())
    actual = _walk_files(fs, jvm, snap_dir)
    actual.pop(MANIFEST_NAME, None)
    want = manifest["files"]
    missing = sorted(set(want) - set(actual))
    extra = sorted(set(actual) - set(want))
    wrong = sorted(
        r for r in set(want) & set(actual) if want[r] != actual[r]
    )
    if missing or extra or wrong:
        raise ValueError(
            f"verify_snapshot: {snap_dir} does not match its manifest — "
            f"missing={missing[:3]} extra={extra[:3]} "
            f"size-mismatch={wrong[:3]} "
            f"({len(missing)}/{len(extra)}/{len(wrong)} total)"
        )
    return manifest


def restore_index(
    spark, snap_dir: str, dest_root: str, overwrite: bool = False
) -> dict:
    """Restore a verified snapshot into ``dest_root``. Refuses an
    existing destination unless ``overwrite=True`` (then replaces it
    wholesale). The copy stages into a hidden ``.restore-tmp`` sibling
    (never adoptable as a layout); the destination's ``_MAINT`` mutex
    is taken only for the final SWAP, which excludes a concurrent
    append/compaction from adopting a half-swapped layout. Probes of
    the old layout keep working through the copy, but between the two
    publish renames ``dest_root`` briefly does not exist (sub-second
    on HDFS/local, longer on S3A where renames copy per-file) — a
    probe landing in that window errors with path-not-found and
    should simply retry; it can never read a MIXED old/new layout."""
    manifest = verify_snapshot(spark, snap_dir)
    jvm, snap_p, snap_fs = _fs_for(spark, snap_dir)
    _, dest_p, dest_fs = _fs_for(spark, dest_root)
    if dest_fs.exists(dest_p):
        if not overwrite:
            raise ValueError(
                f"restore_index: {dest_root} exists — pass "
                "overwrite=True to replace it wholesale."
            )
    import os as _os

    tmp = f"{dest_root}.restore-tmp-{_os.getpid()}"
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    dest_fs.delete(tmp_p, True)
    conf = spark._jsc.hadoopConfiguration()
    try:
        for rel in sorted(manifest["files"]):
            src = jvm.org.apache.hadoop.fs.Path(f"{snap_dir}/{rel}")
            dst = jvm.org.apache.hadoop.fs.Path(f"{tmp}/{rel}")
            dest_fs.mkdirs(dst.getParent())
            if not jvm.org.apache.hadoop.fs.FileUtil.copy(
                snap_fs, src, dest_fs, dst, False, conf
            ):
                raise RuntimeError(f"restore_index: copy failed for {rel}")
        if dest_fs.exists(dest_p):
            # exclude concurrent maintenance on the OLD layout for the
            # swap (a fresh lock on the destination raises here)
            lock = _take_maint_marker(spark, dest_root, "restore_index")
            try:
                aside = jvm.org.apache.hadoop.fs.Path(
                    f"{dest_root}.replaced-{_os.getpid()}"
                )
                dest_fs.delete(aside, True)
                if not dest_fs.rename(dest_p, aside):
                    raise RuntimeError(
                        f"restore_index: could not move the old layout "
                        f"of {dest_root} aside"
                    )
                if not dest_fs.rename(tmp_p, dest_p):
                    # put the old layout back — restore failed, store
                    # intact
                    dest_fs.rename(aside, dest_p)
                    raise RuntimeError(
                        f"restore_index: publish rename to {dest_root} "
                        "failed"
                    )
                dest_fs.delete(aside, True)
            finally:
                # the lock lived in the OLD root (moved aside / deleted
                # with it); delete defensively wherever it still exists
                dest_fs.delete(lock, False)
        else:
            if not dest_fs.rename(tmp_p, dest_p):
                raise RuntimeError(
                    f"restore_index: publish rename to {dest_root} failed"
                )
    finally:
        # a successful publish renamed tmp away; anything still here is
        # a failed run's staging — never leak it (a LATER run with a
        # different pid would otherwise never clean it up)
        dest_fs.delete(tmp_p, True)
    return manifest
