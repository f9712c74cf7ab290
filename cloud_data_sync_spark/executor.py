"""Copy/delete execution: the reference's per-object streaming copy loop
(sync.go:130-163) and delete phase (sync.go:199-234), distributed.

The action plan (``sync.sync_diff``) is a DataFrame; execution maps each
partition through a Python worker that copies/deletes its objects and emits
one status row per object — the reference's continue-on-error counters
(sync.go:137,155,161) become a *result DataFrame* feeding the state upsert.

Scale notes:
- Payloads stream chunk-by-chunk (``shutil.copyfileobj``) — the reference's
  v0.2.0 fix (CHANGELOG.md:18-23), and never the ``io.ReadAll`` buffering
  its AWS/Azure clients still do (aws/client.go:174-186). Memory per task is
  one 1 MiB chunk regardless of object size; no 2 GB binaryFile ceiling.
- A latent reference bug is deliberately NOT replicated: ``defer
  reader.Close()`` inside its object loop (sync.go:142) leaks all readers
  until function exit; here each file handle closes per object.
- ``repartition(n)`` spreads objects across executors; per-object failures
  never fail the task (try/except per row).
- Local/file: paths use direct OS streams. For s3a/gs/abfss, executors
  would use the same code over a FUSE mount, or cloud SDKs via
  ``opener``/``deleter`` injection — the control flow is identical.
"""

from __future__ import annotations

import mimetypes
import os
import shutil
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame

from cloud_data_sync_spark.sync import (
    ACTION_COPY,
    ACTION_DELETE,
    STATUS_FAILED_GET,
    STATUS_FAILED_UPLOAD,
    STATUS_SUCCESS,
)

RESULT_SCHEMA = (
    "mapping_id string, object_name string, action string, status string, "
    "error string, size long, last_modified timestamp, etag string, "
    "content_type string, metadata map<string,string>, last_synced timestamp"
)

CHUNK = 1024 * 1024

# The status vocabulary lives in sync.py (sync_diff's retry predicate
# compares against the same literals these rows are written with — one
# definition, no drift). Delete-phase status is executor-only.
STATUS_FAILED_DELETE = "failed_delete"


def _copy_one(src_path: str, dst_path: str) -> tuple[str, str | None]:
    """Stream one object; distinguishes read vs write failure exactly as the
    reference's status machine does (sync.go:137 failed_get / :155
    failed_upload)."""
    try:
        fin = open(src_path, "rb")
    except OSError as e:
        return STATUS_FAILED_GET, str(e)
    # fin closes on EVERY write-side path: makedirs sits inside the
    # with-block so a failure there (read-only mount, ENOSPC) cannot leak
    # the descriptor — a task grinding through thousands of rows against a
    # broken target would otherwise hit EMFILE and poison healthy copies
    try:
        with fin:
            os.makedirs(os.path.dirname(dst_path), exist_ok=True)
            with open(dst_path, "wb") as fout:
                shutil.copyfileobj(fin, fout, CHUNK)
    except OSError as e:
        return STATUS_FAILED_UPLOAD, str(e)
    return STATUS_SUCCESS, None


def _as_meta_dict(cell) -> dict[str, str]:
    """Normalize a plan row's metadata cell: Arrow hands MapType to pandas
    as a dict or a list of (k, v) tuples depending on version; absent/null
    cells arrive as None/NaN."""
    if isinstance(cell, dict):
        return cell
    if isinstance(cell, (list, tuple)):
        return dict(cell)
    return {}


def _apply_object_meta(
    dst_path: str, content_type: str | None, metadata: dict[str, str]
) -> None:
    """Re-apply content type + user metadata on the uploaded object — the
    reference's UploadObject(..., contentType) and ObjectInfo.Metadata
    carry-through (gcp/client.go:107-138; interfaces/provider.go:16). On a
    local target the durable form is ``user.*`` xattrs (the same ones
    ``listing.object_meta_local`` reads back, so list→copy→list round-trips);
    best-effort — filesystems without xattr support keep the payload copy."""
    from cloud_data_sync_spark.sources.listing import CONTENT_TYPE_XATTR

    # Clear whatever user.* attrs a previous copy left: an overwrite reuses
    # the inode (open 'wb' truncates in place), so without this a key
    # REMOVED on the source would survive on the target and the next
    # list→reconcile pass would see phantom metadata the state row (which
    # records the new, smaller map) disagrees with.
    try:
        for existing in os.listxattr(dst_path):
            if existing.startswith("user."):
                try:
                    os.removexattr(dst_path, existing)
                except OSError:
                    pass
    except OSError:
        pass
    # Content type first: it is the attribute the reference's upload
    # signature carries explicitly (gcp/client.go:107), so a partial
    # failure mid-list must not drop it.
    items = [(CONTENT_TYPE_XATTR, content_type)] if content_type else []
    items += [(f"user.{k}", v) for k, v in metadata.items()]
    for name, val in items:
        try:
            os.setxattr(dst_path, name, str(val).encode("utf-8"))
        except OSError:
            # per-attr best effort: one oversized value (E2BIG) must not
            # abort the remaining attrs; unsupported filesystems
            # (ENOTSUP on every call) degrade to payload-only copies
            continue


def _delete_one(dst_path: str) -> tuple[str, str | None]:
    """Delete one target object; absent object counts as success (the
    Azure 404-tolerance, azure/client.go:168-170)."""
    try:
        os.remove(dst_path)
        return STATUS_SUCCESS, None
    except FileNotFoundError:
        return STATUS_SUCCESS, None
    except OSError as e:
        return STATUS_FAILED_DELETE, str(e)


def execute_plan(plan: DataFrame, src_root: str, tgt_root: str, parallelism: int = 0) -> DataFrame:
    """Run copy/delete actions; returns the per-object result DataFrame.

    Lazy like any DataFrame — materialize once (e.g. ``.cache().count()``)
    then feed the rows where action='copy' into ``state.upsert`` and the
    delete successes into ``state.delete_keys``."""
    for root in (src_root, tgt_root):
        scheme = root.split("://", 1)[0] if "://" in root else None
        if scheme not in (None, "file"):
            # this executor's copy/delete primitives are local-FS ops; an
            # s3a:// path handed to os.remove raises FileNotFoundError,
            # which the 404-tolerance would record as delete_success —
            # phantom successes that delete state keys while the target
            # objects survive (the next tick re-lists and re-"deletes"
            # them forever). Refuse instead of corrupting state.
            raise ValueError(
                f"execute_plan got a {scheme!r}-scheme root {root!r}: the "
                "streaming executor performs LOCAL file I/O only — run "
                "object-store mappings through a cloud-capable executor "
                "(distributed binaryFile copy mode) or a file: staging root"
            )
    work = plan.filter(plan.action.isin(ACTION_COPY, ACTION_DELETE))
    if parallelism:
        work = work.repartition(parallelism)

    src_local = src_root.replace("file://", "").rstrip("/")
    tgt_local = tgt_root.replace("file://", "").rstrip("/")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                now = datetime.now(timezone.utc).replace(tzinfo=None)
                name = row.object_name
                content_type = None
                metadata: dict[str, str] = {}
                if row.action == ACTION_COPY:
                    dst = os.path.join(tgt_local, name)
                    status, err = _copy_one(os.path.join(src_local, name), dst)
                    # Content type: prefer the source catalog's (xattr/cloud
                    # HEAD), fall back to extension sniffing — the reference
                    # stores ContentType per object (database.go:144-157)
                    # and re-uploads with it (gcp/client.go:107-138).
                    ct_cell = getattr(row, "content_type", None)
                    content_type = (
                        ct_cell
                        if isinstance(ct_cell, str) and ct_cell
                        else mimetypes.guess_type(name)[0]
                    )
                    metadata = _as_meta_dict(getattr(row, "metadata", None))
                    if status == STATUS_SUCCESS:
                        _apply_object_meta(dst, content_type, metadata)
                else:
                    status, err = _delete_one(os.path.join(tgt_local, name))
                out.append(
                    {
                        "mapping_id": row.mapping_id,
                        "object_name": name,
                        "action": row.action,
                        "status": status,
                        "error": err,
                        "size": getattr(row, "size", None),
                        "last_modified": getattr(row, "last_modified", None),
                        "etag": getattr(row, "etag", None),
                        "content_type": content_type,
                        "metadata": metadata,
                        "last_synced": now,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "mapping_id",
                    "object_name",
                    "action",
                    "status",
                    "error",
                    "size",
                    "last_modified",
                    "etag",
                    "content_type",
                    "metadata",
                    "last_synced",
                ],
            )

    return work.mapInPandas(_run, schema=RESULT_SCHEMA)
