"""Lakehouse transaction log — versioned commits, snapshots, pruning.

A from-scratch implementation of the public lakehouse-log design
(the Delta Lake PROTOCOL.md action model, re-expressed — no code or
wire compatibility claimed): a table is a sequence of numbered
commits, each a JSON-lines file of actions:

* ``metaData`` — table identity + schema (required in version 0);
* ``add`` — a data file entering the snapshot, carrying its size,
  row count, and per-column min/max stats (the scan-pruning hook);
* ``remove`` — a file leaving the snapshot (compaction, deletes);
* ``commitInfo`` — operational breadcrumbs, semantically inert.

``replay`` folds commits in version order into a Snapshot (path ->
add action; re-adding a live path replaces it, removing an unknown
path is an error).  ``checkpoint_bytes`` serializes a snapshot as an
Avro OCF through ``core/avrocodec.py`` — the same move real logs make
(parquet checkpoints) so readers resume from checkpoint + tail
instead of genesis; ``replay(checkpoint=...)`` must produce the same
snapshot either way (asserted by callers and the unit suite).
``prune`` answers range predicates from stats alone — the reason the
log exists at 100 TB: planning touches kilobytes of metadata, never
the data files.
"""

from __future__ import annotations

import json

from .avrocodec import encode_avro_ocf, parse_avro_ocf
from .errors import DBPSInvalidInputError

MAX_COMMIT_BYTES = 1 << 26


class TxnLogError(DBPSInvalidInputError):
    """Malformed or inconsistent transaction-log content."""


_CHECKPOINT_SCHEMA = {
    "type": "record",
    "name": "add_file",
    "fields": [
        {"name": "path", "type": "string"},
        {"name": "size", "type": "long"},
        {"name": "num_records", "type": "long"},
        {"name": "stats_json", "type": "string"},
    ],
}


class Snapshot:
    """Live file set + table metadata at one log version."""

    def __init__(self):
        self.metadata = None
        self.files: dict = {}
        self.version = -1

    @property
    def num_files(self) -> int:
        return len(self.files)

    @property
    def num_records(self) -> int:
        return sum(a["num_records"] for a in self.files.values())


def encode_commit(actions: list) -> bytes:
    """Action dicts -> one JSON-lines commit file."""
    lines = []
    for a in actions:
        if len(a) != 1 or next(iter(a)) not in (
            "metaData",
            "add",
            "remove",
            "commitInfo",
        ):
            raise TxnLogError(f"action must wrap one known key: {a!r}")
        lines.append(json.dumps(a, separators=(",", ":"), sort_keys=True))
    if not lines:
        raise TxnLogError("refusing an empty commit")
    return ("\n".join(lines) + "\n").encode("utf-8")


def decode_commit(data: bytes) -> list:
    if len(data) > MAX_COMMIT_BYTES:
        raise TxnLogError("commit file over the size cap")
    try:
        text = bytes(data).decode("utf-8")
    except UnicodeDecodeError as e:
        raise TxnLogError(f"commit is not UTF-8: {e}") from None
    actions = []
    for ln, line in enumerate(text.splitlines()):
        if not line.strip():
            continue
        try:
            a = json.loads(line)
        except ValueError as e:
            raise TxnLogError(f"line {ln}: bad JSON: {e}") from None
        if not isinstance(a, dict) or len(a) != 1:
            raise TxnLogError(f"line {ln}: action must wrap one key")
        kind, body = next(iter(a.items()))
        if kind not in ("metaData", "add", "remove", "commitInfo"):
            raise TxnLogError(f"line {ln}: unknown action {kind!r}")
        if not isinstance(body, dict):
            raise TxnLogError(f"line {ln}: action body must be a map")
        if kind == "add":
            for req in ("path", "size", "num_records", "stats"):
                if req not in body:
                    raise TxnLogError(f"line {ln}: add missing {req!r}")
            if (
                not isinstance(body["size"], int)
                or not isinstance(body["num_records"], int)
                or body["size"] < 0
                or body["num_records"] < 0
            ):
                raise TxnLogError(f"line {ln}: add counters invalid")
        if kind == "remove" and "path" not in body:
            raise TxnLogError(f"line {ln}: remove missing path")
        actions.append(a)
    if not actions:
        raise TxnLogError("commit holds no actions")
    return actions


def checkpoint_bytes(snap: Snapshot) -> bytes:
    """Snapshot -> Avro OCF checkpoint (deterministic path order)."""
    rows = [
        {
            "path": path,
            "size": add["size"],
            "num_records": add["num_records"],
            "stats_json": json.dumps(
                add["stats"], separators=(",", ":"), sort_keys=True
            ),
        }
        for path, add in sorted(snap.files.items())
    ]
    meta_row = {
        "path": "\x00metaData",
        "size": 0,
        "num_records": 0,
        "stats_json": json.dumps(
            snap.metadata or {}, separators=(",", ":"), sort_keys=True
        ),
    }
    return encode_avro_ocf(
        [meta_row] + rows, _CHECKPOINT_SCHEMA, codec="deflate"
    )


def _snapshot_from_checkpoint(data: bytes, version: int) -> Snapshot:
    snap = Snapshot()
    snap.version = version
    for row in parse_avro_ocf(data)["records"]:
        try:
            stats = json.loads(row["stats_json"])
        except ValueError as e:
            raise TxnLogError(f"checkpoint stats: {e}") from None
        if row["path"] == "\x00metaData":
            snap.metadata = stats
            continue
        snap.files[row["path"]] = {
            "path": row["path"],
            "size": row["size"],
            "num_records": row["num_records"],
            "stats": stats,
        }
    return snap


def replay(
    commits: list,
    *,
    start_version: int = 0,
    checkpoint: bytes | None = None,
    checkpoint_version: int = -1,
) -> Snapshot:
    """Fold commit files (bytes, ordered) into a Snapshot.

    With ``checkpoint``, replay resumes from ``checkpoint_version``
    and ``commits`` must hold exactly the tail that follows it."""
    if checkpoint is not None:
        snap = _snapshot_from_checkpoint(checkpoint, checkpoint_version)
        version = checkpoint_version
    else:
        snap = Snapshot()
        version = start_version - 1
    for blob in commits:
        version += 1
        seen_paths = set()
        for action in decode_commit(blob):
            kind, body = next(iter(action.items()))
            if kind == "metaData":
                snap.metadata = body
            elif kind == "add":
                path = body["path"]
                if path in seen_paths:
                    raise TxnLogError(
                        f"version {version}: duplicate path {path!r} "
                        "in one commit"
                    )
                seen_paths.add(path)
                snap.files[path] = body
            elif kind == "remove":
                path = body["path"]
                if path in seen_paths:
                    raise TxnLogError(
                        f"version {version}: add+remove of {path!r} "
                        "in one commit"
                    )
                seen_paths.add(path)
                if path not in snap.files:
                    raise TxnLogError(
                        f"version {version}: remove of unknown "
                        f"path {path!r}"
                    )
                del snap.files[path]
        snap.version = version
    if snap.metadata is None:
        raise TxnLogError("log defines no table metaData")
    return snap


def prune(snap: Snapshot, column: str, lo, hi) -> list:
    """Files whose [min, max] stats MAY intersect [lo, hi] — the
    candidate set a scan planner reads; files without stats for the
    column stay candidates (pruning must never drop unknowns)."""
    out = []
    for path, add in sorted(snap.files.items()):
        stats = add.get("stats", {})
        mins = stats.get("minValues", {})
        maxs = stats.get("maxValues", {})
        if column in mins and column in maxs:
            if maxs[column] < lo or mins[column] > hi:
                continue
        out.append(path)
    return out
