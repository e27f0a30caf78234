"""Multi-table TRANSACTIONS: consistent catalog snapshots over ACID tables.

A single ACID table gives snapshot isolation per table; pipelines that
maintain DERIVED tables (a fact table plus its rollup MV, a dimension plus
its index) need the pair to advance together — a reader joining fact@new
against mv@old silently double- or under-counts. Table formats punt here
(Iceberg/Delta are single-table transactional; multi-table consistency is
what Nessie/lakeFS-style transactional catalogs add on top). This module is
that catalog layer, reusing the exact manifest-link commit protocol of
sources/acid.py one level up:

- A CATALOG VERSION is a JSON manifest mapping table names to PINNED
  (table_root, table_version) pairs.
- ``catalog_commit`` publishes a new catalog version atomically (os.link,
  loser-retries) AFTER the member tables' own commits have landed: a crash
  between a member commit and the catalog commit leaves the member table
  advanced but UNREFERENCED — every catalog reader keeps the last
  consistent pair, and the next successful transaction simply references
  newer member versions.
- ``catalog_read`` resolves a name through a catalog version and reads the
  member at its PINNED version — never "latest", so concurrent member
  commits (even committed ones) are invisible until a catalog commit
  references them. Cross-table reads through one catalog version are
  mutually consistent by construction.
- Every commit TAGS each member at its pinned version (tags are vacuum
  retention pins — sources/acid.acid_vacuum keeps tagged snapshots), so a
  member vacuum can never delete files a live catalog version still
  references; ``catalog_expire`` drops old catalog versions and releases
  their tags to the next vacuum.

Scale shape: catalog commits are one tiny JSON link + one tag link per
member — METADATA-scale regardless of table size; reads add a single
manifest resolution on top of acid_read's normal path.

Crash window: a committer dying between its member tags and its catalog
link leaves attempt-unique pins on the members (harmless to correctness —
they only delay vacuum of those snapshots); release them with
``acid_untag`` if a crashed attempt's tag shows up in ``acid_tags``.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .acid import (
    CommitConflict,
    acid_read,
    acid_tag,
    acid_untag,
    _manifest_path,  # member-version existence checks
)

_CAT = "_catalog"


def _cat_dir(catalog_root: str) -> str:
    return os.path.join(catalog_root, _CAT, "manifests")


def _cat_path(catalog_root: str, version: int) -> str:
    return os.path.join(_cat_dir(catalog_root), f"v{version:012d}.json")


def _cat_id(catalog_root: str) -> str:
    """Stable 8-hex catalog identity (tag-name namespace) from the
    catalog's real path."""
    real = os.path.realpath(catalog_root)
    return hashlib.md5(real.encode()).hexdigest()[:8]


def _member_tag(catalog_root: str, catalog_version: int,
                attempt: str) -> str:
    """Attempt-unique pin name: two committers racing on the same catalog
    version can never collide on (and certainly never replace) each
    other's member tags — the loser releases exactly its own pins. The
    winning manifest records its attempt id so expire can find them."""
    return f"__cat_{_cat_id(catalog_root)}_v{catalog_version}_{attempt}"


def catalog_versions(catalog_root: str) -> list[int]:
    d = _cat_dir(catalog_root)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def catalog_latest(catalog_root: str) -> int:
    vs = catalog_versions(catalog_root)
    return vs[-1] if vs else 0


def catalog_tables(
    catalog_root: str, version: int | None = None,
) -> dict[str, tuple[str, int]]:
    """{name: (table_root, pinned_version)} at a catalog snapshot."""
    v = catalog_latest(catalog_root) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"catalog {catalog_root} has no commits")
    with open(_cat_path(catalog_root, v)) as fh:
        m = json.load(fh)
    if not m.get("committed"):
        raise RuntimeError(
            f"catalog manifest v{v} of {catalog_root} lacks the committed "
            "marker"
        )
    return {
        name: (t["root"], t["version"]) for name, t in m["tables"].items()
    }


def catalog_commit(
    catalog_root: str,
    tables: dict[str, tuple[str, int]],
    max_retries: int = 10,
) -> int:
    """Atomically publish a consistent snapshot {name: (root, version)}.

    Call AFTER every member table's own commit has returned its version —
    this only LINKS existing member versions, never writes data. Each
    member version is tagged (vacuum retention pin) BEFORE the catalog
    link goes live, so there is no window where a published catalog
    version references a vacuumable snapshot. On a version race the loser
    re-reads the latest catalog version and retries with the SAME member
    pins (last-writer-wins catalogs; transactions serializing member
    updates is the member tables' optimistic-commit job).
    """
    for name, (root, v) in tables.items():
        if not os.path.exists(_manifest_path(root, v)):
            raise FileNotFoundError(
                f"catalog member {name!r}: no manifest v{v} in {root}"
            )
    os.makedirs(_cat_dir(catalog_root), exist_ok=True)
    for _ in range(max_retries):
        new_v = catalog_latest(catalog_root) + 1
        attempt = uuid.uuid4().hex[:8]
        tag = _member_tag(catalog_root, new_v, attempt)
        pinned = []
        won = False
        try:
            for name, (root, v) in tables.items():
                acid_tag(root, tag, version=v)
                pinned.append(root)
            payload = {
                "version": new_v,
                "ts": time.time(),
                "attempt": attempt,
                "tables": {
                    name: {"root": os.path.abspath(root), "version": v}
                    for name, (root, v) in tables.items()
                },
                "committed": True,
            }
            tmp = os.path.join(
                _cat_dir(catalog_root), f".tmp-{uuid.uuid4().hex}.json"
            )
            with open(tmp, "w") as fh:
                json.dump(payload, fh)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, _cat_path(catalog_root, new_v))
                won = True
                return new_v
            except FileExistsError:
                continue  # lost the race: re-pin under the next version
            finally:
                os.unlink(tmp)
        finally:
            if not won:
                # release exactly THIS attempt's pins (attempt-unique
                # names — a racing winner's pins are untouchable by
                # construction)
                for root in pinned:
                    try:
                        acid_untag(root, tag)
                    except FileNotFoundError:
                        pass
    raise CommitConflict(
        f"catalog commit on {catalog_root}: lost the race "
        f"{max_retries} times"
    )


def catalog_read(
    spark: SparkSession,
    catalog_root: str,
    name: str,
    catalog_version: int | None = None,
    **read_kwargs,
) -> DataFrame:
    """Read one member table at the version a catalog snapshot pins —
    concurrent member commits (even durable, committed ones) stay
    invisible until a catalog commit references them, so any set of
    ``catalog_read``s through one catalog version is mutually
    consistent."""
    tabs = catalog_tables(catalog_root, catalog_version)
    if name not in tabs:
        raise KeyError(
            f"table {name!r} not in catalog "
            f"(has: {sorted(tabs)})"
        )
    root, v = tabs[name]
    return acid_read(spark, root, version=v, **read_kwargs)


def catalog_expire(catalog_root: str, keep_versions: int = 1) -> list[int]:
    """Drop all but the newest ``keep_versions`` catalog versions and
    release their member tags (returning those member snapshots to the
    next member-table vacuum). Returns the dropped catalog versions."""
    vs = catalog_versions(catalog_root)
    drop = vs[:-keep_versions] if keep_versions > 0 else vs
    dropped = []
    for v in drop:
        with open(_cat_path(catalog_root, v)) as fh:
            m = json.load(fh)
        tag = _member_tag(catalog_root, v, m["attempt"])
        for t in m["tables"].values():
            try:
                acid_untag(t["root"], tag)
            except FileNotFoundError:
                pass
        os.unlink(_cat_path(catalog_root, v))
        dropped.append(v)
    return dropped
