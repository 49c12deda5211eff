"""Crash-atomic multi-relation index artifacts (manifest-committed).

The engine's three persisted-index families (PQ/IVF-PQ, co-purchase
graph, dedup bands+shingles) share one lifecycle: a nightly BUILD over
the corpus, cheap APPENDs that cost the increment only, and queries
that read the artifact. Before round 13, an append was one or more
``mode("append")`` parquet writes against the live relation dirs — a
crash between the codes write and the ivf_assign write (or mid-write)
left a torn artifact that readers consumed silently (round-12 verdict
#1 / ADVICE).

This module is the fix: the snapshot-pointer discipline
(jobs/maintenance.py::publish_snapshot — immutable version dirs plus an
atomic ``_CURRENT`` flip) generalized to an artifact made of SEVERAL
relations that grow by DISJOINT batches. Rewriting the corpus-sized
relations per append (a literal publish_snapshot of each relation)
would violate the cost-scales-with-the-increment contract, so commits
version the MANIFEST instead of the data:

- every write lands in a fresh immutable batch dir
  ``<index_dir>/<relation>/b=<version>/`` that no committed manifest
  references yet;
- the manifest ``_CURRENT`` names, per relation, exactly the batch
  dirs a reader may scan, plus the build parameters (``meta``) the
  consumers validate against (FAISS serializes m/nlist with the index
  for the same reason — a wrong-m reader computes wrong sub boundaries
  silently);
- the commit point is a single ``os.replace`` of the manifest
  (write-tmp + fsync + rename, atomic on POSIX — the publish_snapshot
  protocol verbatim).

Crash anywhere before the replace: the old manifest still names only
old batches, so readers see the pre-append index bit-for-bit and the
half-written ``b=N`` dirs are invisible garbage (refused, because
readers scan manifest-listed dirs ONLY — never a glob). The next
commit sweeps them before reusing any number. Crash after the replace:
the append is complete. There is no window where a reader can observe
a torn index. Law-tested per family by tests/test_index_commit.py
(kill-between-writes via the ``_write_relation`` seam).

Single-maintenance-writer contract (same as publish_snapshot):
concurrent appenders would see each other's in-progress batch dirs as
crash garbage.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame

#: manifest file name — the same pointer-name convention as the
#: snapshot tables (jobs/maintenance.py::_SNAPSHOT_PTR)
MANIFEST = "_CURRENT"


def read_index_manifest(index_dir: str) -> dict | None:
    """The committed manifest, or None before any build. A leftover
    ``_CURRENT.tmp`` from a crashed commit is ignored — only the atomic
    replace commits."""
    ptr = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        return json.load(fh)


def require_index_manifest(
    index_dir: str, family: str, hint: str | None = None
) -> dict:
    """The committed manifest, validated to belong to ``family`` —
    loading a dedup index dir as a PQ index is a caller bug surfaced
    loudly, not four confusing missing-relation errors later. ``hint``
    names the family's build entry point in the missing-index error."""
    man = read_index_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(
            f"no committed {family} index under {index_dir} (no"
            f" {MANIFEST} manifest); "
            + (hint or "run the family's build job first")
        )
    if man.get("family") != family:
        raise ValueError(
            f"{index_dir} holds a {man.get('family')!r} index, not the"
            f" {family!r} index this reader expects"
        )
    return man


def relation_paths(index_dir: str, manifest: dict, relation: str) -> list[str]:
    """The batch dirs a reader may scan for ``relation`` — manifest-listed
    ONLY (an on-disk ``b=`` dir beyond the manifest is a crashed commit's
    garbage and is refused, exactly like read_snapshot's orphan rule)."""
    versions = manifest["relations"].get(relation)
    if not versions:
        raise ValueError(
            f"index {index_dir} has no committed relation {relation!r};"
            f" manifest relations: {sorted(manifest['relations'])}"
        )
    return [os.path.join(index_dir, relation, f"b={v}") for v in versions]


def _write_relation(df: DataFrame, path: str) -> None:
    """Single-relation batch write — the kill-between-writes test seam
    (tests monkeypatch this to crash an append mid-commit)."""
    df.write.mode("overwrite").parquet(path)


def _batch_dirs(index_dir: str, relation: str) -> dict[int, str]:
    out: dict[int, str] = {}
    for p in glob.glob(os.path.join(index_dir, relation, "b=*")):
        tail = os.path.basename(p).split("=", 1)[1]
        if tail.isdigit():
            out[int(tail)] = p
    return out


def sweep_orphan_batches(index_dir: str, manifest: dict) -> list[str]:
    """Delete every on-disk batch dir the manifest does not reference —
    crashed commits' garbage. Recovery-first (publish_snapshot's rule):
    if an orphan merely stayed, a later commit reusing its number would
    make the torn data spuriously committed. Returns removed paths."""
    removed: list[str] = []
    if not os.path.isdir(index_dir):
        return removed
    for rel in os.listdir(index_dir):
        rel_dir = os.path.join(index_dir, rel)
        if rel.startswith("_") or not os.path.isdir(rel_dir):
            continue
        committed = set(manifest["relations"].get(rel, []))
        for v, p in _batch_dirs(index_dir, rel).items():
            if v not in committed:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
    return removed


def _commit_manifest(index_dir: str, manifest: dict) -> None:
    """The commit point: tmp + fsync + atomic replace (publish_snapshot
    protocol)."""
    ptr = os.path.join(index_dir, MANIFEST)
    tmp = ptr + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, ptr)


def commit_index_build(
    index_dir: str,
    writes: dict[str, DataFrame],
    meta: dict,
    family: str,
) -> int:
    """Fresh build: overwrite any existing index of any shape (the
    build jobs' documented contract), write every relation as batch
    ``b=1``, commit manifest version 1."""
    os.makedirs(index_dir, exist_ok=True)
    for entry in list(os.listdir(index_dir)):
        p = os.path.join(index_dir, entry)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif entry.startswith(MANIFEST):
            os.remove(p)
    for rel, df in writes.items():
        _write_relation(df, os.path.join(index_dir, rel, "b=1"))
    _commit_manifest(
        index_dir,
        {
            "family": family,
            "version": 1,
            "meta": dict(meta),
            "relations": {rel: [1] for rel in writes},
        },
    )
    return 1


def commit_index_append(
    index_dir: str,
    writes: dict[str, DataFrame],
    family: str,
    meta_update: dict | None = None,
) -> int:
    """Append one increment batch to the named relations and commit it
    as the next manifest version, atomically. Relations NOT in
    ``writes`` (the frozen model: codebook, seeds) keep their committed
    batches untouched. ``meta_update`` merges over the stored meta
    (e.g. the running ``n_vectors``)."""
    man = require_index_manifest(index_dir, family)
    sweep_orphan_batches(index_dir, man)
    n = int(man["version"]) + 1
    for rel, df in writes.items():
        _write_relation(df, os.path.join(index_dir, rel, f"b={n}"))
    relations = {rel: list(v) for rel, v in man["relations"].items()}
    for rel in writes:
        relations.setdefault(rel, []).append(n)
    _commit_manifest(
        index_dir,
        {
            "family": family,
            "version": n,
            "meta": {**man.get("meta", {}), **(meta_update or {})},
            "relations": relations,
        },
    )
    return n


def vacuum_index(index_dir: str) -> list[str]:
    """Explicit orphan reclamation: sweep every batch dir the committed
    manifest does not reference (crashed commits, superseded
    compactions). The next commit would sweep them anyway — this is the
    storage-reclaim job a deployment schedules (CLI --job index-vacuum).
    Returns removed paths; errors if no index is committed here."""
    man = read_index_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(
            f"no committed index under {index_dir} (no {MANIFEST});"
            " nothing to vacuum"
        )
    return sweep_orphan_batches(index_dir, man)


def compact_index(
    spark,
    index_dir: str,
    family: str,
    merges: dict | None = None,
) -> int:
    """Consolidate every multi-batch relation into ONE batch and commit
    the result as the next manifest version — the small-files
    maintenance job an append-heavy index needs at scale (every nightly
    append adds a batch dir; a year of ingest is 365 scans per query
    until compaction folds them). Same atomicity as every commit: the
    consolidated batches land unreferenced, one manifest flip publishes
    them, and the superseded batch dirs become orphans (swept by the
    next commit or vacuum_index — never deleted before the flip, so a
    crash mid-compaction leaves the old layout fully readable).

    ``merges`` maps relation name -> (DataFrame -> DataFrame) applied
    to the concatenated scan before writing — for relations whose
    loader merges batches SEMANTICALLY rather than by concatenation
    (the graph edge list sum-merges partial weights; compacting it by
    concatenation would silently double weights once the single-batch
    loader short-circuits). Single-batch relations are left untouched.
    """
    import os

    man = require_index_manifest(index_dir, family)
    sweep_orphan_batches(index_dir, man)
    multi = {
        rel: vs for rel, vs in man["relations"].items() if len(vs) > 1
    }
    if not multi:
        return int(man["version"])
    n = int(man["version"]) + 1
    relations = {rel: list(vs) for rel, vs in man["relations"].items()}
    for rel, vs in multi.items():
        df = spark.read.parquet(
            *[os.path.join(index_dir, rel, f"b={v}") for v in vs]
        )
        merge = (merges or {}).get(rel)
        if merge is not None:
            df = merge(df)
        _write_relation(df, os.path.join(index_dir, rel, f"b={n}"))
        relations[rel] = [n]
    _commit_manifest(
        index_dir,
        {
            "family": family,
            "version": n,
            "meta": man.get("meta", {}),
            "relations": relations,
        },
    )
    return n
