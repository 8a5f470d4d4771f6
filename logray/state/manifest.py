"""Per-partition lineage manifests + checkpoint-resumable execution.

The reference avoids re-work with in-process caches
(filtered_file_reader.cpp:236-268: line index, pass mask, valid-line index);
a distributed batch run instead needs a **resumable output layout**:

- the input is split into deterministic partitions (one per input file /
  fragment);
- each partition's output goes to its own directory, written to a temp path
  and atomically renamed, with a ``manifest.json`` lineage record (partition
  id, input files, row count, per-route counts, duration) committed last;
- a restarted run skips every partition whose manifest exists, so a crash
  mid-run costs only the in-flight partitions.

``run_resumable`` drives any per-partition pipeline function with this
protocol; the flagship pipeline plugs in via ``logray.pipelines``.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from dataclasses import dataclass

import numpy as np


@dataclass
class RunManifest:
    out_dir: str

    def partition_dir(self, part_id: str) -> str:
        return os.path.join(self.out_dir, "parts", part_id)

    def manifest_path(self, part_id: str) -> str:
        return os.path.join(self.partition_dir(part_id), "manifest.json")

    def is_done(self, part_id: str) -> bool:
        return os.path.exists(self.manifest_path(part_id))

    def record(self, part_id: str, entry: dict) -> None:
        """Atomic commit: the manifest file is the partition's done-marker,
        written last via tmp + rename."""
        path = self.manifest_path(part_id)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=2, default=str)
        os.replace(tmp, path)

    def entries(self) -> dict:
        out = {}
        for p in sorted(glob.glob(os.path.join(self.out_dir, "parts", "*", "manifest.json"))):
            with open(p) as f:
                out[os.path.basename(os.path.dirname(p))] = json.load(f)
        return out

    def merged_metrics(self) -> dict:
        """Fold per-partition metrics into run totals."""
        total_rows = 0
        routes: dict = {}
        parts = self.entries()
        for e in parts.values():
            total_rows += int(e.get("rows", 0))
            for k, v in (e.get("routes") or {}).items():
                routes[k] = routes.get(k, 0) + int(v)
        return {"partitions": len(parts), "rows": total_rows, "routes": routes}


def check_run_config(out_dir: str, config: dict) -> None:
    """Refuse to resume a checkpointed run whose semantic parameters — or
    the engine's partitioning-hash version — differ from the ones the
    directory was started with: completed partitions were produced under
    a different plan, and mixing them silently corrupts the output (e.g.
    a bucket-hash change reassigns keys across phase-2 buckets).  The
    first call records the config at ``<out_dir>/run_config.json``;
    later calls compare and raise on any mismatch.  An out_dir holding
    completed partition manifests but NO recorded config (a run started
    before configs were versioned) also refuses: its checkpoints were
    produced under an unknown plan — possibly an older bucket hash — and
    blessing them with today's config is exactly the corruption this
    guard exists to stop."""
    from logray.stages.bucketing import HASH_VERSION

    def native(v):
        # numpy scalars JSON-ify as strings via default=str; a resume
        # passing the same value as a python int would then spuriously
        # mismatch — coerce to native first
        return v.item() if isinstance(v, np.generic) else v

    cfg = {k: native(v) for k, v in config.items()}
    cfg["bucket_hash_version"] = HASH_VERSION
    # normalize through JSON so the recorded and compared forms agree
    cfg = json.loads(json.dumps(cfg, sort_keys=True, default=str))
    path = os.path.join(out_dir, "run_config.json")
    if not os.path.exists(path):
        pre_versioned = glob.glob(
            os.path.join(out_dir, "parts", "*", "manifest.json")
        ) or glob.glob(
            os.path.join(out_dir, "*", "parts", "*", "manifest.json"))
        if pre_versioned:
            raise ValueError(
                f"resumable run at {out_dir} holds checkpoints but no "
                f"run_config.json (started before configs were "
                f"versioned); its partitioning plan is unknown — rerun "
                f"in a fresh out_dir")
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        if old != cfg:
            diffs = {k: (old.get(k), cfg.get(k))
                     for k in set(old) | set(cfg) if old.get(k) != cfg.get(k)}
            raise ValueError(
                f"resumable run at {out_dir} was started with different "
                f"parameters; refusing to mix its checkpoints with this "
                f"plan: {diffs} — rerun in a fresh out_dir")
        return
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def default_partitions(input_path: str) -> list[tuple[str, list[str]]]:
    """One partition per input parquet file.  Partition ids derive from
    the FILE NAME, not the sort position: positional ids (p00000, ...)
    shift when a later ingest adds a file that sorts before existing
    ones, silently skipping the new file and double-counting an old one.
    Name-stable ids make re-running on a GROWN directory process exactly
    the new files — incremental ingestion for free."""
    import hashlib
    import re

    if os.path.isfile(input_path):
        files = [input_path]
    else:
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    out = []
    for f in files:
        base = os.path.basename(f)
        # short hash of the RAW name: sanitizing alone collides
        # ('a b.parquet' and 'a_b.parquet' would share an id, and the
        # second would be silently skipped as already-done)
        tag = hashlib.sha1(base.encode()).hexdigest()[:8]
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", base)
        out.append((f"p-{safe}-{tag}", [f]))
    return out


def partitions_from_parts(phase_dir: str) -> list[tuple[str, list[str]]]:
    """One downstream partition per PARTITION a finished resumable phase
    published under ``<phase_dir>/parts/<pid>/`` — the glue that chains
    resumable phases: phase N+1's partition list derives from phase N's
    published partitions, so granularity stays CONSTANT down the chain
    (one unit of sequential driver work per upstream unit) instead of
    multiplying with the per-block file counts each write emits.  Ids
    derive from the upstream partition id (already filesystem-safe and
    name-stable); file lists within a published partition are sorted and
    immutable, so the mapping is a pure function across resumes."""
    import hashlib
    import re

    root = os.path.join(phase_dir, "parts")
    by_pid: dict[str, list[str]] = {}
    for f in part_files(phase_dir):
        pid = os.path.relpath(f, root).split(os.sep)[0]
        by_pid.setdefault(pid, []).append(f)
    out = []
    for pid in sorted(by_pid):
        tag = hashlib.sha1(pid.encode()).hexdigest()[:8]
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", pid)
        out.append((f"p-{safe[-48:]}-{tag}", sorted(by_pid[pid])))
    return out


def part_files(phase_dir: str) -> list[str]:
    """All parquet files a finished (or partially finished) resumable
    phase has published under ``<phase_dir>/parts/*/`` (one extra level
    for hive-partitioned phases)."""
    flat = glob.glob(os.path.join(phase_dir, "parts", "*", "*.parquet"))
    hive = glob.glob(os.path.join(phase_dir, "parts", "*", "*", "*.parquet"))
    return sorted(flat + hive)


def part_files_hive(phase_dir: str, col: str, value) -> list[str]:
    """Parquet files of a hive-partitioned resumable phase (written with
    ``write_parquet(partition_cols=[col])``) holding ONE partition value.
    This is PATH-level bucket pruning: a per-bucket phase that instead
    row-filters ``col == value`` over all phase files rescans the whole
    phase output once per bucket (hash-random tags defeat row-group
    min/max statistics — a B-fold read amplification at scale)."""
    return sorted(glob.glob(os.path.join(
        phase_dir, "parts", "*", f"{col}={value}", "*.parquet")))


def run_resumable(
    input_path: str,
    out_dir: str,
    run_partition,
    partitions: list[tuple[str, list[str]]] | None = None,
    max_concurrent: int = 1,
) -> dict:
    """Run ``run_partition(files, partition_out_dir) -> dict`` once per
    pending partition; completed partitions (manifest present) are skipped.
    A ``run_partition`` that also accepts a ``part_id`` keyword receives
    the partition's id (fault-injection hooks and per-partition naming
    need it — callers must not reverse-map it from ``files``).

    The partition function writes its outputs under a temp dir we pass in;
    on success we atomically rename it into place and commit the manifest.
    Returns merged run metrics.

    ``max_concurrent > 1`` runs that many partitions at once from driver
    threads (Ray Dataset executions are thread-safe and share the
    cluster's resource scheduler).  This is the multi-node shape: one
    partition's job rarely fills the cluster — a single WARC file reads
    as ONE block — so concurrent partitions are what keep 32+ cores
    busy.  Safe because every partition publishes into its own
    directory and its own ``manifest.json`` done-marker (no shared
    mutable state); a failure in any partition propagates after the
    in-flight ones finish, and completed partitions stay committed, so
    crash-resume semantics are identical to the sequential path.
    """
    import inspect

    try:
        pass_pid = "part_id" in inspect.signature(run_partition).parameters
    except (TypeError, ValueError):
        pass_pid = False
    mf = RunManifest(out_dir)
    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    parts = partitions if partitions is not None else default_partitions(input_path)
    known = {pid for pid, _ in parts}
    stale = sorted(set(mf.entries()) - known)
    if stale:
        # a manifest entry no id in this run matches means the out_dir
        # was written under a different id scheme or inputs were
        # removed; merging metrics across the two would double-count
        raise RuntimeError(
            f"run_resumable: out_dir {out_dir!r} contains manifest "
            f"entries not in the current partition list ({stale[:3]}...); "
            f"use a fresh out_dir (stale outputs would double-count)")

    def one(part_id: str, files: list[str]) -> None:
        pdir = mf.partition_dir(part_id)
        tmp = pdir + ".inprogress"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)  # leftover from a crashed attempt
        os.makedirs(tmp)
        t0 = time.perf_counter()
        stats = (run_partition(files, tmp, part_id=part_id)
                 if pass_pid else run_partition(files, tmp)) or {}
        # atomic publish: move outputs into place, then commit the manifest
        if os.path.exists(pdir):
            shutil.rmtree(pdir)
        os.replace(tmp, pdir)
        mf.record(
            part_id,
            {
                "partition": part_id,
                "inputs": files,
                "seconds": round(time.perf_counter() - t0, 3),
                **stats,
            },
        )

    pending = [(pid, files) for pid, files in parts if not mf.is_done(pid)]
    if max_concurrent <= 1 or len(pending) <= 1:
        for part_id, files in pending:
            one(part_id, files)
        return mf.merged_metrics()

    from concurrent.futures import ThreadPoolExecutor

    # Lazy imports inside Ray's read/write paths race under concurrent
    # first-touch from threads: fsspec.implementations.http can NEVER
    # import here (aiohttp absent), so every thread re-attempts it, and
    # a thread that observes another's partially-initialized attempt
    # dies with "cannot import name HTTPFileSystem" (a plain
    # ImportError, which Ray's `except ModuleNotFoundError` does not
    # catch).  Make the import deterministic with a stub whose
    # HTTPFileSystem no real filesystem is an instance of — Ray only
    # isinstance-checks it, so the stub preserves the no-aiohttp
    # behavior (False) without the race.  Then run the FIRST partition
    # synchronously so remaining lazy paths warm before the fan-out.
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        import sys
        import types

        if "fsspec.implementations.http" not in sys.modules:
            stub = types.ModuleType("fsspec.implementations.http")
            stub.HTTPFileSystem = type("HTTPFileSystem", (), {})
            sys.modules["fsspec.implementations.http"] = stub
    one(*pending[0])
    from concurrent.futures import FIRST_EXCEPTION, wait

    with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
        futures = [pool.submit(one, pid, files) for pid, files in pending[1:]]
        # fail FAST: a systematic error (bad column, unreadable input)
        # fails every partition — cancel the not-yet-started backlog at
        # the first failure instead of burning through it; in-flight
        # partitions finish (their committed outputs stay valid for the
        # resume), matching the sequential path's first-error semantics
        done, not_done = wait(futures, return_when=FIRST_EXCEPTION)
        first_err = next((f.exception() for f in done
                          if f.exception() is not None), None)
        if first_err is not None:
            for f in not_done:
                f.cancel()
        errs = [f.exception() for f in futures if not f.cancelled()]
    for e in errs:
        if e is not None:
            raise e
    return mf.merged_metrics()
