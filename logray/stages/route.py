"""Routing stage: filter expressions -> fan-out per-sink views / Parquet sinks.

The reference maintains ONE filtered view with the malformed-bypass policy
(filtered_file_reader.cpp:258-262):

    passes = (!well_formatted && accept_bad_format)
          || (well_formatted && (filter == null || filter(row)))

Here that generalizes to N routes.  Two physical strategies:

- :func:`route_datasets` — each route is an independent filtered view of the
  parsed Dataset (reference semantics exactly; routes may overlap).  Each
  view re-filters the shared upstream, so use for a handful of sinks.
- :func:`route_exclusive` — first-match-wins priority routing materialized
  as ONE pass that appends a ``route`` column; pair with
  :func:`write_routes` for a single-scan fan-out Parquet write partitioned
  by route (the 100-TB path: one read, one write, no per-sink rescan).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from logray.filters import DEFAULT_CTX, EvalContext, LineFilter, parse_filter_decl
from logray.formats import LineFormat


@dataclass
class Route:
    name: str
    filter: LineFilter | None  # None = pass-all (still subject to bad-format policy)
    accept_bad_format: bool = False

    @classmethod
    def from_decl(cls, name: str, decl: str, fmt: LineFormat, accept_bad_format: bool = False):
        return cls(name, parse_filter_decl(decl, fmt), accept_bad_format)


class Router:
    """Compiled route set; evaluates per-batch masks."""

    def __init__(self, routes: list[Route], ctx: EvalContext = DEFAULT_CTX,
                 well_col: str = "well_formatted", default_route: str | None = None):
        self.routes = routes
        self.ctx = ctx
        self.well_col = well_col
        self.default_route = default_route

    def mask(self, table: pa.Table, route: Route) -> pa.Array:
        """The reference routing policy for one route."""
        well = pc.fill_null(table[self.well_col], False)
        if route.filter is None:
            fmask = pa.array(np.ones(table.num_rows, np.bool_))
        else:
            fmask = route.filter.mask(table, self.ctx)
        ok = pc.and_(well, fmask)
        if route.accept_bad_format:
            ok = pc.or_(ok, pc.invert(well))
        return ok

    def route_column(self, table: pa.Table) -> pa.Array:
        """First-match-wins route label per row; unmatched rows get the
        default route (or null when none is configured)."""
        n = table.num_rows
        out = np.full(n, -1, np.int64)
        for i, r in enumerate(self.routes):
            m = np.asarray(self.mask(table, r)).astype(bool)
            out = np.where((out < 0) & m, i, out)
        names = pa.array([r.name for r in self.routes] + [self.default_route], pa.string())
        idx = np.where(out < 0, len(self.routes), out)
        return pc.take(names, pa.array(idx))


def route_datasets(ds, router: Router) -> dict:
    """{route_name: filtered Dataset} — independent views, exact reference
    per-sink semantics (routes may overlap)."""
    out = {}
    for r in router.routes:
        def _f(t: pa.Table, _r=r) -> pa.Table:
            return t.filter(router.mask(t, _r))
        out[r.name] = ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
    return out


def route_exclusive(ds, router: Router, drop_unrouted: bool = True):
    """Single-pass routing: appends a ``route`` column (first match wins).
    Rows matching no route are dropped unless a default_route is set or
    ``drop_unrouted=False`` (kept with null route)."""

    def _tag(t: pa.Table) -> pa.Table:
        col = router.route_column(t)
        t = t.append_column("route", col)
        if drop_unrouted and router.default_route is None:
            t = t.filter(pc.is_valid(t["route"]))
        return t

    return ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)


class RouteSinkWriter:
    """Fused write+summarize stage: per batch, split rows by their ``route``
    tag, write one Parquet file per route into ``route=<name>/``, and RETURN
    the batch's metric partials instead of the data.

    This collapses "write the sinks, then re-scan them for aggregates" into
    ONE streaming pass: the pipeline's output is the (tiny) partials stream,
    which the driver folds.  Because batches arrive in input order, the
    conv_id partials stay clustered (far fewer partial rows than a re-scan
    of route-partitioned files would produce).

    File names embed a uuid — safe under retries because the enclosing
    partition directory is published atomically by the manifest layer
    (state/manifest.py); a duplicated file from a retried task is discarded
    with its temp directory.
    """

    # zstd: measured equal write speed to snappy on this corpus with ~33%
    # smaller files — at fleet scale that is storage and read bandwidth
    def __init__(self, out_dir: str, hist_cols: list[str], ts_col: str | None = "ts",
                 compression: str = "zstd"):
        self.out_dir = out_dir
        self.hist_cols = hist_cols
        self.ts_col = ts_col
        self.compression = compression

    def __call__(self, t: pa.Table) -> pa.Table:
        import os
        import uuid

        import pyarrow.parquet as pq

        routes = t["route"]
        for name in pc.unique(routes).to_pylist():
            part = t.filter(pc.equal(routes, name))
            d = os.path.join(self.out_dir, f"route={name}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                part.drop_columns(["route"]),
                os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"),
                compression=self.compression,
            )
        from logray.stages.aggregate import histogram_partials

        return histogram_partials(t, self.hist_cols, self.ts_col)


def write_routes(ds, router: Router, out_dir: str, mode: str = "exclusive", **write_kwargs):
    """Fan-out Parquet write.

    mode="exclusive": ONE scan; rows tagged then written partitioned by the
    ``route`` column (hive layout ``route=<name>/``) — resumable, no
    per-sink rescan.  mode="views": one scan per route (overlapping routes),
    each to ``out_dir/<name>/``.
    """
    if mode == "exclusive":
        tagged = route_exclusive(ds, router)
        tagged.write_parquet(out_dir, partition_cols=["route"], **write_kwargs)
        return out_dir
    paths = {}
    for name, view in route_datasets(ds, router).items():
        p = f"{out_dir}/{name}"
        view.write_parquet(p, **write_kwargs)
        paths[name] = p
    return paths
