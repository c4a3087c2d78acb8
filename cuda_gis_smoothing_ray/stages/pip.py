"""Point-in-polygon join (SURVEY §2.4 — no reference counterpart; specified by
``BASELINE.json`` north_star: "PIP via ray-casting on covered polygon
partitions").

Design for scale: the polygon side is SMALL (thousands of polygons) and the
point side is HUGE (every page) — so this is a **broadcast join**, never a
shuffle: the polygon set + its bbox prefilter index is built once per actor
(``__init__``), each Arrow batch of points is tested vectorized.  At 100 TB
the pages stream through stateless-ish actors; no all-to-all is involved.

The ray-casting predicate is the classic even-odd crossing rule, written so
the generated SQL oracle (an edge-table join + crossing count, see
``sql/oracles.pip_join_sql``) evaluates the *identical* float expression:

    crosses(edge, p) = (y1 > p.lat) != (y2 > p.lat)
                       AND p.lon < (x2 - x1) * (p.lat - y1) / (y2 - y1) + x1
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: (poly_id, [(lat, lon), ...]) — closed implicitly (last->first edge).
#: Mixed shapes: convex boxes over TLD hot-spots, a non-convex L, a triangle,
#: a thin sliver, a pentagon.  Constants shared with the SQL generator.
POLYGONS: list[tuple[int, list[tuple[float, float]]]] = [
    # box around the .com/.org/.net centroid cluster (North America)
    (1, [(30.0, -110.0), (30.0, -85.0), (48.0, -85.0), (48.0, -110.0)]),
    # non-convex L over western/central Europe
    (2, [(42.0, -5.0), (42.0, 12.0), (49.0, 12.0), (49.0, 22.0), (56.0, 22.0), (56.0, -5.0)]),
    # triangle around Japan
    (3, [(30.0, 128.0), (30.0, 148.0), (44.0, 138.0)]),
    # thin sliver through Brazil's centroid
    (4, [(-20.0, -60.0), (-8.0, -45.0), (-8.2, -45.0), (-20.2, -60.0)]),
    # pentagon around India
    (5, [(8.0, 70.0), (8.0, 88.0), (22.0, 92.0), (32.0, 79.0), (22.0, 66.0)]),
]


def polygon_edges(polys=None) -> list[tuple[int, float, float, float, float]]:
    """Flatten to (poly_id, y1, x1, y2, x2) edge rows (y=lat, x=lon)."""
    rows = []
    for pid, ring in polys or POLYGONS:
        for i in range(len(ring)):
            y1, x1 = ring[i]
            y2, x2 = ring[(i + 1) % len(ring)]
            rows.append((pid, y1, x1, y2, x2))
    return rows


#: (poly_id, [ring, ...]) — ring 0 is the OUTER boundary, later rings are
#: HOLES (interior rings).  Even-odd crossing parity over ALL rings' edges
#: is the standard multiring semantics: inside the outer ring XOR inside a
#: hole.  Constants shared with the SQL generator.
POLYGONS_HOLES: list[tuple[int, list[list[tuple[float, float]]]]] = [
    # the North-America box with a rectangular hole over its center mass
    (11, [[(30.0, -110.0), (30.0, -85.0), (48.0, -85.0), (48.0, -110.0)],
          [(36.0, -102.0), (36.0, -92.0), (42.0, -92.0), (42.0, -102.0)]]),
    # the Europe L with a small hole over its western lobe
    (12, [[(42.0, -5.0), (42.0, 12.0), (49.0, 12.0), (49.0, 22.0),
           (56.0, 22.0), (56.0, -5.0)],
          [(45.0, 0.0), (45.0, 8.0), (48.0, 8.0), (48.0, 0.0)]]),
    # the India pentagon with a central hole
    (13, [[(8.0, 70.0), (8.0, 88.0), (22.0, 92.0), (32.0, 79.0),
           (22.0, 66.0)],
          [(14.0, 74.0), (14.0, 84.0), (20.0, 84.0), (20.0, 74.0)]]),
]


def multiring_edges(polys=None) -> list[tuple[int, float, float, float, float]]:
    """Flatten multiring polygons to (poly_id, y1, x1, y2, x2) edge rows —
    outer AND hole edges in one table (crossing parity handles the rest)."""
    rows = []
    if polys is None:
        polys = POLYGONS_HOLES
    for pid, rings in polys:
        for ring in rings:
            for i in range(len(ring)):
                y1, x1 = ring[i]
                y2, x2 = ring[(i + 1) % len(ring)]
                rows.append((pid, y1, x1, y2, x2))
    return rows


def points_in_rings(lat: np.ndarray, lon: np.ndarray,
                    rings: list[list[tuple[float, float]]]) -> np.ndarray:
    """Even-odd test against a multiring polygon: XOR of the per-ring ray
    casts = inside the outer boundary and NOT inside any hole."""
    inside = np.zeros(len(lat), dtype=bool)
    for ring in rings:
        inside ^= points_in_polygon(lat, lon, ring)
    return inside


def points_in_polygon(lat: np.ndarray, lon: np.ndarray, ring: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized even-odd ray cast of many points against one ring."""
    inside = np.zeros(len(lat), dtype=bool)
    n = len(ring)
    for i in range(n):
        y1, x1 = ring[i]
        y2, x2 = ring[(i + 1) % n]
        cond = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        crosses = cond & (lon < xcross)
        inside ^= crosses
    return inside


class PIPJoin:
    """Actor-pool stage: broadcast polygon set, bbox prefilter, exact ray cast.

    ``polygons_ref``: either None (module constants) or a ``ray.ObjectRef``
    from ``ray.put(polygons)`` — the broadcast-small-side pattern (put once on
    the driver, fetched once per actor, reused every batch).
    """

    def __init__(self, polygons_ref=None, id_col: str = "page_id", _polygons=None):
        if _polygons is not None:
            polys = _polygons
        elif polygons_ref is not None:
            import ray

            polys = ray.get(polygons_ref)
        else:
            polys = POLYGONS
        self.id_col = id_col
        self.polys = polys
        self.bboxes = [
            (
                pid,
                min(p[0] for p in self._outer(shape)),
                max(p[0] for p in self._outer(shape)),
                min(p[1] for p in self._outer(shape)),
                max(p[1] for p in self._outer(shape)),
            )
            for pid, shape in polys
        ]

    # shape accessors — subclasses generalize the polygon representation
    @staticmethod
    def _outer(shape):
        return shape

    @staticmethod
    def _test(lat, lon, shape):
        return points_in_polygon(lat, lon, shape)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        out_ids, out_pids = [], []
        for (pid, shape), (_, lat0, lat1, lon0, lon1) in zip(self.polys, self.bboxes):
            # bbox prefilter (the R-tree stand-in) — exact test on survivors only
            cand = (lat >= lat0) & (lat <= lat1) & (lon >= lon0) & (lon <= lon1)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            hit = self._test(lat[idx], lon[idx], shape)
            sel = idx[hit]
            out_ids.append(ids[sel])
            out_pids.append(np.full(len(sel), pid, dtype=np.int64))
        if out_ids:
            return pa.table(
                {
                    self.id_col: pa.array(np.concatenate(out_ids)),
                    "poly_id": pa.array(np.concatenate(out_pids)),
                }
            )
        return pa.table(
            {self.id_col: pa.array([], pa.int64()), "poly_id": pa.array([], pa.int64())}
        )


class PIPHolesJoin(PIPJoin):
    """Multiring (holed) polygons: bbox prefilter on the OUTER ring (holes
    lie inside it by construction), exact even-odd cast over all rings on
    the survivors.  Only the shape accessors differ from :class:`PIPJoin`;
    the bbox/output machinery is shared."""

    def __init__(self, polygons_ref=None, id_col: str = "page_id",
                 _polygons=None):
        if _polygons is None and polygons_ref is None:
            _polygons = POLYGONS_HOLES  # explicit [] stays empty
        super().__init__(polygons_ref, id_col, _polygons)

    @staticmethod
    def _outer(shape):
        return shape[0]

    @staticmethod
    def _test(lat, lon, shape):
        return points_in_rings(lat, lon, shape)


_JOINERS: dict = {}


def _cached_joiner(poly_key, polygons, id_col: str, cls=PIPJoin) -> PIPJoin:
    j = _JOINERS.get((cls, poly_key, id_col))
    if j is None:
        j = _JOINERS[(cls, poly_key, id_col)] = cls(id_col=id_col,
                                                    _polygons=polygons)
    return j


def pip_join_holes(points_ds, polygons=None, id_col: str = "page_id"):
    """Geocoded points -> (id, poly_id) containment pairs against multiring
    polygons with interior HOLES — same cached-task / fused-with-upstream
    plan as :func:`pip_join`; only the membership predicate generalizes
    (crossing parity over all rings)."""
    poly_key = None
    if polygons is not None:
        poly_key = hash(tuple(
            (pid, tuple(tuple(r) for r in rings)) for pid, rings in polygons))
    return points_ds.map_batches(
        lambda batch: _cached_joiner(poly_key, polygons, id_col,
                                     cls=PIPHolesJoin)(batch),
        batch_format="pyarrow",
        batch_size=None,
    )


def pip_join(points_ds, polygons=None, id_col: str = "page_id", concurrency=None,
             use_actors: bool = False):
    """Geocoded points Dataset -> (id, poly_id) pairs Dataset (inner join).

    Default is a TASK stage with per-worker cached state (the same rationale
    as :func:`..geoencode.geo_encode`): the polygon + bbox index is cheap to
    build, and the task form lets Ray Data fuse this with the upstream
    build->encode task chain into ONE TaskPoolMapOperator whose parallelism
    is the input block count.  The actor-pool form is NOT fused the same
    way: the ActorPoolMapOperator bundles *pre-expansion* input blocks up to
    the max target block size, and with a replicated bench read (64 tiny
    blocks that fan out 2000x inside the fused ``build``) that collapsed the
    whole chain into ONE 17 s actor task (measured, sf0.1 x2000).

    ``use_actors=True`` restores the broadcast-actor form for genuinely
    large polygon sets (``ray.put`` once, fetched once per actor).
    """
    if not use_actors:
        # key worker-side cache by content hash so distinct custom polygon
        # sets don't collide; the default set keys as None
        poly_key = None
        if polygons is not None:
            poly_key = hash(tuple((pid, tuple(ring)) for pid, ring in polygons))
        return points_ds.map_batches(
            lambda batch: _cached_joiner(poly_key, polygons, id_col)(batch),
            batch_format="pyarrow",
            batch_size=None,
        )
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(4, cpus))
    ref = ray.put(polygons) if polygons is not None else None
    return points_ds.map_batches(
        PIPJoin,
        fn_constructor_kwargs={"polygons_ref": ref, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
