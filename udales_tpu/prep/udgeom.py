"""Geometry toolkit for urban STL models.

Dependency-free numpy re-implementation of the reference's udgeom package
(tools/python/udgeom/udgeom.py, trimesh-based, ~5.3k LoC): mesh repair,
building splitting, watertightness/volume, footprint outlines, extrusion
to the ground, and ground-plane generation — the operations udprep relies
on when preparing a case from a raw building STL.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from .stl import read_stl, triangle_areas, write_stl


class UDGeom:
    """A triangulated surface (tools/python/udgeom/udgeom.py:55 UDGeom).

    Holds (n, 3, 3) triangle vertices + (n, 3) outward unit normals.
    """

    def __init__(self, tris=None, normals=None, path=None):
        if path is not None:
            tris, normals = read_stl(path)
        self.tris = np.asarray(tris, float)
        if normals is None:
            normals = _face_normals(self.tris)
        self.normals = np.asarray(normals, float)

    # -- basic properties (udgeom.py:359-790) -------------------------------
    @property
    def n_faces(self) -> int:
        return len(self.tris)

    @property
    def bounds(self) -> np.ndarray:
        return np.stack([self.tris.reshape(-1, 3).min(axis=0),
                         self.tris.reshape(-1, 3).max(axis=0)])

    @property
    def face_centers(self) -> np.ndarray:
        return self.tris.mean(axis=1)

    @property
    def face_areas(self) -> np.ndarray:
        return triangle_areas(self.tris)

    @property
    def total_area(self) -> float:
        return float(self.face_areas.sum())

    def volume(self) -> float:
        """Signed enclosed volume via the divergence theorem
        (udgeom.py:777)."""
        a, b, c = self.tris[:, 0], self.tris[:, 1], self.tris[:, 2]
        return float(np.einsum("ij,ij->i", a, np.cross(b, c)).sum() / 6.0)

    def save(self, path):
        write_stl(path, self.tris, self.normals)

    # -- connectivity --------------------------------------------------------
    def _vertex_ids(self, decimals: int = 9):
        """Map triangle corners to merged vertex ids (exact-coordinate
        merge after rounding)."""
        pts = np.round(self.tris.reshape(-1, 3), decimals)
        uniq, inv = np.unique(pts, axis=0, return_inverse=True)
        return uniq, inv.reshape(-1, 3)

    def _edges(self):
        _, f = self._vertex_ids()
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        return np.sort(e, axis=1)

    def is_watertight(self) -> bool:
        """Every edge shared by exactly two faces (udgeom.py:790)."""
        e = self._edges()
        _, counts = np.unique(e, axis=0, return_counts=True)
        return bool((counts == 2).all())

    def boundary_edges(self):
        """Edges used by exactly one face, as vertex-id pairs."""
        e = self._edges()
        uniq, counts = np.unique(e, axis=0, return_counts=True)
        return uniq[counts == 1]

    def face_to_component(self) -> np.ndarray:
        """Connected-component label per face (vertex-shared connectivity;
        udgeom.get_face_to_building_map:471)."""
        _, f = self._vertex_ids()
        nv = f.max() + 1
        parent = np.arange(nv)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for tri in f:
            r = find(tri[0])
            for v in tri[1:]:
                parent[find(v)] = r
        roots = np.array([find(tri[0]) for tri in f])
        _, labels = np.unique(roots, return_inverse=True)
        return labels

    def identify_ground_faces(self, eps: float = 1e-9) -> np.ndarray:
        """Horizontal faces lying in the domain-floor plane
        (udgeom.identify_ground_faces:926)."""
        zmin = self.tris[..., 2].min()
        flat = (np.abs(self.tris[..., 2] - zmin) < eps).all(axis=1)
        return flat & (np.abs(self.normals[:, 2]) > 0.99)

    def get_buildings(self, exclude_ground: bool = True):
        """Split into per-component UDGeoms (udgeom.get_buildings:438).
        Ground-plane faces are removed FIRST (buildings share floor-ring
        vertices with the ground, so components are computed on the
        building faces only), matching udgeom._split_buildings:497."""
        if exclude_ground:
            keep = ~self.identify_ground_faces()
            base = UDGeom(self.tris[keep], self.normals[keep])
        else:
            base = self
        if base.n_faces == 0:
            return []
        labels = base.face_to_component()
        return [UDGeom(base.tris[labels == lb], base.normals[labels == lb])
                for lb in range(labels.max() + 1)]

    # -- repair (udgeom.check:851 / fix:985) --------------------------------
    def fix(self, min_area: float = 1e-12):
        """Repair pass: drop degenerate/duplicate faces and orient
        normals outward (ray-parity test from each face centroid)."""
        areas = triangle_areas(self.tris)
        keep = areas > min_area
        tris, normals = self.tris[keep], self.normals[keep]
        # duplicate faces: same vertex-id set
        pts = np.round(tris.reshape(-1, 3), 9)
        uniq, inv = np.unique(pts, axis=0, return_inverse=True)
        fids = np.sort(inv.reshape(-1, 3), axis=1)
        _, first = np.unique(fids, axis=0, return_index=True)
        keep2 = np.zeros(len(tris), bool)
        keep2[first] = True
        tris, normals = tris[keep2], normals[keep2]
        # outward orientation: a point just along the normal must see an
        # even number of surface crossings along +z (outside test)
        from .geom import ray_hits
        geom_n = _face_normals(tris)
        flip = np.einsum("ij,ij->i", geom_n,
                         normals) < 0
        normals = np.where(flip[:, None], -normals, normals)
        cen = tris.mean(axis=1)
        probes = cen + 1e-6 * normals
        inside = _crossing_parity(probes, tris)
        tris[inside] = tris[inside][:, ::-1]
        normals[inside] = -normals[inside]
        return UDGeom(tris, _face_normals(tris))

    # -- footprints / outlines (udgeom.calculate_outline2d:567) -------------
    def footprint_polygons(self, z: float | None = None, eps: float = 1e-6):
        """2-D footprint outline per building: the boundary edges of the
        horizontal cross-section near ground level, chained into closed
        polygons.  Returns a list of (m, 2) vertex loops."""
        zmin = self.tris[..., 2].min() if z is None else z
        polys = []
        for b in self.get_buildings():
            # vertical faces touching the ground: collect their bottom edges
            edges = []
            for tri in b.tris:
                zs = tri[:, 2]
                low = np.abs(zs - zmin) < eps
                if low.sum() == 2:
                    p = tri[low][:, :2]
                    edges.append((tuple(np.round(p[0], 9)),
                                  tuple(np.round(p[1], 9))))
            if not edges:
                continue
            polys.extend(_chain_loops(edges))
        return polys

    def get_outline(self):
        """All footprint loops merged as one (m, 2) polyline array with
        NaN separators (udgeom.get_outline:720 flavor)."""
        polys = self.footprint_polygons()
        if not polys:
            return np.zeros((0, 2))
        parts = []
        for p in polys:
            parts.append(np.asarray(p))
            parts.append(np.full((1, 2), np.nan))
        return np.concatenate(parts[:-1])

    # -- generation ----------------------------------------------------------
    def add_ground(self, xlen: float, ylen: float, tile: float | None = None):
        """Append a triangulated ground plane at z=0 covering
        [0,xlen]x[0,ylen] (udgeom.add_ground:870).  `tile` sets the tile
        edge length (default: one tile)."""
        tile_x = xlen if tile is None else tile
        tile_y = ylen if tile is None else tile
        nx = max(int(round(xlen / tile_x)), 1)
        ny = max(int(round(ylen / tile_y)), 1)
        tris = []
        for i in range(nx):
            for j in range(ny):
                x0, x1 = i * xlen / nx, (i + 1) * xlen / nx
                y0, y1 = j * ylen / ny, (j + 1) * ylen / ny
                tris.append([[x0, y0, 0], [x1, y0, 0], [x1, y1, 0]])
                tris.append([[x0, y0, 0], [x1, y1, 0], [x0, y1, 0]])
        gt = np.asarray(tris, float)
        return UDGeom(np.concatenate([self.tris, gt]),
                      np.concatenate([self.normals,
                                      np.tile([0.0, 0.0, 1.0],
                                              (len(gt), 1))]))

    def extrude_to_ground(self):
        """Close a floating geometry downward: every boundary edge is
        extruded to z=0 with a vertical quad (udgeom extrude-to-ground
        semantics for shapes cut above the terrain)."""
        uniq, f = self._vertex_ids()
        be = self.boundary_edges()
        new = []
        for a, b in be:
            pa, pb = uniq[a], uniq[b]
            ga, gb = pa.copy(), pb.copy()
            ga[2] = 0.0
            gb[2] = 0.0
            new.append([pa, pb, gb])
            new.append([pa, gb, ga])
        if not new:
            return self
        nt = np.asarray(new)
        return UDGeom(np.concatenate([self.tris, nt]),
                      np.concatenate([self.normals, _face_normals(nt)]))


def _face_normals(tris):
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    return n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)


def _crossing_parity(points, tris):
    """True where a +z ray from the point crosses the surface an odd
    number of times (inside test)."""
    from .geom import points_inside
    return points_inside(points, tris, on_surface_tol=0.0)


def _chain_loops(edges):
    """Chain undirected 2-D edges into closed vertex loops."""
    from collections import defaultdict
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    seen_e = set()
    loops = []
    for a, b in edges:
        if (a, b) in seen_e or (b, a) in seen_e:
            continue
        loop = [a, b]
        seen_e.add((a, b))
        cur, prev = b, a
        while True:
            nxts = [v for v in adj[cur]
                    if v != prev and (cur, v) not in seen_e
                    and (v, cur) not in seen_e]
            if not nxts:
                break
            nxt = nxts[0]
            seen_e.add((cur, nxt))
            if nxt == loop[0]:
                break
            loop.append(nxt)
            prev, cur = cur, nxt
        loops.append(np.asarray(loop, float))
    return loops
