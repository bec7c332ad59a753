"""UDGeom toolkit tests: splitting, watertightness, volume, repair,
footprint outlines, ground generation, extrusion — the udgeom
(tools/python/udgeom/udgeom.py) operation set."""
from pathlib import Path

import numpy as np
import pytest

from udales_tpu.prep.prep import make_box_stl
from udales_tpu.prep.stl import read_stl
from udales_tpu.prep.udgeom import UDGeom


def box(tmp, name, x0, x1, y0, y1, z1, xlen=32.0, ylen=32.0):
    p = tmp / name
    make_box_stl(p, x0, x1, y0, y1, z1, xlen, ylen)
    return UDGeom(path=p)


class TestBasics:
    def test_area_volume_watertight(self, tmp_path):
        g = box(tmp_path, "b.stl", 4, 12, 4, 12, 6)
        # building walls+roof only (make_box_stl adds floor tiles too);
        # extract the building component
        bs = g.get_buildings()
        assert len(bs) == 1
        b = bs[0]
        # open-bottom box: walls 4*8*6 + roof 8*8
        assert abs(b.total_area - (4 * 8 * 6 + 64)) < 1e-9  # walls+roof
        assert not b.is_watertight()   # bottom face missing
        assert len(b.boundary_edges()) > 0

    def test_volume_closed(self):
        # closed unit cube
        t = []
        for d in range(3):
            for s in (0.0, 1.0):
                a = np.zeros(3); a[d] = s
                u = np.zeros(3); u[(d + 1) % 3] = 1
                v = np.zeros(3); v[(d + 2) % 3] = 1
                q = [a, a + u, a + u + v, a + v]
                if s == 1.0:
                    t.append([q[0], q[1], q[2]]); t.append([q[0], q[2], q[3]])
                else:
                    t.append([q[0], q[2], q[1]]); t.append([q[0], q[3], q[2]])
        g = UDGeom(np.asarray(t))
        assert g.is_watertight()
        assert abs(abs(g.volume()) - 1.0) < 1e-12

    def test_split_two_buildings(self, tmp_path):
        g1 = box(tmp_path, "b1.stl", 2, 6, 2, 6, 4)
        g2 = box(tmp_path, "b2.stl", 10, 14, 10, 14, 8)
        both = UDGeom(np.concatenate([g1.tris, g2.tris]))
        bs = both.get_buildings()
        assert len(bs) == 2
        heights = sorted(b.bounds[1, 2] for b in bs)
        assert heights == [4.0, 8.0]


class TestRepair:
    def test_fix_drops_degenerate_and_duplicates(self, tmp_path):
        g = box(tmp_path, "b.stl", 4, 8, 4, 8, 4)
        bad = np.concatenate([
            g.tris,
            g.tris[:1],                       # duplicate face
            np.zeros((1, 3, 3)),              # degenerate
        ])
        fixed = UDGeom(bad).fix()
        assert fixed.n_faces == g.n_faces

    def test_fix_orients_outward(self, tmp_path):
        g = box(tmp_path, "b.stl", 4, 8, 4, 8, 4)
        b = g.get_buildings()[0]
        flipped = UDGeom(b.tris[:, ::-1])     # all windings reversed
        fixed = flipped.fix()
        # roof normal must point up again
        roof = np.abs(fixed.tris[..., 2] - 4.0).max(axis=1) < 1e-9
        assert (fixed.normals[roof][:, 2] > 0.99).all()


class TestOutlines:
    def test_footprint_loop(self, tmp_path):
        g = box(tmp_path, "b.stl", 4, 12, 6, 10, 5)
        polys = UDGeom(g.get_buildings()[0].tris).footprint_polygons()
        assert len(polys) == 1
        loop = polys[0]
        xs, ys = loop[:, 0], loop[:, 1]
        assert {xs.min(), xs.max()} == {4.0, 12.0}
        assert {ys.min(), ys.max()} == {6.0, 10.0}
        out = g.get_outline()
        assert len(out) >= len(loop)


class TestGeneration:
    def test_add_ground(self, tmp_path):
        g = box(tmp_path, "b.stl", 4, 8, 4, 8, 4)
        b = g.get_buildings()[0]
        withg = b.add_ground(32.0, 32.0, tile=8.0)
        assert withg.n_faces == b.n_faces + 2 * 16
        ground = np.abs(withg.tris[..., 2]).max(axis=1) < 1e-12
        assert ground.sum() == 32

    def test_extrude_to_ground_closes(self, tmp_path):
        g = box(tmp_path, "b.stl", 4, 8, 4, 8, 4)
        b = g.get_buildings()[0]
        # lift the open-bottom box so its rim floats, then extrude down
        lifted = UDGeom(b.tris + np.array([0, 0, 2.0]))
        closed = lifted.extrude_to_ground()
        assert closed.n_faces > lifted.n_faces
        zmin = closed.tris[..., 2].min()
        assert zmin == 0.0
