"""Procedurally generate the shipped collision scenes.

The reference ships Blender-exported OBJ meshes (scenes/*.obj: cube,
box, plane, cone, monkey, river, shower, labyrinth, monkeybox). We
generate equivalent geometry procedurally — same scene names, same
roles (container below the initial fluid cube, obstacle, channel), with
inward-facing normals for containers like the originals.

Run: python scenes/generate.py [outdir]
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np


class MeshBuilder:
    def __init__(self):
        self.vertices: list[tuple[float, float, float]] = []
        self.faces: list[tuple[int, int, int]] = []

    def v(self, x, y, z) -> int:
        self.vertices.append((float(x), float(y), float(z)))
        return len(self.vertices) - 1

    def tri(self, a, b, c):
        self.faces.append((a, b, c))

    def quad(self, a, b, c, d):
        # two triangles, consistent winding
        self.tri(a, b, c)
        self.tri(a, c, d)


    def _orient(self, idxs, ref, away_from=None):
        """Reorder a polygon's vertex indices so its normal points
        toward ``ref`` (or away from ``away_from``)."""
        va = np.array(self.vertices[idxs[0]])
        vb = np.array(self.vertices[idxs[1]])
        vc = np.array(self.vertices[idxs[2]])
        n = np.cross(vb - va, vc - va)
        if away_from is not None:
            want = va - np.array(away_from)
        else:
            want = np.array(ref) - va
        if float(np.dot(n, want)) < 0:
            return list(reversed(idxs))
        return idxs

    def tri_toward(self, a, b, c, ref):
        self.tri(*self._orient([a, b, c], ref))

    def quad_toward(self, a, b, c, d, ref):
        self.quad(*self._orient([a, b, c, d], ref))

    def tri_away(self, a, b, c, center):
        self.tri(*self._orient([a, b, c], None, away_from=center))

    def quad_away(self, a, b, c, d, center):
        self.quad(*self._orient([a, b, c, d], None, away_from=center))

    def add_box(self, lo, hi, inward=True):
        """Axis-aligned closed box; inward=True -> normals point inside
        (container), else outside (obstacle)."""
        x0, y0, z0 = lo
        x1, y1, z1 = hi
        i = [
            self.v(x0, y0, z0),  # 0
            self.v(x1, y0, z0),  # 1
            self.v(x1, y0, z1),  # 2
            self.v(x0, y0, z1),  # 3
            self.v(x0, y1, z0),  # 4
            self.v(x1, y1, z0),  # 5
            self.v(x1, y1, z1),  # 6
            self.v(x0, y1, z1),  # 7
        ]
        center = [(x0 + x1) / 2, (y0 + y1) / 2, (z0 + z1) / 2]
        quads = [
            (0, 1, 2, 3),  # bottom
            (7, 6, 5, 4),  # top
            (0, 3, 7, 4),  # x0 side
            (2, 1, 5, 6),  # x1 side
            (1, 0, 4, 5),  # z0 side
            (3, 2, 6, 7),  # z1 side
        ]
        for (a, b, c, d) in quads:
            if inward:
                self.quad_toward(i[a], i[b], i[c], i[d], center)
            else:
                self.quad_away(i[a], i[b], i[c], i[d], center)

    def add_open_box(self, lo, hi, inward=True):
        """Box without a top face (open container)."""
        x0, y0, z0 = lo
        x1, y1, z1 = hi
        i = [
            self.v(x0, y0, z0),
            self.v(x1, y0, z0),
            self.v(x1, y0, z1),
            self.v(x0, y0, z1),
            self.v(x0, y1, z0),
            self.v(x1, y1, z0),
            self.v(x1, y1, z1),
            self.v(x0, y1, z1),
        ]
        center = [(x0 + x1) / 2, (y0 + y1) / 2, (z0 + z1) / 2]
        quads = [
            (0, 1, 2, 3),
            (0, 3, 7, 4),
            (2, 1, 5, 6),
            (1, 0, 4, 5),
            (3, 2, 6, 7),
        ]
        for (a, b, c, d) in quads:
            if inward:
                self.quad_toward(i[a], i[b], i[c], i[d], center)
            else:
                self.quad_away(i[a], i[b], i[c], i[d], center)

    def add_plane(self, lo, hi, y):
        x0, z0 = lo
        x1, z1 = hi
        a = self.v(x0, y, z0)
        b = self.v(x1, y, z0)
        c = self.v(x1, y, z1)
        d = self.v(x0, y, z1)
        self.quad_toward(a, b, c, d, [0.0, y + 1.0, 0.0])  # normal up

    def add_cone(self, apex_y, base_y, radius, segments=16, closed=True):
        """Open cone (funnel) with apex at bottom."""
        apex = self.v(0.0, apex_y, 0.0)
        ring = [
            self.v(
                radius * math.cos(2 * math.pi * k / segments),
                base_y,
                radius * math.sin(2 * math.pi * k / segments),
            )
            for k in range(segments)
        ]
        interior = [0.0, base_y, 0.0]  # inside the funnel mouth
        for k in range(segments):
            self.tri_toward(apex, ring[k], ring[(k + 1) % segments], interior)
        if closed:
            center = self.v(0.0, base_y, 0.0)
            for k in range(segments):
                self.tri_toward(
                    center, ring[(k + 1) % segments], ring[k],
                    [0.0, base_y + 1.0, 0.0],
                )

    def add_sphere(self, center, radius, lat=8, lon=12):
        # faces oriented outward (fluid collides from outside)
        cx, cy, cz = center
        grid = []
        for i in range(lat + 1):
            theta = math.pi * i / lat
            row = []
            for j in range(lon):
                phi = 2 * math.pi * j / lon
                row.append(
                    self.v(
                        cx + radius * math.sin(theta) * math.cos(phi),
                        cy + radius * math.cos(theta),
                        cz + radius * math.sin(theta) * math.sin(phi),
                    )
                )
            grid.append(row)
        for i in range(lat):
            for j in range(lon):
                a, b = grid[i][j], grid[i][(j + 1) % lon]
                c, d = grid[i + 1][(j + 1) % lon], grid[i + 1][j]
                if i != 0:
                    self.tri_away(a, b, c, center)
                if i != lat - 1:
                    self.tri_away(a, c, d, center)

    def write(self, path, name):
        with open(path, "w") as f:
            f.write(f"# libclsph_tpu procedural scene\no {name}\n")
            for (x, y, z) in self.vertices:
                f.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
            f.write("s off\n")
            for (a, b, c) in self.faces:
                f.write(f"f {a + 1} {b + 1} {c + 1}\n")


def build_all(outdir):
    os.makedirs(outdir, exist_ok=True)

    # cube: closed unit cube below the fluid (reference cube.obj spans
    # [-0.5,0.5]x[-1.5,-0.5]x[-0.5,0.5]); outward normals — the fluid
    # lands on it from outside, like the Blender export
    m = MeshBuilder()
    m.add_box((-0.5, -1.5, -0.5), (0.5, -0.5, 0.5), inward=False)
    m.write(os.path.join(outdir, "cube.obj"), "cube")

    # box: wide open-top container catching the falling fluid column
    m = MeshBuilder()
    m.add_open_box((-2.0, -1.5, -2.0), (2.0, 2.5, 2.0))
    m.write(os.path.join(outdir, "box.obj"), "box")

    # plane: a single ground quad
    m = MeshBuilder()
    m.add_plane((-4.0, -4.0), (4.0, 4.0), -1.0)
    m.write(os.path.join(outdir, "plane.obj"), "plane")

    # cone: funnel below the fluid
    m = MeshBuilder()
    m.add_cone(apex_y=-2.0, base_y=0.5, radius=2.0, segments=24, closed=False)
    m.write(os.path.join(outdir, "cone.obj"), "cone")

    # monkey: blobby obstacle inside a catch box (standin for Suzanne)
    m = MeshBuilder()
    m.add_sphere((0.0, -0.6, 0.0), 0.55, lat=10, lon=14)
    m.add_sphere((-0.45, -0.25, 0.0), 0.2, lat=6, lon=8)
    m.add_sphere((0.45, -0.25, 0.0), 0.2, lat=6, lon=8)
    m.write(os.path.join(outdir, "monkey.obj"), "monkey")

    # monkeybox: the obstacle inside an open container
    m = MeshBuilder()
    m.add_sphere((0.0, -0.6, 0.0), 0.55, lat=10, lon=14)
    m.add_sphere((-0.45, -0.25, 0.0), 0.2, lat=6, lon=8)
    m.add_sphere((0.45, -0.25, 0.0), 0.2, lat=6, lon=8)
    m.add_open_box((-2.5, -1.6, -2.5), (2.5, 2.5, 2.5))
    m.write(os.path.join(outdir, "monkeybox.obj"), "monkeybox")

    # shower: perforated tray above a catch box
    m = MeshBuilder()
    m.add_open_box((-3.0, -2.0, -3.0), (3.0, 3.0, 3.0))
    # grid of small tilted quads forming a leaky tray at y ~ 0.8
    for ix in range(-2, 3):
        for iz in range(-2, 3):
            x0, z0 = ix * 0.9 - 0.35, iz * 0.9 - 0.35
            a = m.v(x0, 0.8, z0)
            b = m.v(x0 + 0.7, 0.82, z0)
            c = m.v(x0 + 0.7, 0.8, z0 + 0.7)
            d = m.v(x0, 0.82, z0 + 0.7)
            m.quad_toward(a, b, c, d, [x0 + 0.35, 2.0, z0 + 0.35])
    m.write(os.path.join(outdir, "shower.obj"), "shower")

    # river: a sloped channel with side walls
    m = MeshBuilder()
    n_seg = 12
    xs = np.linspace(-6.0, 6.0, n_seg + 1)
    ys = np.linspace(0.5, -1.5, n_seg + 1)
    width = 1.5
    floor, lwall, rwall = [], [], []
    for x, y in zip(xs, ys):
        floor.append((m.v(x, y, -width), m.v(x, y, width)))
        lwall.append(m.v(x, y + 1.2, -width))
        rwall.append(m.v(x, y + 1.2, width))
    for k in range(n_seg):
        (a0, b0), (a1, b1) = floor[k], floor[k + 1]
        interior = [float(xs[k]), float(ys[k]) + 0.6, 0.0]
        m.quad_toward(a0, a1, b1, b0, interior)
        m.quad_toward(a0, lwall[k], lwall[k + 1], a1, interior)
        m.quad_toward(b0, b1, rwall[k + 1], rwall[k], interior)
    m.write(os.path.join(outdir, "river.obj"), "river")

    # labyrinth: open box with staggered baffle walls
    m = MeshBuilder()
    m.add_open_box((-3.0, -1.5, -3.0), (3.0, 2.0, 3.0))
    for k, x in enumerate(np.linspace(-2.0, 2.0, 4)):
        z0, z1 = (-3.0, 1.5) if k % 2 == 0 else (-1.5, 3.0)
        m.add_box((x - 0.08, -1.5, z0), (x + 0.08, 0.8, z1), inward=False)
    m.write(os.path.join(outdir, "labyrinth.obj"), "labyrinth")


if __name__ == "__main__":
    build_all(sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(__file__) or ".")
    print("scenes written")
