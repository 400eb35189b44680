"""Distance-field bake and collision response tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from libclsph_tpu.ops import collisions as C
from libclsph_tpu.scene.obj_loader import ObjMesh, load_obj
from libclsph_tpu.scene.scene import Scene


def brute_point_triangle_distance(p, v0, v1, v2):
    """Unsigned distance from point to triangle (independent method:
    project to plane, clamp barycentrics, else nearest edge point)."""
    n = np.cross(v1 - v0, v2 - v0)
    n = n / np.linalg.norm(n)

    def seg_dist(p, a, b):
        ab = b - a
        t = np.clip(np.dot(p - a, ab) / np.dot(ab, ab), 0, 1)
        return np.linalg.norm(p - (a + t * ab))

    # inside test via barycentric coordinates of the projection
    proj = p - np.dot(p - v0, n) * n
    A = np.stack([v1 - v0, v2 - v0], axis=1)
    try:
        ab = np.linalg.lstsq(A, proj - v0, rcond=None)[0]
        inside = ab[0] > 0 and ab[1] > 0 and ab[0] + ab[1] < 1
    except np.linalg.LinAlgError:
        inside = False
    if inside:
        return abs(np.dot(p - v0, n))
    return min(
        seg_dist(p, v0, v1), seg_dist(p, v1, v2), seg_dist(p, v0, v2)
    )


@pytest.fixture(scope="module")
def tri_scene():
    """One right triangle in the XZ plane."""
    mesh = ObjMesh(
        vertices=np.array(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32
        ),
        triangles=np.array([[0, 1, 2]], np.int32),
    )
    return Scene.from_mesh(mesh, dist_field_threshold=0.3)


class TestScenePrecompute:
    def test_normals_unit_and_perpendicular(self, tri_scene):
        n = tri_scene.face_normals[0]
        np.testing.assert_allclose(np.linalg.norm(n), 1.0, rtol=1e-6)
        # triangle lies in XZ plane -> normal along +/- y
        np.testing.assert_allclose(abs(n[1]), 1.0, rtol=1e-6)

    def test_bbox_dilation(self, tri_scene):
        np.testing.assert_allclose(
            tri_scene.bb_min[0], [-0.3, -0.3, -0.3], atol=1e-6
        )
        np.testing.assert_allclose(tri_scene.bb_max[0], [1.3, 0.3, 1.3], atol=1e-6)

    def test_grid_sizing_rule(self, tri_scene):
        # ceil((max-min)/thresh*2)+1 (scene.cpp:109-114)
        expected = np.ceil((1.6) / 0.3 * 2) + 1
        assert tri_scene.bb_size[0, 0] == expected

    def test_rvertices_structure(self, tri_scene):
        # u projected onto (uv, uu): first component ~0, second = |u|
        rv = tri_scene.rvertices[0]
        assert abs(rv[0]) < 1e-5
        assert rv[1] == pytest.approx(1.0, rel=1e-5)


class TestDistanceFieldBake:
    def test_df_matches_brute_force(self, tri_scene):
        df = np.asarray(C.bake_distance_field(tri_scene, point_chunk=8192))
        v0, v1, v2 = (
            np.array([0.0, 0.0, 0.0]),
            np.array([1.0, 0.0, 0.0]),
            np.array([0.0, 0.0, 1.0]),
        )
        size = tri_scene.bb_size[0]
        bmin, bmax = tri_scene.bb_min[0], tri_scene.bb_max[0]
        rng = np.random.default_rng(0)
        # check a sample of gridpoints, using the reference's y-major
        # z / x-minor flat layout
        for _ in range(200):
            x = rng.integers(0, size[0])
            y = rng.integers(0, size[1])
            z = rng.integers(0, size[2])
            flat = y * size[0] * size[2] + z * size[0] + x
            p = bmin + np.array([x, y, z]) / (size - 1) * (bmax - bmin)
            expected = brute_point_triangle_distance(p, v0, v1, v2)
            got = df[flat]
            assert abs(abs(got) - expected) < 2e-5, (p, got, expected)
            # sign = side of the plane (normal is -y here): sign(rpx)
            if abs(p[1]) > 1e-4:
                n = tri_scene.face_normals[0]
                assert np.sign(got) == np.sign(np.dot(n, p - v0))

    def test_df_far_value_outside_boxes(self):
        # two disjoint triangles: points in one's grid that fall outside
        # every bbox keep DF_FAR... (all gridpoints are inside their own
        # face's bbox by construction, so check sign/finite instead)
        mesh = ObjMesh(
            vertices=np.array(
                [[0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float32
            ),
            triangles=np.array([[0, 1, 2]], np.int32),
        )
        scene = Scene.from_mesh(mesh, 0.2)
        df = np.asarray(C.bake_distance_field(scene))
        assert np.isfinite(df).all()
        assert (np.abs(df) <= C.DF_FAR).all()


@pytest.fixture(scope="module")
def cube_device_scene():
    scene = Scene.load("cube.obj", 0.2, scenes_dir="scenes")
    return C.build_device_scene(scene)


class TestHandleCollisions:
    def test_no_scene_passthrough(self):
        pos = jnp.asarray(np.random.rand(10, 3), jnp.float32)
        vel = jnp.asarray(np.random.rand(10, 3), jnp.float32)
        resp = C.handle_collisions(None, pos, pos, vel, 0.5, jnp.float32(0.01))
        np.testing.assert_array_equal(np.asarray(resp.position), np.asarray(pos))
        assert not np.asarray(resp.collision_happened).any()

    def test_falling_particle_reflected(self, cube_device_scene):
        # cube occupies [-0.5,0.5]x[-1.5,-0.5]x[-0.5,0.5] with outward
        # normals; a particle just above the TOP face (y=-0.5), moving
        # down, within contact distance (0.02) -> pushed back along +y
        # and the velocity's normal component removed (restitution 0).
        pos = jnp.asarray([[0.0, -0.49, 0.0]], jnp.float32)
        vel = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
        old = jnp.asarray([[0.0, -0.4, 0.0]], jnp.float32)
        resp = C.handle_collisions(
            cube_device_scene, old, pos, vel, 0.0, jnp.float32(0.01)
        )
        assert bool(resp.collision_happened[0])
        new_v = np.asarray(resp.next_velocity)[0]
        assert new_v[1] > -1e-3  # downward component removed (restitution 0)
        new_p = np.asarray(resp.position)[0]
        assert new_p[1] >= -0.5  # pushed off the face

    def test_far_particle_untouched(self, cube_device_scene):
        pos = jnp.asarray([[0.0, 5.0, 0.0]], jnp.float32)
        vel = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
        resp = C.handle_collisions(
            cube_device_scene, pos, pos, vel, 0.0, jnp.float32(0.01)
        )
        assert not bool(resp.collision_happened[0])
        np.testing.assert_array_equal(np.asarray(resp.position), np.asarray(pos))

    def test_restitution_scaling(self, cube_device_scene):
        pos = jnp.asarray([[0.0, -0.49, 0.0]], jnp.float32)
        vel = jnp.asarray([[0.0, -2.0, 0.0]], jnp.float32)
        old = jnp.asarray([[0.0, -0.4, 0.0]], jnp.float32)
        r0 = C.handle_collisions(cube_device_scene, old, pos, vel, 0.0, jnp.float32(0.01))
        r1 = C.handle_collisions(cube_device_scene, old, pos, vel, 1.0, jnp.float32(0.01))
        # restitution adds an extra d/(dt*|v|) fraction of the normal
        # component (respond, collisionsv2.cl:15-18): bouncier
        assert float(r1.next_velocity[0, 1]) > float(r0.next_velocity[0, 1])


class TestEndToEndContainment:
    def test_dam_break_stays_in_cube(self):
        """A small fluid block dropped into the cube scene must stay
        inside (no fall-through) over dozens of substeps."""
        import sys

        sys.path.insert(0, "tests")
        from conftest import WATER, make_params
        from libclsph_tpu.core.state import init_state
        from libclsph_tpu.engine.step import StepConfig, substep_jit

        params = make_params(WATER, n=512)
        scene = Scene.load("cube.obj", params.h * 2, scenes_dir="scenes")
        dev_scene = C.build_device_scene(scene)
        state = init_state(params)
        # the reference scenario: the fluid block spawns above the cube
        # (init lattice y >= 0) and lands on its top face at y = -0.5
        cfg = StepConfig(neighbor_impl="tiles")
        dt = jnp.float32(params.max_dt)
        for _ in range(40):
            state, dt, _ovf = substep_jit(state, dt, params, dev_scene, cfg)
        pos = np.asarray(state.position)
        vel = np.asarray(state.velocity)
        assert np.isfinite(pos).all()
        # nothing tunnels through the top face under the fluid column
        inside_xz = (np.abs(pos[:, 0]) < 0.4) & (np.abs(pos[:, 2]) < 0.4)
        assert pos[inside_xz, 1].min() > -0.55
        # no collision-response explosion
        assert np.linalg.norm(vel, axis=1).max() < 20.0
