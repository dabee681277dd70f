"""Ray casting, view selection, atlas, seam leveling, OBJ output tests."""

import numpy as np
import jax.numpy as jnp

from multiview_tpu.texture import raycast, texturing
from multiview_tpu.geometry import pose as P
from multiview_tpu.geometry.camera import CameraParams
from multiview_tpu.utils import synthetic as syn


def make_quad_mesh(z=0.0, half=1.0):
    verts = np.array([[-half, -half, z], [half, -half, z],
                      [half, half, z], [-half, half, z]])
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


class TestRaycast:
    def test_hit_and_miss(self):
        verts, faces = make_quad_mesh()
        tri = raycast.mesh_tri_verts(verts, faces)
        origins = jnp.array([[0.2, 0.3, -2.0], [5.0, 5.0, -2.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        t, idx, hit = raycast.ray_mesh_intersect(origins, dirs, jnp.asarray(tri))
        assert bool(hit[0]) and not bool(hit[1])
        np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-9)

    def test_nearest_of_two_surfaces(self):
        v1, f1 = make_quad_mesh(z=1.0)
        v2, f2 = make_quad_mesh(z=3.0)
        tri = np.concatenate([raycast.mesh_tri_verts(v1, f1),
                              raycast.mesh_tri_verts(v2, f2)])
        t, idx, hit = raycast.ray_mesh_intersect(
            jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.0, 0.0, 1.0]]),
            jnp.asarray(tri))
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-9)
        assert int(idx[0]) < 2

    def test_min_dist_window(self):
        verts, faces = make_quad_mesh(z=1.0)
        tri = raycast.mesh_tri_verts(verts, faces)
        t, idx, hit = raycast.ray_mesh_intersect(
            jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.0, 0.0, 1.0]]),
            jnp.asarray(tri), min_dist=2.0)
        assert not bool(hit[0])


class TestViewSelection:
    def test_facing_view_wins(self):
        verts, faces = make_quad_mesh()  # normal +z or -z depending on winding
        # cameras: one above (+z) looking down, one below looking up
        above = syn.look_at_pose(np.array([0.0, 0.1, 3.0]), np.zeros(3))
        below = syn.look_at_pose(np.array([0.0, 0.1, -3.0]), np.zeros(3))
        poses = jnp.asarray(np.stack([above, below]))
        best, visible = texturing.view_selection(jnp.asarray(verts),
                                                 jnp.asarray(faces), poses,
                                                 occlusion=False)
        assert bool(visible.all())
        # both faces pick the same camera (the one the normal faces)
        assert int(best[0]) == int(best[1])

    def test_occlusion(self):
        # ground quad + a big occluder between ground and the only camera
        gv, gf = make_quad_mesh(z=0.0, half=0.4)
        ov, of = make_quad_mesh(z=1.0, half=3.0)
        verts = np.concatenate([gv, ov])
        faces = np.concatenate([gf, of + 4])
        cam = syn.look_at_pose(np.array([0.05, 0.0, 3.0]), np.zeros(3))
        best, visible = texturing.view_selection(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(cam)[None],
            occlusion=True)
        vis = np.asarray(visible)
        assert not vis[0] and not vis[1]     # ground occluded
        assert vis[2] and vis[3]             # occluder visible


class TestAtlasAndRender:
    def test_atlas_packing_disjoint(self):
        rng = np.random.default_rng(0)
        verts = rng.normal(size=(30, 3))
        faces = rng.integers(0, 30, size=(40, 3)).astype(np.int32)
        atlas = texturing.build_atlas(verts, faces, pixel_size=0.05)
        # charts must not overlap
        page = np.zeros(atlas.size[::-1], int)
        for f in range(len(faces)):
            x0, y0 = atlas.face_uv0[f]
            w, h = atlas.face_wh[f]
            page[y0:y0 + h, x0:x0 + w] += 1
        assert page.max() == 1

    def test_render_flat_checker(self):
        """Texture a ground quad from one overhead camera viewing a checker
        image; the atlas must reproduce the checker."""
        verts, faces = make_quad_mesh(half=0.5)
        cam_pose = syn.look_at_pose(np.array([0.0, 1e-6, 2.0]), np.zeros(3))
        cam = CameraParams.create((200, 200), (200.0, 200.0), (100.0, 100.0))
        # checker image
        yy, xx = np.meshgrid(np.arange(200), np.arange(200), indexing="ij")
        img = (((xx // 20) + (yy // 20)) % 2).astype(np.float32)

        best, visible = texturing.view_selection(
            jnp.asarray(verts), jnp.asarray(faces),
            jnp.asarray(cam_pose)[None], occlusion=False)
        atlas = texturing.build_atlas(verts, faces, pixel_size=0.05, pad=1)
        page = texturing.render_atlas(atlas, verts, faces, best, visible,
                                      [img], [cam], [jnp.asarray(cam_pose)],
                                      max_chart=32)
        # sampled texels must take both checker values
        filled = []
        for f in range(len(faces)):
            x0, y0 = atlas.face_uv0[f]
            w, h = np.minimum(atlas.face_wh[f], 32)
            filled.append(page[y0:y0 + h, x0:x0 + w].ravel())
        filled = np.concatenate(filled)
        assert filled.min() < 0.2 and filled.max() > 0.8

    def test_obj_output(self, tmp_path):
        verts, faces = make_quad_mesh()
        atlas = texturing.build_atlas(verts, faces, pixel_size=0.1)
        page = np.random.default_rng(0).uniform(size=atlas.size[::-1]).astype(np.float32)
        obj = texturing.write_textured_obj(tmp_path / "model", verts, faces,
                                           atlas, page)
        text = obj.read_text()
        assert text.count("\nv ") + text.startswith("v ") == 0 or "v -1.0" in text
        assert "vt " in text and "f " in text and "mtllib" in text
        assert (tmp_path / "model.png").exists()
        assert (tmp_path / "model.mtl").exists()


class TestSeamLeveling:
    def test_gains_cancel_view_offset(self):
        """Two views with a constant brightness offset; gains must converge
        so seam faces agree."""
        # chain of 6 faces, first 3 from view 0 (color 0.3), rest view 1 (0.7)
        best_view = np.array([0, 0, 0, 1, 1, 1])
        colors = np.where(best_view == 0, 0.3, 0.7)
        adjacency = np.array([[i, i + 1] for i in range(5)], np.int32)
        g = texturing.global_seam_leveling(colors, best_view, adjacency,
                                           reg=1e-6, iterations=3000)
        corrected = colors + g
        # across-seam difference eliminated
        assert abs(corrected[2] - corrected[3]) < 1e-3


class TestLocalSeamLeveling:
    def test_vertex_gains_continuous_across_seam(self):
        """Per-vertex gains agree on shared vertices (C0 at seams) and the
        rendered correction interpolates them."""
        # two quads sharing an edge, different views with brightness offset
        verts = np.array([[0., 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                          [2, 0, 0], [2, 1, 0]])
        faces = np.array([[0, 1, 2], [0, 2, 3], [1, 4, 5], [1, 5, 2]], np.int32)
        face_gains = np.array([0.2, 0.2, -0.2, -0.2])
        vg = texturing.vertex_gains_from_faces(len(verts), faces, face_gains)
        # seam-edge vertices (1, 2) blend both sides: strictly between the
        # two face gains; outer vertices keep their side's gain
        assert np.all(np.abs(vg[[1, 2]]) < 0.1)
        np.testing.assert_allclose(vg[[0, 3]], 0.2, atol=1e-12)
        np.testing.assert_allclose(vg[[4, 5]], -0.2, atol=1e-12)

    def test_render_with_vertex_gain(self):
        import jax.numpy as jnp
        from multiview_tpu.geometry.camera import CameraParams
        verts = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0],
                          [0.5, 0.5, 0], [-0.5, 0.5, 0.]])
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        cam_pose = syn.look_at_pose(np.array([0.0, 1e-6, 2.0]), np.zeros(3))
        cam = CameraParams.create((100, 100), (100.0, 100.0), (50.0, 50.0))
        img = np.full((100, 100), 0.5, np.float32)
        best, visible = texturing.view_selection(
            jnp.asarray(verts), jnp.asarray(faces),
            jnp.asarray(cam_pose)[None], occlusion=False)
        atlas = texturing.build_atlas(verts, faces, pixel_size=0.05)
        vg = np.array([0.4, 0.0, -0.4, 0.0])
        page = texturing.render_atlas(atlas, verts, faces, best, visible,
                                      [img], [cam], [jnp.asarray(cam_pose)],
                                      vertex_gain=vg, max_chart=32)
        # corrected page spans a gradient beyond the flat 0.5 input
        x0, y0 = atlas.face_uv0[0]
        w, h = np.minimum(atlas.face_wh[0], 32)
        chart = page[y0:y0 + h, x0:x0 + w]
        assert chart.max() - chart.min() > 0.3
