"""TSDF fusion + marching-tetrahedra mesh extraction + PLY I/O tests."""

import numpy as np
import jax.numpy as jnp

from multiview_tpu.dense import tsdf, marching
from multiview_tpu.geometry import pose as P
from multiview_tpu.io import ply
from multiview_tpu.utils import synthetic as syn


def render_sphere_depth(cam_to_world, focal, center, size, radius=1.0):
    """Analytic depth image of a unit sphere at the origin."""
    W, H = size
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    w2c = np.asarray(P.pose_to_matrix(jnp.asarray(cam_to_world)))
    # rays in cam frame
    d = np.stack([(us - center[0]) / focal[0], (vs - center[1]) / focal[1],
                  np.ones_like(us, float)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = w2c[:3, 3]
    dw = d @ w2c[:3, :3].T
    # |o + t dw| = r
    b = 2 * dw @ o
    c = o @ o - radius ** 2
    disc = b * b - 4 * c
    t = (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0
    hit = (disc > 0) & (t > 0)
    depth_along_ray = np.where(hit, t, 0.0)
    # convert to z-depth
    return (depth_along_ray * d[..., 2]).astype(np.float32)


class TestTsdfSphere:
    def _fuse_sphere(self, n_views=8, shape=(48, 48, 48)):
        grid = tsdf.make_grid(shape, origin=(-1.5, -1.5, -1.5), voxel_size=3.0 / 48)
        focal = jnp.asarray([200.0, 200.0])
        center = jnp.asarray([160.0, 120.0])
        for i in range(n_views):
            a = 2 * np.pi * i / n_views
            cam_pos = np.array([3 * np.cos(a), 3 * np.sin(a), 0.5])
            w2c = syn.look_at_pose(cam_pos, np.zeros(3))
            c2w = np.asarray(P.pose_inverse(jnp.asarray(w2c)))
            depth = render_sphere_depth(c2w, np.asarray(focal), np.asarray(center),
                                        (320, 240))
            grid = tsdf.integrate_depth_image(grid, jnp.asarray(depth), focal,
                                              center, jnp.asarray(c2w))
        return grid

    def test_fused_zero_crossing_at_radius(self):
        grid = self._fuse_sphere()
        centers = np.asarray(tsdf.voxel_centers(grid))
        t = np.asarray(grid.tsdf)
        w = np.asarray(grid.weight)
        r = np.linalg.norm(centers, axis=-1)
        band = (np.abs(r - 1.0) < 0.03) & (w > 0)
        assert band.sum() > 100
        # tsdf near the surface should be near zero
        assert np.abs(t[band]).mean() < 0.25
        # clearly outside (observed free space): positive
        outside = (r > 1.15) & (r < 1.3) & (w > 1)
        assert t[outside].mean() > 0.5

    def test_mesh_extraction_sphere(self):
        grid = self._fuse_sphere()
        verts, faces, vint = marching.extract_mesh(grid)
        assert len(verts) > 300
        assert len(faces) > 300
        radii = np.linalg.norm(verts, axis=-1)
        # mesh lives on the unit sphere (voxel_size=0.0625 tolerance)
        assert abs(np.median(radii) - 1.0) < 0.05, np.median(radii)
        assert np.percentile(np.abs(radii - 1.0), 90) < 0.1
        # faces index valid vertices
        assert faces.max() < len(verts)

    def test_point_cloud_integration(self):
        """Unstructured cloud path (voxblox PCD role): same sphere via
        points instead of a depth image."""
        rng = np.random.default_rng(0)
        grid = tsdf.make_grid((40, 40, 40), origin=(-1.5, -1.5, -1.5),
                              voxel_size=3.0 / 40)
        pts_w = rng.normal(size=(20000, 3))
        pts_w /= np.linalg.norm(pts_w, axis=-1, keepdims=True)
        for i in range(6):
            a = 2 * np.pi * i / 6
            cam_pos = np.array([3 * np.cos(a), 3 * np.sin(a), 0.0])
            w2c = syn.look_at_pose(cam_pos, np.zeros(3))
            Xc = np.asarray(P.pose_apply(jnp.asarray(w2c), jnp.asarray(pts_w)))
            vis = Xc[:, 2] > 0.1
            c2w = np.asarray(P.pose_inverse(jnp.asarray(w2c)))
            grid = tsdf.integrate_point_cloud(
                grid, jnp.asarray(Xc[vis]), jnp.asarray(c2w),
                focal=(200.0, 200.0), image_size=(320, 240),
                intensities=jnp.ones(int(vis.sum())))
        verts, faces, vint = marching.extract_mesh(grid)
        assert len(verts) > 100
        radii = np.linalg.norm(verts, axis=-1)
        assert abs(np.median(radii) - 1.0) < 0.08, np.median(radii)
        # intensity carried through
        assert vint.max() > 0.5


class TestPly:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.default_rng(1)
        verts = rng.normal(size=(20, 3)).astype(np.float32)
        faces = rng.integers(0, 20, size=(9, 3)).astype(np.int32)
        inten = rng.uniform(size=20).astype(np.float32)
        p = tmp_path / "m.ply"
        ply.write_ply(p, verts, faces, intensity=inten, binary=True)
        out = ply.read_ply(p)
        np.testing.assert_allclose(out["vertices"], verts, atol=1e-6)
        np.testing.assert_array_equal(out["faces"], faces)
        np.testing.assert_allclose(out["intensity"], inten, atol=1e-6)

    def test_roundtrip_ascii_with_colors(self, tmp_path):
        rng = np.random.default_rng(2)
        verts = rng.normal(size=(11, 3)).astype(np.float32)
        colors = rng.integers(0, 255, size=(11, 3)).astype(np.uint8)
        p = tmp_path / "c.ply"
        ply.write_ply(p, verts, colors=colors, binary=False)
        out = ply.read_ply(p)
        np.testing.assert_allclose(out["vertices"], verts, atol=1e-5)
        np.testing.assert_array_equal(out["colors"], colors)

    def test_mesh_to_ply_and_back(self, tmp_path):
        grid = tsdf.make_grid((24, 24, 24), origin=(-1.5, -1.5, -1.5),
                              voxel_size=3.0 / 24)
        # analytic sphere SDF fill
        centers = tsdf.voxel_centers(grid)
        r = jnp.linalg.norm(centers, axis=-1)
        sdf = jnp.clip((r - 1.0) / grid.truncation, -1, 1)
        import dataclasses
        grid = dataclasses.replace(grid, tsdf=sdf.astype(jnp.float32),
                                   weight=jnp.ones_like(sdf, jnp.float32))
        verts, faces, vint = marching.extract_mesh(grid)
        p = tmp_path / "sphere.ply"
        ply.write_ply(p, verts, faces)
        out = ply.read_ply(p)
        assert len(out["vertices"]) == len(verts)
        assert len(out["faces"]) == len(faces)
