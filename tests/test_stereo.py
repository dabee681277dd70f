"""Plane-sweep stereo tests on a synthetic textured plane + slanted plane."""

import numpy as np
import jax.numpy as jnp

from multiview_tpu.dense import stereo
from multiview_tpu.geometry import pose as P


FOCAL = jnp.asarray([200.0, 200.0])
CENTER = jnp.asarray([128.0, 96.0])
SIZE = (256, 192)  # W,H


def render_plane(cam_to_world, plane_z=3.0, texture_seed=0, slant=0.0):
    """Render a textured plane z = plane_z + slant*x (world) from a camera."""
    rng = np.random.default_rng(texture_seed)
    # smooth random texture function on the plane, evaluated analytically
    freqs = rng.uniform(0.5, 4.0, size=(8, 2))
    phases = rng.uniform(0, 2 * np.pi, 8)
    amps = rng.uniform(0.3, 1.0, 8)

    def tex(x, y):
        out = np.zeros_like(x)
        for (fx, fy), p, a in zip(freqs, phases, amps):
            out += a * np.sin(fx * x + fy * y + p)
        return 0.5 + out / (2 * np.abs(amps).sum())

    W, H = SIZE
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    d = np.stack([(us - float(CENTER[0])) / float(FOCAL[0]),
                  (vs - float(CENTER[1])) / float(FOCAL[1]),
                  np.ones_like(us, float)], -1)
    M = np.asarray(P.pose_to_matrix(jnp.asarray(cam_to_world)))
    o = M[:3, 3]
    dw = d @ M[:3, :3].T
    # intersect z = plane_z + slant * x: o_z + t*d_z = plane_z + slant*(o_x + t*d_x)
    t = (plane_z + slant * o[0] - o[2]) / (dw[..., 2] - slant * dw[..., 0])
    pts = o + t[..., None] * dw
    img = tex(pts[..., 0], pts[..., 1]).astype(np.float32)
    depth_true = (t * d[..., 2]).astype(np.float32)  # z-depth
    return img, depth_true


class TestPlaneSweep:
    def _run(self, slant=0.0, baseline=0.3):
        # identity ref cam; neighbor translated along x
        ref_c2w = np.asarray(P.pose_identity(jnp.float64))
        nbr_c2w = np.asarray(P.make_pose(jnp.asarray([baseline, 0.0, 0.0]),
                                         P.quat_identity(jnp.float64)))
        ref_img, depth_true = render_plane(ref_c2w, slant=slant)
        nbr_img, _ = render_plane(nbr_c2w, slant=slant)
        # ref_to_nbr = (world_to_nbr) * (ref_to_world)
        w2n = P.pose_inverse(jnp.asarray(nbr_c2w))
        r2n = P.pose_compose(w2n, jnp.asarray(ref_c2w))
        res = stereo.plane_sweep(jnp.asarray(ref_img), jnp.asarray(nbr_img),
                                 FOCAL, CENTER, r2n, min_depth=1.5,
                                 max_depth=6.0, num_planes=96)
        return res, depth_true

    def test_frontoparallel_plane(self):
        res, depth_true = self._run(slant=0.0)
        v = np.asarray(res.valid)
        assert v.mean() > 0.5, f"valid fraction {v.mean()}"
        err = np.abs(np.asarray(res.depth) - depth_true)[v]
        assert np.median(err) < 0.03, f"median depth err {np.median(err)}"

    def test_slanted_plane(self):
        res, depth_true = self._run(slant=0.3)
        v = np.asarray(res.valid)
        assert v.mean() > 0.4
        rel = (np.abs(np.asarray(res.depth) - depth_true) / depth_true)[v]
        assert np.median(rel) < 0.02, f"median rel err {np.median(rel)}"

    def test_cloud_on_plane(self):
        res, depth_true = self._run(slant=0.0)
        pts = stereo.stereo_pair_to_cloud(res, np.asarray(FOCAL),
                                          np.asarray(CENTER), subsample=4)
        assert len(pts) > 300
        # points lie on the z=3 plane in the ref cam frame (= world here)
        assert abs(np.median(pts[:, 2]) - 3.0) < 0.05

    def test_left_right_consistency(self):
        res, depth_true = self._run()
        # right view result: swap roles
        ref_c2w = np.asarray(P.make_pose(jnp.asarray([0.3, 0.0, 0.0]),
                                         P.quat_identity(jnp.float64)))
        nbr_c2w = np.asarray(P.pose_identity(jnp.float64))
        ref_img, _ = render_plane(ref_c2w)
        nbr_img, _ = render_plane(nbr_c2w)
        w2n = P.pose_inverse(jnp.asarray(nbr_c2w))
        r2n_right = P.pose_compose(w2n, jnp.asarray(ref_c2w))
        res_r = stereo.plane_sweep(jnp.asarray(ref_img), jnp.asarray(nbr_img),
                                   FOCAL, CENTER, r2n_right, 1.5, 6.0,
                                   num_planes=96)
        w2r = P.pose_inverse(jnp.asarray(np.asarray(P.pose_identity(jnp.float64))))
        r2n = P.pose_compose(P.pose_inverse(jnp.asarray(ref_c2w)),
                             jnp.asarray(nbr_c2w))  # left->right cam
        checked = stereo.left_right_check(res, res_r, FOCAL, CENTER,
                                          P.pose_inverse(r2n))
        v0 = np.asarray(res.valid).mean()
        v1 = np.asarray(checked.valid).mean()
        assert 0 < v1 <= v0
        err = np.abs(np.asarray(checked.depth) - depth_true)[np.asarray(checked.valid)]
        assert np.median(err) < 0.03


class TestSGM:
    def test_sgm_matches_truth_and_smooths(self):
        """SGM aggregation recovers the slanted plane at least as accurately
        as raw WTA, and strictly reduces depth roughness (the point of the
        smoothness penalties)."""
        ref_c2w = np.asarray(P.pose_identity(jnp.float64))
        nbr_c2w = np.asarray(P.make_pose(jnp.asarray([0.3, 0.0, 0.0]),
                                         P.quat_identity(jnp.float64)))
        ref_img, depth_true = render_plane(ref_c2w, slant=0.15)
        nbr_img, _ = render_plane(nbr_c2w, slant=0.15)
        w2n = P.pose_inverse(jnp.asarray(nbr_c2w))
        r2n = P.pose_compose(w2n, jnp.asarray(ref_c2w))

        kw = dict(min_depth=1.5, max_depth=6.0, num_planes=96)
        wta = stereo.plane_sweep(jnp.asarray(ref_img), jnp.asarray(nbr_img),
                                 FOCAL, CENTER, r2n, **kw)
        sgm = stereo.plane_sweep(jnp.asarray(ref_img), jnp.asarray(nbr_img),
                                 FOCAL, CENTER, r2n, aggregate="sgm", **kw)

        def err(res):
            v = np.asarray(res.valid)
            return np.median(np.abs(np.asarray(res.depth)[v] - depth_true[v]))

        def roughness(res):
            d = np.asarray(res.depth)
            v = np.asarray(res.valid)
            g = np.abs(np.diff(d, axis=1))
            vv = v[:, 1:] & v[:, :-1]
            return float(np.mean(g[vv]))

        assert err(sgm) < 0.05, f"sgm median err {err(sgm)}"
        assert err(sgm) <= err(wta) * 1.2
        assert roughness(sgm) <= roughness(wta), \
            f"sgm roughness {roughness(sgm)} vs wta {roughness(wta)}"

    def test_sgm_aggregate_identity_on_uniform(self):
        """With a flat cost volume the aggregation adds no disparity bias:
        argmin stays wherever the raw cost minimum is."""
        rng = np.random.default_rng(0)
        H, W, D = 16, 20, 12
        base = np.full((H, W, D), 1.0, np.float32)
        trough = rng.integers(0, D, size=(H, W))
        base[np.arange(H)[:, None], np.arange(W)[None, :], trough] = 0.0
        # strong unambiguous minima survive aggregation exactly
        agg = np.asarray(stereo.sgm_aggregate(jnp.asarray(base),
                                              p1=0.05, p2=0.5))
        got = agg.argmin(axis=-1)
        assert (got == trough).mean() > 0.95
