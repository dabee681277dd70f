"""Global SfM initializer tests: rotation averaging, position estimation,
and the full pipeline from synthetic correspondences -> poses -> BA (config 3
logic on synthetic data)."""

import numpy as np
import jax
import jax.numpy as jnp

from multiview_tpu.geometry import pose as P
from multiview_tpu.geometry import registration as reg
from multiview_tpu.sfm import global_sfm as g
from multiview_tpu.utils import synthetic as syn


def make_graph(n_views, noise=0.0, outlier_frac=0.0, seed=0, overlap=3):
    """Ground-truth poses on a ring + view graph with consecutive edges."""
    rng = np.random.default_rng(seed)
    w2c = syn.ring_poses(n_views)
    q_true = np.asarray(P.pose_q(jnp.asarray(w2c)))
    ctr = np.asarray(P.pose_t(P.pose_inverse(jnp.asarray(w2c))))

    edges, rots, dirs, weights = [], [], [], []
    for i in range(n_views):
        for j in range(i + 1, min(i + 1 + overlap, n_views)):
            q_ij = P.quat_mul(jnp.asarray(q_true[j]), P.quat_conj(jnp.asarray(q_true[i])))
            if noise > 0:
                q_ij = P.quat_mul(P.quat_exp(jnp.asarray(rng.normal(size=3) * noise)), q_ij)
            d = ctr[j] - ctr[i]
            d = d / np.linalg.norm(d)
            if noise > 0:
                d = d + rng.normal(size=3) * noise
                d /= np.linalg.norm(d)
            if rng.uniform() < outlier_frac:
                q_ij = P.quat_normalize(jnp.asarray(rng.normal(size=4)))
                d = rng.normal(size=3)
                d /= np.linalg.norm(d)
            edges.append((i, j))
            rots.append(np.asarray(q_ij))
            dirs.append(d)
            weights.append(100.0)
    graph = g.ViewGraph(jnp.asarray(np.asarray(edges, np.int32)),
                        jnp.asarray(np.stack(rots)),
                        jnp.asarray(np.stack(dirs)),
                        jnp.asarray(np.asarray(weights)))
    return graph, w2c, q_true, ctr


def rot_errors_deg(q_est, q_true):
    """Per-view rotation error after global gauge alignment.

    The averaging gauge is a RIGHT world-rotation: R_est_v = R_true_v G.
    Align with G = R_est_0^-1 R_true_0 and measure log(R_adj^-1 R_true)."""
    g_align = P.quat_mul(P.quat_conj(q_est[0]), jnp.asarray(q_true[0]))
    errs = []
    for v in range(len(q_true)):
        q_adj = P.quat_mul(q_est[v], g_align)
        e = np.linalg.norm(np.asarray(P.quat_log(
            P.quat_mul(P.quat_conj(q_adj), jnp.asarray(q_true[v])))))
        errs.append(np.degrees(e))
    return np.asarray(errs)


class TestRotationAveraging:
    def test_exact_graph(self):
        graph, w2c, q_true, _ = make_graph(12)
        q = g.rotation_averaging(graph, 12)
        errs = rot_errors_deg(q, q_true)
        assert errs.max() < 1e-6, f"max rot err {errs.max()} deg"

    def test_noisy_graph(self):
        graph, w2c, q_true, _ = make_graph(12, noise=0.01)
        q = g.rotation_averaging(graph, 12)
        errs = rot_errors_deg(q, q_true)
        assert errs.max() < 1.5, f"max rot err {errs.max()} deg"

    def test_outlier_edges_filtered(self):
        """Outlier edges can poison the spanning-tree init; the robust
        variant filters them and re-initializes."""
        graph, w2c, q_true, _ = make_graph(14, noise=0.005, outlier_frac=0.15, seed=3)
        q, filtered = g.robust_rotation_averaging(graph, 14)
        errs = rot_errors_deg(q, q_true)
        assert errs.max() < 3.0, f"max rot err {errs.max()} deg"
        assert filtered.edges.shape[0] < graph.edges.shape[0]  # outliers dropped


class TestPositionEstimation:
    def test_exact_positions(self):
        graph, w2c, q_true, ctr = make_graph(12)
        c = g.position_estimation(graph, jnp.asarray(q_true), 12)
        # similarity-align (scale+shift; rotation should be identity gauge)
        scale, T = reg.find_similarity_transform(c, jnp.asarray(ctr))
        aligned = np.asarray(reg.apply_similarity(scale, T, c))
        err = np.linalg.norm(aligned - ctr, axis=-1).max()
        assert err < 1e-4 * np.abs(ctr).max(), f"pos err {err}"


class TestFullPipeline:
    def test_correspondences_to_poses(self):
        """Synthetic 3D points -> pairwise unit-plane matches -> essential
        RANSAC -> averaging -> positions; ATE small after alignment."""
        rng = np.random.default_rng(5)
        n_views = 8
        w2c = syn.ring_poses(n_views, radius=3.0)
        pts = syn.cube_points(5) * 2.0  # bigger cube for parallax

        pair_data = {}
        for i in range(n_views):
            for j in (i + 1, i + 2):
                if j >= n_views:
                    continue
                Xi = np.asarray(P.pose_apply(jnp.asarray(w2c[i]), jnp.asarray(pts)))
                Xj = np.asarray(P.pose_apply(jnp.asarray(w2c[j]), jnp.asarray(pts)))
                vis = (Xi[:, 2] > 0.1) & (Xj[:, 2] > 0.1)
                x1 = Xi[vis, :2] / Xi[vis, 2:]
                x2 = Xj[vis, :2] / Xj[vis, 2:]
                if vis.sum() >= 16:
                    pair_data[(i, j)] = (x1, x2)

        poses = g.run_global_sfm(pair_data, n_views)
        ctr_true = np.asarray(P.pose_t(P.pose_inverse(jnp.asarray(w2c))))
        ctr_est = np.asarray(P.pose_t(P.pose_inverse(poses)))
        scale, T = reg.find_similarity_transform(jnp.asarray(ctr_est),
                                                 jnp.asarray(ctr_true))
        aligned = np.asarray(reg.apply_similarity(scale, T, jnp.asarray(ctr_est)))
        ate = np.sqrt(np.mean(np.sum((aligned - ctr_true) ** 2, -1)))
        assert ate < 0.02, f"ATE {ate}"

    def test_disconnected_graph_largest_component(self):
        """A view graph with two disjoint clusters reconstructs the larger
        one and flags the rest unregistered (Theia exports only estimated
        views; no crash)."""
        n_views = 8
        w2c = syn.ring_poses(n_views, radius=3.0)
        pts = syn.cube_points(5) * 2.0
        pair_data = {}
        # edges only within {0..4} and within {5..7}: disconnected
        for i in range(n_views):
            for j in (i + 1, i + 2):
                if j >= n_views or (i < 5) != (j < 5):
                    continue
                Xi = np.asarray(P.pose_apply(jnp.asarray(w2c[i]), jnp.asarray(pts)))
                Xj = np.asarray(P.pose_apply(jnp.asarray(w2c[j]), jnp.asarray(pts)))
                vis = (Xi[:, 2] > 0.1) & (Xj[:, 2] > 0.1)
                if vis.sum() >= 16:
                    pair_data[(i, j)] = (Xi[vis, :2] / Xi[vis, 2:],
                                         Xj[vis, :2] / Xj[vis, 2:])
        poses, mask = g.run_global_sfm(pair_data, n_views, return_mask=True)
        assert mask.tolist() == [True] * 5 + [False] * 3
        ctr_true = np.asarray(P.pose_t(P.pose_inverse(jnp.asarray(w2c[:5]))))
        ctr_est = np.asarray(P.pose_t(P.pose_inverse(poses[:5])))
        scale, T = reg.find_similarity_transform(jnp.asarray(ctr_est),
                                                 jnp.asarray(ctr_true))
        aligned = np.asarray(reg.apply_similarity(scale, T, jnp.asarray(ctr_est)))
        ate = np.sqrt(np.mean(np.sum((aligned - ctr_true) ** 2, -1)))
        assert ate < 0.05, f"component ATE {ate}"

    def test_gate_dropped_bridge_reconstructs_component(self):
        """pair_data connectivity is necessary but NOT sufficient: the
        two-view gates drop edges (here: a bridge pair with <8 matches),
        leaving the BUILT graph disconnected even though pair_data is
        connected — first observed on the 298-image interleaved-rig scene
        (cross-sensor pairs whose matches fail the gates). run_global_sfm
        must reconstruct the largest kept-edge component, not crash."""
        n_views = 8
        w2c = syn.ring_poses(n_views, radius=3.0)
        pts = syn.cube_points(5) * 2.0
        pair_data = {}
        for i in range(n_views):
            for j in (i + 1, i + 2):
                if j >= n_views or (i < 5) != (j < 5):
                    continue
                Xi = np.asarray(P.pose_apply(jnp.asarray(w2c[i]), jnp.asarray(pts)))
                Xj = np.asarray(P.pose_apply(jnp.asarray(w2c[j]), jnp.asarray(pts)))
                vis = (Xi[:, 2] > 0.1) & (Xj[:, 2] > 0.1)
                if vis.sum() >= 16:
                    pair_data[(i, j)] = (Xi[vis, :2] / Xi[vis, 2:],
                                         Xj[vis, :2] / Xj[vis, 2:])
        # the bridge: connects the clusters in pair_data but carries only
        # 4 matches, below the K >= 8 build gate -> dropped from the graph
        rng = np.random.default_rng(3)
        pair_data[(4, 5)] = (rng.uniform(-0.5, 0.5, (4, 2)),
                             rng.uniform(-0.5, 0.5, (4, 2)))
        poses, mask = g.run_global_sfm(pair_data, n_views, return_mask=True)
        assert mask.tolist() == [True] * 5 + [False] * 3
        ctr_true = np.asarray(P.pose_t(P.pose_inverse(jnp.asarray(w2c[:5]))))
        ctr_est = np.asarray(P.pose_t(P.pose_inverse(poses[:5])))
        scale, T = reg.find_similarity_transform(jnp.asarray(ctr_est),
                                                 jnp.asarray(ctr_true))
        aligned = np.asarray(reg.apply_similarity(scale, T, jnp.asarray(ctr_est)))
        ate = np.sqrt(np.mean(np.sum((aligned - ctr_true) ** 2, -1)))
        assert ate < 0.05, f"component ATE {ate}"

    def test_noisy_correspondences(self):
        """Regression: measurement noise must not flip baseline directions
        (the cheirality depth-sign bug) nor blow up E estimates (inlier
        refit)."""
        rng = np.random.default_rng(7)
        n_views = 10
        w2c = syn.ring_poses(n_views)
        pts = syn.cube_points(5) * 2.0
        pair_data = {}
        for i in range(n_views):
            for j in (i + 1, i + 2):
                if j >= n_views:
                    continue
                Xi = np.asarray(P.pose_apply(jnp.asarray(w2c[i]), jnp.asarray(pts)))
                Xj = np.asarray(P.pose_apply(jnp.asarray(w2c[j]), jnp.asarray(pts)))
                vis = (Xi[:, 2] > 0.1) & (Xj[:, 2] > 0.1)
                x1 = Xi[vis, :2] / Xi[vis, 2:] + rng.normal(size=(vis.sum(), 2)) * 5e-4
                x2 = Xj[vis, :2] / Xj[vis, 2:] + rng.normal(size=(vis.sum(), 2)) * 5e-4
                if vis.sum() >= 16:
                    pair_data[(i, j)] = (x1, x2)
        poses = g.run_global_sfm(pair_data, n_views)
        ctr_true = np.asarray(P.pose_t(P.pose_inverse(jnp.asarray(w2c))))
        ctr_est = np.asarray(P.pose_t(P.pose_inverse(poses)))
        scale, T = reg.find_similarity_transform(jnp.asarray(ctr_est),
                                                 jnp.asarray(ctr_true))
        aligned = np.asarray(reg.apply_similarity(scale, T, jnp.asarray(ctr_est)))
        ate = np.sqrt(np.mean(np.sum((aligned - ctr_true) ** 2, -1)))
        assert ate < 0.1, f"noisy ATE {ate}"


class TestCollinearTrajectories:
    """Direction-only position averaging cannot recover spacing along a
    straight-line trajectory; baseline-scale recovery from shared-track
    range ratios can (run_global_sfm with pair_pids)."""

    @staticmethod
    def _collinear_pair_data(n_views=6, step=None):
        w2c = []
        for i in range(n_views):
            pos = np.array([(step[i] if step is not None else 0.4 * i),
                            0.1 * i, 2.0 + 0.05 * i])
            w2c.append(syn.look_at_pose(pos, pos + np.array([0.15, 0.0, -1.0])))
        w2c = np.stack(w2c)
        pts = syn.cube_points(6) * np.array([2.5, 2.5, 0.2]) \
            + np.array([1.0, 0.3, 0.0])
        pair_data, pair_pids = {}, {}
        pid = np.arange(len(pts))
        for i in range(n_views):
            for j in (i + 1, i + 2):
                if j >= n_views:
                    continue
                Xi = np.asarray(P.pose_apply(jnp.asarray(w2c[i]), jnp.asarray(pts)))
                Xj = np.asarray(P.pose_apply(jnp.asarray(w2c[j]), jnp.asarray(pts)))
                vis = (Xi[:, 2] > 0.1) & (Xj[:, 2] > 0.1)
                if vis.sum() >= 16:
                    pair_data[(i, j)] = (Xi[vis, :2] / Xi[vis, 2:],
                                         Xj[vis, :2] / Xj[vis, 2:])
                    pair_pids[(i, j)] = pid[vis]
        return w2c, pair_data, pair_pids

    def test_uniform_spacing_recovered(self):
        w2c, pair_data, pair_pids = self._collinear_pair_data()
        poses = g.run_global_sfm(pair_data, len(w2c), pair_pids=pair_pids)
        ctr_true = np.asarray(P.pose_t(P.pose_inverse(jnp.asarray(w2c))))
        ctr_est = np.asarray(P.pose_t(P.pose_inverse(poses)))
        scale, T = reg.find_similarity_transform(jnp.asarray(ctr_est),
                                                 jnp.asarray(ctr_true))
        aligned = np.asarray(reg.apply_similarity(scale, T, jnp.asarray(ctr_est)))
        ate = np.sqrt(np.mean(np.sum((aligned - ctr_true) ** 2, -1)))
        assert ate < 0.02, f"collinear ATE {ate}"

    def test_nonuniform_spacing_recovered(self):
        """The real test: unequal gaps along the line (pure direction
        averaging would return *some* collinear solution, but not this one)."""
        step = np.array([0.0, 0.2, 1.0, 1.2, 2.4, 2.6])
        w2c, pair_data, pair_pids = self._collinear_pair_data(step=step)
        poses = g.run_global_sfm(pair_data, len(w2c), pair_pids=pair_pids)
        ctr_est = np.asarray(P.pose_t(P.pose_inverse(poses)))
        d01 = np.linalg.norm(ctr_est[1] - ctr_est[0])
        d12 = np.linalg.norm(ctr_est[2] - ctr_est[1])
        # true ratio is 4.0
        assert d12 > 2.5 * d01, f"{d12} !> 2.5*{d01}"

    def test_edge_scales_from_ranges(self):
        """Two edges sharing view 1 with known range ratios."""
        graph = g.ViewGraph(
            edges=jnp.asarray(np.array([[0, 1], [1, 2]], np.int32)),
            rel_rot=jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (2, 1)),
            rel_dir=jnp.asarray(np.array([[1.0, 0, 0], [1.0, 0, 0]])),
            weight=jnp.ones(2))
        # edge 0 has unit baseline metric where track ranges are 2x edge 1's
        # => s_0 * r_0 = s_1 * r_1 => s_1 = 2 s_0
        ranges = [
            {0: {}, 1: {10: 2.0, 11: 4.0, 12: 6.0}},
            {1: {10: 1.0, 11: 2.0, 12: 3.0}, 2: {}},
        ]
        s = g.edge_scales_from_ranges(graph, ranges)
        np.testing.assert_allclose(s[1] / s[0], 2.0, rtol=1e-6)


class TestDirectionOutlierFiltering:
    """Relative-translation outlier filtering (theia_flags.txt:93,
    SURVEY 2.2): corrupted direction edges must be detected and position
    estimation must survive them (VERDICT r3 #5). Two mechanisms: triplet
    closure (positivity of loop scales) and 1DSfM projection consensus."""

    @staticmethod
    def _corrupt_directions(graph, frac, seed=5, reversals_only=False):
        rng = np.random.default_rng(seed)
        d = np.asarray(graph.rel_dir).copy()
        E = len(d)
        bad = rng.uniform(size=E) < frac
        # adversarial: REVERSED and random directions (reversal is the
        # worst case for ordering-based detection)
        for e in np.nonzero(bad)[0]:
            if reversals_only or rng.uniform() < 0.5:
                d[e] = -d[e]
            else:
                v = rng.normal(size=3)
                d[e] = v / np.linalg.norm(v)
        return graph._replace(rel_dir=jnp.asarray(d)), bad

    def test_triplet_filter_flags_corrupted_edges(self):
        graph, w2c, q_true, ctr = make_graph(16, noise=0.005, overlap=4)
        bad_graph, bad = self._corrupt_directions(graph, 0.18)
        filtered, keep = g.filter_directions_triplet(bad_graph)
        assert (~keep[bad]).mean() >= 0.9, \
            f"only {(~keep[bad]).mean():.0%} of corrupted edges flagged"
        assert keep[~bad].mean() >= 0.85, \
            f"only {keep[~bad].mean():.0%} of clean edges kept"

    def test_positions_survive_direction_outliers(self):
        """The functional goal: 18% corrupted directions, recovered
        positions still match ground truth after the filter chain.
        (Measured WITHOUT filtering the IRLS position solve collapses:
        relative error ~4.4 — the filter is load-bearing, not belt and
        braces.)"""
        graph, w2c, q_true, ctr = make_graph(24, noise=0.005, overlap=6)
        bad_graph, bad = self._corrupt_directions(graph, 0.18)
        filtered, _ = g.filter_directions_triplet(bad_graph)
        filtered, _ = g.filter_directions_1dsfm(filtered)
        c = g.position_estimation(filtered, jnp.asarray(q_true), 24)
        scale, T = reg.find_similarity_transform(c, jnp.asarray(ctr))
        aligned = np.asarray(reg.apply_similarity(scale, T, c))
        rel = np.linalg.norm(aligned - ctr, axis=-1).max() / np.abs(ctr).max()
        assert rel < 0.05, f"relative position err {rel:.3f} with outliers"

    def test_triangle_free_graph_positions_survive(self):
        """Where the triplet filter is blind (triangle-free gap-{2,3,8}
        graph) and ordering consensus lacks directed-path redundancy,
        isolated reversed directions must be absorbed by the soft-L1 IRLS
        itself: the filter chain stays conservative (graph connected, most
        clean edges kept) and positions still recover. Measured here:
        3/35 reversed long edges -> relative position error ~0 after IRLS
        (soft-L1 downweights them); the filter chain never makes it worse."""
        from multiview_tpu import native
        from multiview_tpu.utils import synthetic as syn

        V = 16
        ctr = np.stack([np.arange(V, dtype=float),
                        np.sin(np.arange(V) * 0.7),
                        np.cos(np.arange(V) * 0.5)], 1)
        edges, dirs = [], []
        for i in range(V):
            for gp in (2, 3, 8):
                j = i + gp
                if j >= V:
                    continue
                d = ctr[j] - ctr[i]
                edges.append((i, j))
                dirs.append(d / np.linalg.norm(d))
        edges = np.asarray(edges, np.int32)
        dirs = np.stack(dirs)
        E = len(edges)
        bad = np.zeros(E, bool)
        for e, (i, j) in enumerate(edges):
            if j - i == 8 and i % 3 == 0:
                dirs[e] = -dirs[e]
                bad[e] = True
        graph = g.ViewGraph(jnp.asarray(edges),
                            jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (E, 1)),
                            jnp.asarray(dirs), jnp.ones(E) * 100)
        _, keep_t = g.filter_directions_triplet(graph)
        assert keep_t.all()  # triangle-free: triplet filter is a no-op
        filtered, keep = g.filter_directions_1dsfm(graph)
        # conservative: connected, and the surviving graph still recovers
        sub = np.asarray(filtered.edges)
        roots = native.union_find_roots(V, sub.astype(np.int64))
        assert len(np.unique(roots)) == 1
        q_fake = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (V, 1))
        c = g.position_estimation(filtered, q_fake, V)
        scale, T = reg.find_similarity_transform(c, jnp.asarray(ctr))
        aligned = np.asarray(reg.apply_similarity(scale, T, c))
        rel = np.linalg.norm(aligned - ctr, axis=-1).max() / np.abs(ctr).max()
        assert rel < 0.02, f"relative position err {rel:.3f}"

    def test_filters_noop_on_clean_graph(self):
        graph, *_ = make_graph(12, noise=0.01)
        _, keep_t = g.filter_directions_triplet(graph)
        _, keep_p = g.filter_directions_1dsfm(graph)
        assert keep_t.mean() >= 0.9
        assert keep_p.mean() >= 0.9

    def test_filter_never_disconnects(self):
        """A filtering that strands views must fall back to no-op."""
        graph, *_ = make_graph(8, noise=0.0, overlap=1)  # bare cycle
        bad_graph, bad = self._corrupt_directions(graph, 0.5, seed=2,
                                                  reversals_only=True)
        filtered, keep = g.filter_directions_1dsfm(bad_graph, threshold=0.01)
        # either kept everything (fallback) or stayed connected
        from multiview_tpu import native
        edges = np.asarray(filtered.edges)
        roots = native.union_find_roots(8, edges.astype(np.int64))
        touched = np.zeros(8, bool)
        touched[edges.reshape(-1)] = True
        assert touched.all() and len(np.unique(roots)) == 1
