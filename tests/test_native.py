"""Native runtime tests: C++ vs Python parity + track builder regression."""

import numpy as np
import pytest

from multiview_tpu import native
from multiview_tpu.sfm import tracks


class TestNativeCore:
    def test_library_compiles(self):
        assert native.available(), "native library failed to build"

    def test_union_find_parity(self):
        rng = np.random.default_rng(0)
        n = 500
        edges = rng.integers(0, n, size=(800, 2)).astype(np.int64)
        roots = native.union_find_roots(n, edges)
        # same connected components as a BFS reference
        import collections
        adj = collections.defaultdict(list)
        for a, b in edges:
            adj[a].append(b)
            adj[b].append(a)
        comp = -np.ones(n, int)
        c = 0
        for s in range(n):
            if comp[s] >= 0:
                continue
            stack = [s]
            comp[s] = c
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if comp[y] < 0:
                        comp[y] = c
                        stack.append(y)
            c += 1
        # identical partitioning
        for a, b in edges:
            assert roots[a] == roots[b]
        _, inv_r = np.unique(roots, return_inverse=True)
        _, inv_c = np.unique(comp, return_inverse=True)
        assert (inv_r == inv_r[0]).all() == (inv_c == inv_c[0]).all()
        # same number of components
        assert len(np.unique(roots)) == len(np.unique(comp))

    def test_dedup_parity(self):
        rng = np.random.default_rng(1)
        base = rng.normal(size=(40, 2))
        xy = base[rng.integers(0, 40, size=200)]
        ids, uniq = native.dedup_keypoints_array(xy)
        assert len(uniq) == len(np.unique(xy, axis=0))
        np.testing.assert_array_equal(uniq[ids], xy)

    def test_read_files(self, tmp_path):
        paths = []
        contents = []
        for i in range(20):
            p = tmp_path / f"f{i}.bin"
            data = bytes(np.random.default_rng(i).integers(0, 256, 100 + i,
                                                           dtype=np.uint8))
            p.write_bytes(data)
            paths.append(str(p))
            contents.append(data)
        paths.append(str(tmp_path / "missing.bin"))
        out = native.read_files(paths, num_threads=4)
        for i in range(20):
            assert out[i] == contents[i]
        assert out[20] is None


class TestVectorizedTracks:
    def test_same_results_as_before(self):
        """The rewritten (native + vectorized) build_tracks must produce the
        same tracks as the straightforward semantics."""
        kp = {0: (10.0, 10.0), 1: (50.0, 50.0)}
        pm = {
            (0, 1): (np.array([[10.0, 10.0]]), np.array([[11.0, 10.0]])),
            (1, 2): (np.array([[11.0, 10.0]]), np.array([[12.0, 10.0]])),
            (0, 2): (np.array([[50.0, 50.0]]), np.array([[55.0, 55.0]])),
        }
        ts = tracks.build_tracks(pm, 3)
        lens = sorted(len(t) for t in ts.tracks)
        assert lens == [2, 3]

    def test_large_scale_speed(self):
        """A million-edge merge must complete quickly (native path)."""
        import time
        rng = np.random.default_rng(2)
        n_img = 50
        per_img = 2000
        pm = {}
        for i in range(n_img - 1):
            # chain matches: feature k in image i <-> feature k in image i+1
            xs = np.arange(per_img, dtype=float)
            left = np.stack([xs, np.full(per_img, float(i))], 1)
            right = np.stack([xs, np.full(per_img, float(i + 1))], 1)
            pm[(i, i + 1)] = (left, right)
        t0 = time.time()
        ts = tracks.build_tracks(pm, n_img)
        dt = time.time() - t0
        assert len(ts.tracks) == per_img
        assert all(len(t) == n_img for t in ts.tracks)
        assert dt < 20.0, f"track building took {dt:.1f}s"
