"""Front-end orchestration: detect + match + verify + track-build across an
image sequence.

The role of ``detectMatchFeatures``
(`/root/reference/rig_calibrator/src/interest_point.cc:453-647`): detect
features in every image, match each image against the next ``num_overlaps``
images in time, RANSAC-filter each pair (affine2D, 20px), optionally filter
by reprojection against known cameras (matchFeaturesWithCams,
:181-301), then merge pairwise matches into tracks. The reference
parallelizes with a pthread pool; here detection batches per image on
device and pair matching is one MXU matmul per pair.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from multiview_tpu.sfm import features as feat_mod
from multiview_tpu.sfm import matching as match_mod
from multiview_tpu.sfm import ransac as ransac_mod
from multiview_tpu.sfm import tracks as tracks_mod
from multiview_tpu.geometry import pose as pose_mod
from multiview_tpu.geometry import triangulation as tri_mod


@dataclasses.dataclass
class FrontendConfig:
    max_features: int = 1000          # reference SIFT default is 10000
    ratio: float = 0.8                # FLANN ratio test (matching.cc:205-210)
    ransac_threshold: float = 20.0    # estimateAffine2D thresh (interest_point.cc:134)
    num_overlaps: int = 2             # pair set: each image vs next k (ip.cc:498-502)
    min_pair_matches: int = 8
    cam_filter_reproj_px: Optional[float] = None  # matchFeaturesWithCams gate
    # detector family: "sift" (DoG) or "surf" (determinant-of-Hessian) —
    # the reference's -feature_detector choice (matching.cc:48-183)
    feature_detector: str = "sift"
    # detector tuning (reference flags, interest_point.cc:51-57)
    num_scales: int = 3               # --sift_nOctaveLayers
    num_octaves: int = 4
    sigma0: float = 1.6               # --sift_sigma
    # None -> per-detector default (SIFT DoG contrast / SURF Hessian resp.)
    contrast_threshold: Optional[float] = None  # --sift_contrastThreshold
    edge_threshold: float = 10.0      # --sift_edgeThreshold

    @property
    def detect_threshold(self) -> float:
        if self.contrast_threshold is not None:
            return self.contrast_threshold
        return feat_mod.default_threshold(self.feature_detector)
    # >0: select match pairs by global-descriptor retrieval (each image vs
    # its K most similar) instead of temporal num_overlaps — Theia's
    # num_nearest_neighbors_for_global_descriptor_matching
    # (theia_flags.txt:57-62)
    retrieval_neighbors: int = 0
    retrieval_clusters: int = 16      # num_gmm_clusters_for_fisher_vector
    # out-of-core matching (Theia's --match_out_of_core /
    # --matching_working_directory / --matching_max_num_images_in_cache,
    # theia_flags.txt:30-46): features spill to disk per image and are
    # re-read through an LRU cache, so collections far larger than memory
    # can be matched
    match_out_of_core: bool = False
    matching_working_directory: Optional[str] = None
    matching_max_num_images_in_cache: int = 128


class FeatureStore:
    """Disk-backed per-image feature store with an LRU read cache —
    Theia's out-of-core matching role (`theia_flags.txt:30-46`). Features
    are written once per image as ``feat_<idx>.npz`` and read back on
    demand; at most ``max_in_cache`` images stay resident."""

    def __init__(self, workdir, max_in_cache: int = 128):
        import os
        from collections import OrderedDict
        self.dir = str(workdir)
        os.makedirs(self.dir, exist_ok=True)
        self.max_in_cache = max(1, int(max_in_cache))
        self._cache = OrderedDict()
        self.n = 0

    def _path(self, idx: int) -> str:
        import os
        return os.path.join(self.dir, f"feat_{idx:06d}.npz")

    def put(self, idx: int, kp, desc):
        kp = feat_mod.Keypoints(*(np.asarray(x) for x in kp))
        desc = np.asarray(desc)
        np.savez(self._path(idx), xy=kp.xy, scale=kp.scale,
                 response=kp.response, angle=kp.angle, valid=kp.valid,
                 desc=desc)
        self.n = max(self.n, idx + 1)
        self._insert(idx, (kp, desc))

    def _load(self, idx: int):
        with np.load(self._path(idx)) as z:
            kp = feat_mod.Keypoints(z["xy"], z["scale"], z["response"],
                                    z["angle"], z["valid"])
            return kp, z["desc"]

    def _insert(self, idx, item):
        self._cache[idx] = item
        self._cache.move_to_end(idx)
        while len(self._cache) > self.max_in_cache:
            self._cache.popitem(last=False)

    def get(self, idx: int):
        if idx in self._cache:
            self._cache.move_to_end(idx)
            return self._cache[idx]
        item = self._load(idx)
        self._insert(idx, item)
        return item

    class _View:
        def __init__(self, store, which):
            self._store, self._which = store, which

        def __len__(self):
            return self._store.n

        def __getitem__(self, idx):
            return self._store.get(idx)[self._which]

        def __iter__(self):
            return (self[i] for i in range(len(self)))

    @property
    def kps(self):
        return FeatureStore._View(self, 0)

    @property
    def descs(self):
        return FeatureStore._View(self, 1)


def detect_all(images: Sequence[np.ndarray], cfg: FrontendConfig,
               batch: bool = True, chunk: int = 8,
               store: Optional[FeatureStore] = None, mesh=None):
    """Detect + describe every image. Returns (keypoints list, descriptor
    list).

    With ``batch`` (default), same-shape images are stacked and detected by
    one vmapped kernel per chunk — one device dispatch for the whole DoG
    pyramid + descriptor pass of up to ``chunk`` images (the reference
    instead queues one ThreadPool task per image, interest_point.cc:483-492).
    Images whose detection comes back under the adaptive-threshold floor are
    re-run individually with the reference's DynamicDetector-style retry
    loop (matching.cc:48-183)."""
    import jax

    n = len(images)
    kps: list = [None] * n
    descs: list = [None] * n
    min_features = max(8, cfg.max_features // 10)

    def emit(i, kp, d):
        """Route one image's features to memory or the disk store (the
        store path frees them immediately — streaming detection)."""
        if store is not None:
            import jax as _jax
            store.put(i, _jax.tree.map(np.asarray, kp), np.asarray(d))
        else:
            kps[i], descs[i] = kp, d

    # group by shape (sensors differ; images within a sensor agree)
    groups: Dict[Tuple[int, int], list] = {}
    for i, img in enumerate(images):
        groups.setdefault(np.asarray(img).shape, []).append(i)

    detect_batched = _detect_batched_fn(
        cfg.max_features, cfg.num_scales, cfg.num_octaves, cfg.sigma0,
        cfg.detect_threshold, cfg.edge_threshold, cfg.feature_detector,
        min_features, mesh=mesh)
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        chunk = max(chunk, n_dev)
        chunk += (-chunk) % n_dev

    def detect_dynamic(i):
        return feat_mod.detect_and_describe_dynamic(
            jnp.asarray(images[i], jnp.float32),
            max_features=cfg.max_features, num_scales=cfg.num_scales,
            num_octaves=cfg.num_octaves, sigma0=cfg.sigma0,
            contrast_threshold=cfg.detect_threshold,
            edge_threshold=cfg.edge_threshold,
            detector=cfg.feature_detector)

    for shape, ids in groups.items():
        if not batch or len(ids) == 1:
            for i in ids:
                emit(i, *detect_dynamic(i))
            continue
        csize = chunk if mesh is not None else min(chunk, len(ids))
        use_fused = mesh is None and jax.default_backend() != "cpu"
        if use_fused:
            # smaller chunks pipeline better through the dispatch tunnel:
            # chunk c+1's upload and dispatch overlap chunk c's compute
            # (measured: 8 images as 2x4 beat 1x8 — the lone chunk
            # serializes upload -> compute -> sync)
            csize = min(4, len(ids))
            # PIPELINED fused path: dispatch EVERY chunk's upload + fused
            # detect/describe before syncing any counts — uploads and the
            # counts round-trips of chunk c overlap chunk c+1's compute
            # (through the remote tunnel an upload alone is ~80 ms).
            # Images ship uint8 at native byte width (normalized on
            # device); one fused dispatch per chunk does detect + bucketed
            # describe + per-image unstacking.
            fused = _detect_describe_fused_fn(
                cfg.max_features, cfg.num_scales, cfg.num_octaves,
                cfg.sigma0, cfg.detect_threshold, cfg.edge_threshold,
                cfg.feature_detector, min_features, csize)
            def drain(item):
                sel, (outs, counts_d) = item
                counts = np.asarray(counts_d)
                for row, i in enumerate(sel):
                    if counts[row] >= min_features:
                        emit(i, *outs[row])
                    else:
                        emit(i, *feat_mod.detect_and_describe_dynamic(
                            jnp.asarray(np.asarray(images[i], np.float32)),
                            max_features=cfg.max_features,
                            num_scales=cfg.num_scales,
                            num_octaves=cfg.num_octaves, sigma0=cfg.sigma0,
                            contrast_threshold=cfg.detect_threshold * 0.25 ** 4,
                            edge_threshold=cfg.edge_threshold,
                            detector=cfg.feature_detector))

            inflight: list = []
            max_inflight = 4   # bounds device residency of pending chunks
            for c0 in range(0, len(ids), csize):
                sel = ids[c0:c0 + csize]
                padded = sel + [sel[0]] * (csize - len(sel))
                first = np.asarray(images[padded[0]])
                dt = np.uint8 if first.dtype == np.uint8 else np.float32
                stack = jnp.asarray(np.stack([np.asarray(images[i], dt)
                                              for i in padded]))
                inflight.append((sel, fused(stack)))
                if len(inflight) > max_inflight:
                    drain(inflight.pop(0))
            for item in inflight:
                drain(item)
            continue
        for c0 in range(0, len(ids), csize):
            sel = ids[c0:c0 + csize]
            # pad the last chunk by repeating its first image: one compiled
            # batch shape per (image shape, chunk) instead of per remainder
            padded = sel + [sel[0]] * (csize - len(sel))
            stack = jnp.asarray(np.stack([np.asarray(images[i], np.float32)
                                          for i in padded]))
            if mesh is None:
                # two-stage with descriptor BUCKETING: keypoints come back
                # response-sorted, so the (much costlier) descriptor pass
                # runs on the next power-of-2 >= the actual detection count
                # instead of all max_features padded slots — measured 83%
                # of detect_all is descriptor work at 10k slots while
                # typical scenes yield 2-4k detections. Outputs are padded
                # back to max_features inside the jit (bit-identical valid
                # rows; one compiled describe executable per bucket size).
                # min_features rides INSIDE the jit (_adaptive_valid): the
                # detection threshold adapts per image in the same dispatch
                # (the r4 straggler path re-detected every under-threshold
                # image through a serialized per-image retry loop).
                detect_fn = _detect_only_fn(
                    cfg.max_features, cfg.num_scales, cfg.num_octaves,
                    cfg.sigma0, cfg.detect_threshold, cfg.edge_threshold,
                    cfg.feature_detector, min_features)
                det = detect_fn(stack)
                bases_b, xy_b, sc_b, resp_b, valid_b = det
                counts = np.asarray(valid_b.sum(axis=1))
                slots = 1 << max(8, int(np.ceil(np.log2(
                    max(int(counts.max()), 1)))))
                slots = min(slots, cfg.max_features)
                describe_fn = _describe_only_fn(
                    cfg.max_features, slots, cfg.sigma0, cfg.feature_detector)
                kp_b, d_b = describe_fn(
                    bases_b, xy_b[:, :slots], sc_b[:, :slots],
                    resp_b[:, :slots], valid_b[:, :slots])
            else:
                kp_b, d_b = detect_batched(stack)
                counts = np.asarray(kp_b.valid.sum(axis=1))
            for row, i in enumerate(sel):
                if counts[row] >= min_features:
                    emit(i, jax.tree.map(lambda x: x[row], kp_b), d_b[row])
                else:
                    # straggler: even the adaptive floor found too few —
                    # go another schedule deeper (floor**2 territory)
                    emit(i, *feat_mod.detect_and_describe_dynamic(
                        jnp.asarray(images[i], jnp.float32),
                        max_features=cfg.max_features,
                        num_scales=cfg.num_scales,
                        num_octaves=cfg.num_octaves, sigma0=cfg.sigma0,
                        contrast_threshold=cfg.detect_threshold * 0.25 ** 4,
                        edge_threshold=cfg.edge_threshold,
                        detector=cfg.feature_detector))
    if store is not None:
        return store.kps, store.descs
    return kps, descs


def _describe_buckets(max_features: int):
    """Power-of-2 descriptor bucket ladder, 256 floor, max_features cap."""
    buckets = []
    s = 256
    while s < max_features:
        buckets.append(s)
        s *= 2
    buckets.append(max_features)
    return tuple(buckets)


def _topk_buckets(max_features: int):
    """Power-of-2 per-octave top-k ladder, 1024 floor, max_features cap —
    ``lax.top_k`` cost scales with k (measured 19 -> 50 ms per 8 images
    from k=128 to k=10000 at 640x480) while typical scenes yield ~2k
    extrema; the bucket is picked from in-graph candidate counts, so the
    selection is bitwise the full-k one whenever the counts fit (see
    features.select_keypoints)."""
    buckets = []
    s = 1024
    while s < max_features:
        buckets.append(s)
        s *= 2
    buckets.append(max_features)
    return tuple(buckets)


def _select_ladder(scores_b, centers_b, max_features: int, num_scales: int,
                   sigma0: float, detector: str, contrast_threshold: float,
                   min_features: Optional[int]):
    """Batched keypoint selection with the per-octave top-k bucket ladder:
    counts candidates in-graph, switches over power-of-2 k. Returns
    (xy, scale, resp, valid) each [B, max_features]."""
    import jax

    buckets = _topk_buckets(max_features)
    cmax = jnp.max(jnp.stack([jnp.sum(sc > 0, axis=(1, 2, 3)).max()
                              for sc in scores_b]))
    bidx = jnp.minimum(jnp.sum(cmax > jnp.asarray(buckets)),
                       len(buckets) - 1)

    def mk(k):
        def g(_):
            xy, sc_, resp, valid = jax.vmap(
                lambda s, c: feat_mod.select_keypoints(
                    s, c, num_scales, sigma0, max_features, detector,
                    per_octave_k=k))(scores_b, centers_b)
            if min_features is not None:
                valid = jax.vmap(
                    lambda r, v: feat_mod._adaptive_valid(
                        r, v, contrast_threshold, min_features, 5))(resp, valid)
            return xy, sc_, resp, valid
        return g

    return jax.lax.switch(bidx, [mk(k) for k in buckets], 0)


@functools.lru_cache(maxsize=None)
def _detect_describe_fused_fn(max_features: int, num_scales: int,
                              num_octaves: int, sigma0: float,
                              contrast_threshold: float,
                              edge_threshold: float, detector: str,
                              min_features: Optional[int], batch: int):
    """ONE compiled dispatch for a whole detection chunk: vmapped pyramid +
    extrema + in-graph adaptive threshold, descriptor bucketing via
    ``lax.switch`` over the power-of-2 bucket ladder (the bucket index is
    computed from the detection counts IN-GRAPH — no host round-trip
    between the detect and describe halves), and per-image outputs
    unstacked inside the jit (the per-row host slicing of the two-stage
    path cost 48 tunnel dispatches = 165 ms per 8-image chunk).

    uint8 input is normalized to [0,1] ON DEVICE — images ship through the
    host->device tunnel at native byte width (measured 41 MB/s: a f32
    upload of 8 images was 238 ms, uint8 is 4x less).

    Bit-identical to the two-stage path: each switch branch IS
    describe_keypoints at that bucket, padded back to max_features."""
    import jax

    buckets = _describe_buckets(max_features)

    def f(stack):
        if stack.dtype != jnp.float32:
            stack = stack.astype(jnp.float32) / 255.0
        bases_b, scores_b, centers_b = jax.vmap(
            lambda im: feat_mod.detect_scores(
                im, num_scales, num_octaves, sigma0, contrast_threshold,
                edge_threshold, detector, min_features=min_features))(stack)
        xy_b, sc_b, resp_b, valid_b = _select_ladder(
            scores_b, centers_b, max_features, num_scales, sigma0, detector,
            contrast_threshold, min_features)
        counts = valid_b.sum(axis=1)
        cmax = counts.max()
        bidx = jnp.sum(cmax > jnp.asarray(buckets))  # buckets[-1] >= cmax

        def mk(slots):
            def g(_):
                return jax.vmap(
                    lambda bases, xy, sc, resp, valid:
                    feat_mod.describe_keypoints(
                        bases, xy[:slots], sc[:slots], resp[:slots],
                        valid[:slots], sigma0=sigma0, detector=detector,
                        pad_to=max_features)
                )(bases_b, xy_b, sc_b, resp_b, valid_b)
            return g

        kp_b, d_b = jax.lax.switch(jnp.minimum(bidx, len(buckets) - 1),
                                   [mk(s) for s in buckets], 0)
        outs = tuple((jax.tree.map(lambda x: x[i], kp_b), d_b[i])
                     for i in range(batch))
        return outs, counts
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _detect_only_fn(max_features: int, num_scales: int, num_octaves: int,
                    sigma0: float, contrast_threshold: float,
                    edge_threshold: float, detector: str = "sift",
                    min_features: Optional[int] = None):
    """Jitted vmapped detection half (pyramid + extrema + top-K + in-graph
    adaptive threshold), cached per config. Returns (bases, xy, scale,
    resp, valid) response-sorted."""
    import jax

    def f(stack):
        bases_b, scores_b, centers_b = jax.vmap(
            lambda im: feat_mod.detect_scores(
                im, num_scales, num_octaves, sigma0, contrast_threshold,
                edge_threshold, detector, min_features=min_features))(stack)
        xy_b, sc_b, resp_b, valid_b = _select_ladder(
            scores_b, centers_b, max_features, num_scales, sigma0, detector,
            contrast_threshold, min_features)
        return bases_b, xy_b, sc_b, resp_b, valid_b
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _describe_only_fn(max_features: int, slots: int, sigma0: float,
                      detector: str = "sift"):
    """Jitted vmapped description half for ``slots`` keypoint rows, padded
    back to max_features inside the jit. Cached per (config, bucket)."""
    import jax

    return jax.jit(jax.vmap(
        lambda bases, xy, sc, resp, valid: feat_mod.describe_keypoints(
            bases, xy, sc, resp, valid, sigma0=sigma0, detector=detector,
            pad_to=max_features)))


@functools.lru_cache(maxsize=None)
def _detect_batched_fn(max_features: int, num_scales: int, num_octaves: int,
                       sigma0: float, contrast_threshold: float,
                       edge_threshold: float, detector: str = "sift",
                       min_features: Optional[int] = None, mesh=None):
    """Jitted vmapped detector, cached per detector config so repeated
    detect_all calls reuse the compiled executable. With ``mesh`` the image
    batch is sharded over the devices via shard_map (per-image detection is
    embarrassingly parallel — the reference's per-image ThreadPool tasks,
    interest_point.cc:483-492)."""
    import jax

    vm = jax.vmap(
        lambda im: feat_mod.detect_and_describe(
            im, max_features=max_features, num_scales=num_scales,
            num_octaves=num_octaves, sigma0=sigma0,
            contrast_threshold=contrast_threshold,
            edge_threshold=edge_threshold, detector=detector,
            min_features=min_features))
    if mesh is not None:
        from jax.sharding import PartitionSpec as PS
        from jax import shard_map
        spec = PS(tuple(mesh.axis_names))
        vm = shard_map(vm, mesh=mesh, in_specs=spec, out_specs=spec)
    return jax.jit(vm)


def _match_one_fn(ratio: float, ransac_threshold: float, use_pallas: bool):
    def one(di, dj, xyi, xyj, vi, vj, key):
        pairs, keep = match_mod.match_descriptors(di, dj, ratio=ratio,
                                                  use_pallas=use_pallas)
        keep = keep & vi & vj[pairs[:, 1]]
        dst = xyj[pairs[:, 1]]
        res = ransac_mod.ransac_affine2d(xyi, dst, valid=keep,
                                         threshold=ransac_threshold, key=key)
        return res.inliers, pairs[:, 1]
    return one


@functools.lru_cache(maxsize=None)
def _match_batched_fn(ratio: float, ransac_threshold: float,
                      use_pallas: bool = False):
    """Jitted batched matcher (match + ratio + RANSAC), cached so repeated
    match_pairs_batched calls reuse the compiled executable.

    With ``use_pallas`` the fused Pallas distance+top-2 kernel runs per pair
    under ``lax.map`` (the kernel grids over query rows itself; mapping
    keeps it a single dispatch per chunk while the [K,K] distance matrix
    stays in VMEM — the production path on TPU)."""
    import jax

    one = _match_one_fn(ratio, ransac_threshold, use_pallas)
    if use_pallas:
        return jax.jit(lambda *args: _narrow_tgt(
            jax.lax.map(lambda a: one(*a), args)))
    return jax.jit(lambda *args: _narrow_tgt(jax.vmap(one)(*args)))


def _narrow_tgt(out):
    """Shrink the [chunk,K] match-target indices to int16 when K allows:
    the indices ride the slow host<->device tunnel every chunk and only
    ever address K < 32768 descriptor slots."""
    inl, tgt = out
    if tgt.shape[-1] < 32768:
        tgt = tgt.astype(jnp.int16)
    return inl, tgt


@functools.lru_cache(maxsize=None)
def _match_batched_sharded_fn(ratio: float, ransac_threshold: float,
                              use_pallas: bool, mesh):
    """Device-sharded batched matcher: the pair batch is split over the
    mesh with shard_map and each device runs the identical per-pair matcher
    on its shard — pairs are embarrassingly parallel, so no collectives are
    needed and the result is bit-for-bit the single-device one.

    This is the device-parallel equivalent of the reference's ThreadPool
    over per-pair match tasks (interest_point.cc:483-522; SURVEY.md 2.3
    'data-parallel sharding of keyframes/matches across chips')."""
    import jax
    from jax.sharding import PartitionSpec as PS
    from jax import shard_map

    one = _match_one_fn(ratio, ransac_threshold, use_pallas)
    if use_pallas:
        local = lambda *args: jax.lax.map(lambda a: one(*a), args)
    else:
        local = jax.vmap(one)
    spec = PS(tuple(mesh.axis_names))
    sharded = shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec)
    return jax.jit(lambda *args: _narrow_tgt(sharded(*args)))


def match_pairs_batched(kps, descs, pair_ids, cfg: FrontendConfig,
                        chunk: int = 32, use_pallas: bool = None,
                        mesh=None):
    """Descriptor match + ratio test + affine RANSAC for MANY pairs in one
    batched dispatch per chunk (static [K] padded shapes with validity masks
    end-to-end — no host round-trips between the stages).

    On TPU with large feature counts the Pallas fused matcher is the
    production path (use_pallas=None auto-selects; see knn2_auto).

    With ``mesh`` (jax.sharding.Mesh), each chunk is sharded over the mesh
    devices via shard_map — the multi-chip front-end of SURVEY.md 2.3
    (per-pair tasks distributed like the reference's ThreadPool,
    interest_point.cc:483-522) with bit-identical results.

    pair_ids: list of (i, j). Returns {(i, j): (xy_i [M,2], xy_j [M,2])}.
    """
    import jax

    if not pair_ids:
        return {}

    if use_pallas is None:
        k = descs[pair_ids[0][0]].shape[0]
        use_pallas = jax.default_backend() == "tpu" and k >= 1024
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        # each device gets at least one pair per dispatch
        chunk = max(chunk, n_dev)
        chunk += (-chunk) % n_dev
        one_v = _match_batched_sharded_fn(cfg.ratio, cfg.ransac_threshold,
                                          use_pallas, mesh)
    else:
        one_v = _match_batched_fn(cfg.ratio, cfg.ransac_threshold, use_pallas)
    out = {}
    xy_host = {}
    chunk = min(chunk, len(pair_ids)) if mesh is None else chunk
    for c0 in range(0, len(pair_ids), chunk):
        sel = pair_ids[c0:c0 + chunk]
        # pad the last chunk by repeating its first pair: one compiled batch
        # shape per (K, chunk) instead of one per remainder size
        pad = chunk - len(sel)
        padded = sel + [sel[0]] * pad
        di = jnp.stack([descs[i] for i, _ in padded])
        dj = jnp.stack([descs[j] for _, j in padded])
        xyi = jnp.stack([kps[i].xy for i, _ in padded])
        xyj = jnp.stack([kps[j].xy for _, j in padded])
        vi = jnp.stack([kps[i].valid for i, _ in padded])
        vj = jnp.stack([kps[j].valid for _, j in padded])
        keys = jax.vmap(jax.random.PRNGKey)(
            jnp.asarray([i * 1000 + j for i, j in padded], jnp.uint32))
        inl_b, tgt_b = one_v(di, dj, xyi, xyj, vi, vj, keys)
        # one device->host transfer per chunk, then pure-host extraction.
        # Keypoint coordinates come down once per unique IMAGE (the stacked
        # per-pair copies are 2*chunk duplicates of the same [K,2] arrays —
        # through this environment's ~41 MB/s host<->device tunnel the
        # duplicate transfers dominated the whole matching stage).
        inl_b = np.asarray(inl_b)
        tgt_b = np.asarray(tgt_b)
        for i in {im for p in sel for im in p}:
            if i not in xy_host:
                xy_host[i] = np.asarray(kps[i].xy)
        for row, (i, j) in enumerate(sel):
            m = inl_b[row]
            out[(i, j)] = (xy_host[i][m], xy_host[j][tgt_b[row][m]])
    return out


def match_pair(kp_i, d_i, kp_j, d_j, cfg: FrontendConfig, seed: int = 0):
    """Descriptor match + ratio test + affine RANSAC for one image pair.
    Returns (xy_i [K,2], xy_j [K,2]) inlier correspondences."""
    import jax
    pairs, keep = match_mod.match_descriptors(d_i, d_j, ratio=cfg.ratio)
    keep = np.asarray(keep & kp_i.valid & kp_j.valid[pairs[:, 1]])
    if keep.sum() < 3:
        return np.zeros((0, 2)), np.zeros((0, 2))
    p1 = np.asarray(kp_i.xy)[keep]
    p2 = np.asarray(kp_j.xy)[np.asarray(pairs[:, 1])[keep]]
    res = ransac_mod.ransac_affine2d(jnp.asarray(p1), jnp.asarray(p2),
                                     threshold=cfg.ransac_threshold,
                                     key=jax.random.PRNGKey(seed))
    inl = np.asarray(res.inliers)
    return p1[inl], p2[inl]


@functools.lru_cache(maxsize=None)
def _cam_filter_jit(max_reproj_px: float):
    """Jitted core of the camera-guided match filter: ONE dispatch per
    pair (the eager version issued ~10 device ops per pair through the
    dispatch tunnel, dominating the calibrate front-end). CameraParams is
    a registered pytree with static model fields, so one executable per
    (model_i, model_j, bucket) serves all pairs."""
    import jax
    from multiview_tpu.geometry.camera import DISTORTED, UNDISTORTED_C

    def f(xy_i, xy_j, valid, cam_i, cam_j, w2c_i, w2c_j):
        ui = cam_i.convert(xy_i, DISTORTED, UNDISTORTED_C)
        uj = cam_j.convert(xy_j, DISTORTED, UNDISTORTED_C)
        focal2 = jnp.stack([cam_i.mean_focal, cam_j.mean_focal])
        Pi = tri_mod.projection_matrix(focal2, jnp.stack([w2c_i, w2c_j]))
        pix = jnp.stack([ui, uj], axis=1)                   # [K,2,2]
        X, _, ok = jax.vmap(
            lambda p: tri_mod.triangulate_track(Pi, p, jnp.ones(2, bool)))(pix)
        for (cam, w2c, meas) in ((cam_i, w2c_i, xy_i), (cam_j, w2c_j, xy_j)):
            Xc = pose_mod.pose_apply(w2c, X)                # [K,3]
            pred = cam.project_cam_to_dist_pix(Xc)
            ok = ok & (jnp.linalg.norm(pred - meas, axis=-1)
                       <= max_reproj_px)
        return ok & valid
    return jax.jit(f)


def cam_guided_filter(xy_i, xy_j, cam_i, cam_j, w2c_i, w2c_j,
                      max_reproj_px: float):
    """Reject matches whose two-view triangulation reprojects badly
    (matchFeaturesWithCams, interest_point.cc:181-301). Fully batched:
    all K matches of a pair triangulate in one jitted dispatch, padded to
    a power-of-2 bucket so one executable serves all match counts."""
    from multiview_tpu.utils.padding import pad_rows_pow2
    if len(xy_i) == 0:
        return xy_i, xy_j
    K = len(xy_i)
    xi = pad_rows_pow2(np.asarray(xy_i, np.float64))
    xj = pad_rows_pow2(np.asarray(xy_j, np.float64))
    valid = pad_rows_pow2(np.ones(K, bool), fill=False)
    fn = _cam_filter_jit(float(max_reproj_px))
    ok = fn(jnp.asarray(xi), jnp.asarray(xj), jnp.asarray(valid),
            cam_i, cam_j, jnp.asarray(w2c_i), jnp.asarray(w2c_j))
    keep = np.asarray(ok)[:K]
    return xy_i[keep], xy_j[keep]


def detect_match_features(images: Sequence[np.ndarray], cfg: FrontendConfig = FrontendConfig(),
                          cam_params: Optional[Sequence] = None,
                          world_to_cam: Optional[np.ndarray] = None,
                          cams_of_image: Optional[Sequence[int]] = None,
                          mesh=None) -> tracks_mod.TrackSet:
    """Full front-end: images -> TrackSet. With cam_params/world_to_cam
    given, applies the camera-guided reprojection filter per pair.
    With ``mesh``, detection batches and match-pair chunks shard over the
    device mesh (SURVEY.md 2.3 front-end row)."""
    import jax

    store = None
    if cfg.match_out_of_core:
        workdir = cfg.matching_working_directory
        if not workdir:
            import tempfile
            workdir = tempfile.mkdtemp(prefix="mv_features_")
            print(f"match_out_of_core: no matching_working_directory set, "
                  f"spilling features to {workdir}")
        store = FeatureStore(workdir, cfg.matching_max_num_images_in_cache)
    kps, descs = detect_all(images, cfg, store=store, mesh=mesh)
    n = len(images)
    if cfg.retrieval_neighbors > 0:
        from multiview_tpu.sfm import retrieval
        pair_ids = retrieval.select_pairs(
            descs, [k.valid for k in kps], cfg.retrieval_neighbors,
            num_clusters=cfg.retrieval_clusters)
    else:
        pair_ids = [(i, j) for i in range(n)
                    for j in range(i + 1, min(i + 1 + cfg.num_overlaps, n))]
    # accelerators: one dispatch per pair-chunk wins; on CPU the padded-size
    # RANSAC arithmetic is real work, so the dynamic per-pair path is faster
    # (unless a mesh is given — sharded matching needs the batched path)
    if mesh is not None or jax.default_backend() != "cpu":
        raw = match_pairs_batched(kps, descs, pair_ids, cfg, mesh=mesh)
    else:
        raw = {}
        for i, j in pair_ids:
            raw[(i, j)] = match_pair(kps[i], descs[i], kps[j], descs[j], cfg,
                                     seed=i * 1000 + j)
    pair_matches: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}
    for (i, j), (xi, xj) in raw.items():
        if cfg.cam_filter_reproj_px is not None and cam_params is not None:
            ci = cam_params[cams_of_image[i]]
            cj = cam_params[cams_of_image[j]]
            xi, xj = cam_guided_filter(xi, xj, ci, cj, world_to_cam[i],
                                       world_to_cam[j],
                                       cfg.cam_filter_reproj_px)
        if len(xi) >= cfg.min_pair_matches:
            pair_matches[(i, j)] = (xi, xj)
    return tracks_mod.build_tracks(pair_matches, n)
