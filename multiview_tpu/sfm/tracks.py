"""Track building: merge pairwise matches into multi-view tracks.

Host-side union-find, the role of openMVG's TracksBuilder
(`/root/reference/openMVG/tracks/tracks.hpp:59-230`) as used by
``detectMatchFeatures`` (`src/interest_point.cc:527-647`): keypoints are
deduplicated per image by exact (x,y), pairwise matches union (image,feature)
nodes, tracks observing the same image twice are dropped (conflict filter),
and short tracks are culled. This is irregular pointer-chasing work —
deliberately numpy/host, feeding padded tensors to the device side.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np


class UnionFind:
    """Path-compressing union-find over dense int nodes."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        root = x
        p = self.parent
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


@dataclasses.dataclass
class TrackSet:
    """Tracks over deduplicated keypoints.

    keypoints[cid] : [n_cid, 2] float pixel positions
    tracks         : list of dict cid->fid
    """

    keypoints: List[np.ndarray]
    tracks: List[Dict[int, int]]


def dedup_keypoints(pair_matches: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]],
                    num_images: int):
    """Assign a feature id per unique (x,y) in each image
    (interest_point.cc:527-556). Returns (keypoints per image, match index
    pairs per image pair)."""
    kp_maps: List[Dict[Tuple[float, float], int]] = [dict() for _ in range(num_images)]

    def fid_of(cid, xy):
        key = (float(xy[0]), float(xy[1]))
        m = kp_maps[cid]
        if key not in m:
            m[key] = len(m)
        return m[key]

    indexed: Dict[Tuple[int, int], np.ndarray] = {}
    for (ci, cj), (left, right) in pair_matches.items():
        rows = np.empty((len(left), 2), np.int64)
        for k in range(len(left)):
            rows[k, 0] = fid_of(ci, left[k])
            rows[k, 1] = fid_of(cj, right[k])
        indexed[(ci, cj)] = rows

    keypoints = []
    for cid in range(num_images):
        arr = np.zeros((len(kp_maps[cid]), 2))
        for (x, y), fid in kp_maps[cid].items():
            arr[fid] = (x, y)
        keypoints.append(arr)
    return keypoints, indexed


def build_tracks(pair_matches: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]],
                 num_images: int, min_track_len: int = 2) -> TrackSet:
    """Union-find merge + conflict filter (TracksBuilder::Build/Filter).

    pair_matches: {(cid_i, cid_j): (left_xy [K,2], right_xy [K,2])}.
    """
    keypoints, indexed = dedup_keypoints(pair_matches, num_images)

    offsets = np.zeros(num_images + 1, np.int64)
    for cid in range(num_images):
        offsets[cid + 1] = offsets[cid] + len(keypoints[cid])
    uf = UnionFind(int(offsets[-1]))

    for (ci, cj), rows in indexed.items():
        for fi, fj in rows:
            uf.union(offsets[ci] + fi, offsets[cj] + fj)

    # gather members per root
    groups: Dict[int, List[Tuple[int, int]]] = {}
    for cid in range(num_images):
        for fid in range(len(keypoints[cid])):
            root = uf.find(int(offsets[cid] + fid))
            groups.setdefault(root, []).append((cid, fid))

    tracks = []
    for members in groups.values():
        if len(members) < min_track_len:
            continue
        cids = [c for c, _ in members]
        if len(set(cids)) != len(cids):
            continue  # conflict: same image twice (TracksBuilder::Filter)
        tracks.append({c: f for c, f in sorted(members)})
    return TrackSet(keypoints, tracks)


def tracks_to_arrays(ts: TrackSet):
    """Flatten tracks into the observation-row arrays the BA layer wants:
    (cam_idx [N], fid [N], pix [N,2], point_idx [N])."""
    cam_idx, fid_arr, pix, pid_arr = [], [], [], []
    for pid, track in enumerate(ts.tracks):
        for cid, fid in track.items():
            cam_idx.append(cid)
            fid_arr.append(fid)
            pix.append(ts.keypoints[cid][fid])
            pid_arr.append(pid)
    return (np.asarray(cam_idx, np.int32), np.asarray(fid_arr, np.int32),
            np.asarray(pix, float), np.asarray(pid_arr, np.int32))
