"""``undistort`` tool — the undistort_image_texrecon equivalent
(`/root/reference/rig_calibrator/bin/undistort_image_texrecon.cc`):
undistort a list of images through a sensor's model, write the undistorted
intrinsics file.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--rig_config", required=True)
    p.add_argument("--sensor", required=True)
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--crop_width", type=int, default=0)
    p.add_argument("--crop_height", type=int, default=0)


def run(args):
    import imageio.v3 as iio
    from multiview_tpu.io import rig_config as rc
    from multiview_tpu.utils import undistort as und
    from multiview_tpu.tools import common

    rig = rc.read_rig_config(args.rig_config)
    s = rig.sensors[rig.sensor_index(args.sensor)]
    cam = common.cam_params_from_sensor(s)
    crop = (args.crop_width, args.crop_height) \
        if args.crop_width and args.crop_height else None

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    K = None
    for img_path in args.images:
        img = common.load_gray(img_path)
        u, K = und.undistort_image(img, cam, crop_window=crop)
        dst = out / Path(img_path).name
        iio.imwrite(dst, (np.clip(u, 0, 1) * 255).astype(np.uint8))
        print(f"Writing: {dst}")

    with open(out / "undistorted_intrinsics.txt", "w") as f:
        f.write("# undistorted camera intrinsics: width height focal cx cy\n")
        w = crop[0] if crop else cam.undistorted_size[0]
        h = crop[1] if crop else cam.undistorted_size[1]
        f.write(f"{w} {h} {K[0,0]!r} {K[0,2]!r} {K[1,2]!r}\n")
    print(f"Writing: {out/'undistorted_intrinsics.txt'}")
    return 0
