"""CLI dispatcher: ``python -m multiview_tpu <tool> ...``.

Tools mirror the reference's executables/wrappers (SURVEY.md L5/L6):

  calibrate   rig_calibrator   (multi-pass rig BA)
  sfm-init    theia_sfm        (feature matching + global SfM -> NVM)
  fuse-mesh   multi_stereo     (plane-sweep stereo + TSDF -> fused_mesh.ply)
  texture     texrecon         (view selection + atlas -> textured OBJ)
  fit-rpc     fit_rpc          (RPC distortion fitting)
  undistort   undistort_image_texrecon
"""

from __future__ import annotations

import argparse
import sys


def expand_flagfiles(argv, depth: int = 0):
    """gflags-style flagfile expansion (the reference pins its recipes in
    flagfiles, e.g. theia_flags.txt): each non-empty, non-comment line of
    the file is inserted as one argument, recursively. Accepts both
    ``--flagfile=<path>`` and ``--flagfile <path>``."""
    if depth > 16:
        raise ValueError("--flagfile nesting too deep (cycle?)")
    out = []
    it = iter(argv)
    for a in it:
        path = None
        if a.startswith("--flagfile="):
            path = a.split("=", 1)[1]
        elif a == "--flagfile":
            path = next(it, None)
            if path is None:
                raise ValueError("--flagfile requires a path")
        if path is None:
            out.append(a)
            continue
        lines = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    lines.append(line)
        out.extend(expand_flagfiles(lines, depth + 1))
    return out


def main(argv=None):
    from multiview_tpu.tools import (calibrate, sfm_init, fuse_mesh,
                                     texture_mesh, fit_rpc_tool, undistort_tool)

    tools = {
        "calibrate": calibrate,
        "sfm-init": sfm_init,
        "fuse-mesh": fuse_mesh,
        "texture": texture_mesh,
        "fit-rpc": fit_rpc_tool,
        "undistort": undistort_tool,
    }
    parser = argparse.ArgumentParser(
        prog="multiview_tpu",
        description="TPU-native rig calibration and 3D reconstruction")
    sub = parser.add_subparsers(dest="tool", required=True)
    for name, mod in tools.items():
        p = sub.add_parser(name, help=(mod.__doc__ or "").strip().splitlines()[0])
        mod.add_args(p)
    if argv is None:
        argv = sys.argv[1:]
    args = parser.parse_args(expand_flagfiles(list(argv)))
    return tools[args.tool].run(args)


if __name__ == "__main__":
    sys.exit(main())
