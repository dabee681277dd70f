"""Checkpoint/resume of the BA state.

The reference's only resumability is file-based between stages (its outputs
are exactly its inputs, rig_calibrator.cc:297-301) with no intra-solve
checkpointing (SURVEY.md 5). Here the full optimization state — RigState,
inlier masks, pass index — checkpoints each pass via orbax, so a killed
calibration resumes mid-run; the optimizer's monotone outlier masks make
resumed runs bit-continue correctly.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from multiview_tpu.calib import problem as prob


def _state_to_tree(state: prob.RigState):
    # orbax refuses zero-size arrays (pinhole sensors have empty distortion
    # vectors) — pad those with one sentinel element and record the flag
    dist = {}
    for i, d in enumerate(state.dist):
        dist[str(i)] = d if d.size else jnp.zeros(1, state.dtype)
    return {
        "world_to_ref": state.world_to_ref,
        "ref_to_cam": state.ref_to_cam,
        "timestamp_offsets": state.timestamp_offsets,
        "focal": state.focal,
        "optical_center": state.optical_center,
        "dist": dist,
        "depth_to_image": state.depth_to_image,
        "depth_scale": state.depth_scale,
        "points": state.points,
    }


def _tree_to_state(tree, template: prob.RigState) -> prob.RigState:
    # un-pad the zero-size-distortion sentinel using the template's true sizes
    dist = tuple(jnp.asarray(tree["dist"][str(i)])[:template.dist[i].size]
                 for i in range(len(tree["dist"])))
    return prob.RigState(
        world_to_ref=jnp.asarray(tree["world_to_ref"]),
        ref_to_cam=jnp.asarray(tree["ref_to_cam"]),
        timestamp_offsets=jnp.asarray(tree["timestamp_offsets"]),
        focal=jnp.asarray(tree["focal"]),
        optical_center=jnp.asarray(tree["optical_center"]),
        dist=dist,
        depth_to_image=jnp.asarray(tree["depth_to_image"]),
        depth_scale=jnp.asarray(tree["depth_scale"]),
        points=jnp.asarray(tree["points"]))


def save_checkpoint(ckpt_dir, state: prob.RigState,
                    observations: prob.Observations, pass_index: int):
    """Write pass checkpoint: orbax pytree for the state, npz for the masks."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    path = ckpt_dir / f"state_{pass_index}"
    if path.exists():
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, _state_to_tree(state))
    ckptr.wait_until_finished()

    masks = {f"pix_{o.sensor}": np.asarray(o.mask) for o in observations.pixels}
    masks.update({f"depth_{o.sensor}": np.asarray(o.mask)
                  for o in observations.depths})
    np.savez(ckpt_dir / f"masks_{pass_index}.npz", **masks)
    (ckpt_dir / "latest.json").write_text(json.dumps({"pass": pass_index}))


def latest_pass(ckpt_dir) -> Optional[int]:
    f = Path(ckpt_dir) / "latest.json"
    if not f.exists():
        return None
    return int(json.loads(f.read_text())["pass"])


def load_checkpoint(ckpt_dir, template_state: prob.RigState,
                    observations: prob.Observations,
                    pass_index: Optional[int] = None
                    ) -> Tuple[prob.RigState, prob.Observations, int]:
    """Restore (state, observations-with-masks, pass_index)."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    if pass_index is None:
        pass_index = latest_pass(ckpt_dir)
        if pass_index is None:
            raise FileNotFoundError(f"No checkpoint in {ckpt_dir}")
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(ckpt_dir / f"state_{pass_index}",
                         _state_to_tree(template_state))
    state = _tree_to_state(tree, template_state)

    masks = np.load(ckpt_dir / f"masks_{pass_index}.npz")
    new_pix = tuple(
        dataclasses.replace(o, mask=jnp.asarray(masks[f"pix_{o.sensor}"]))
        for o in observations.pixels)
    new_depth = tuple(
        dataclasses.replace(o, mask=jnp.asarray(masks[f"depth_{o.sensor}"]))
        for o in observations.depths)
    obs = dataclasses.replace(observations, pixels=new_pix, depths=new_depth)
    return state, obs, pass_index
