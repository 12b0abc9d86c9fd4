"""BEVDet-occ batch scaling with the stereo cost volume STUBBED to zeros:
isolates the non-cost-volume part of the frame (backbone, LSS, bev_pool,
BEV encoder, head) at batch 1 vs 4 (round-5 item 7 dissection).
Run: python scripts_dev/probe_occ_rest.py
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp

import presight_tpu.occupancy.view_transformer as vt

_orig = vt.stereo_cost_volume


def _stub(prev_feat, curr_feat, grid, depth_bins, bias=5.0, group_size=4):
    BN, Hs, Ws, _ = curr_feat.shape
    # Depends on inputs so nothing upstream is DCE'd, but no gathers.
    base = jnp.mean(curr_feat, axis=-1, keepdims=True) + jnp.mean(prev_feat) \
        + jnp.mean(grid) * 0.0
    vol = jnp.broadcast_to(base, (BN, Hs, Ws, depth_bins))
    return jax.nn.softmax(vol, axis=-1)


vt.stereo_cost_volume = _stub
# bevdet_occ imported vt.stereo_cost_volume by name? ensure module-level
# lookup goes through the patched symbol.
import presight_tpu.occupancy.bevdet_occ as bo
if hasattr(bo, "stereo_cost_volume"):
    bo.stereo_cost_volume = _stub

sys.path.insert(0, "/root/repo/scripts_dev")
from bench_stage3 import bench_occ

bench_occ(variants=("fp32", "batch4"))
