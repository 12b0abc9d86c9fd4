"""Stage-3 occupancy stack (BEVDet-Occ consuming chain), TPU-native.

Reference: the BEVDet fork under /root/reference/occupancy — the prior
pickles built by stage 2 flow through NuscPrior / VoxelizePriorPoints
(prior/consume.py) into PriorFusion3D_voxel inside the detector's
bev_encoder (mmdet3d/models/detectors/bevdet.py:62-78), trained with the
occupancy CE loss (bevdet_occ.py:55-72) and evaluated with Occ3D mIoU
(utils/occ_metrics.py).
"""

from .bev_pool import bev_pool_v2
from .bevdet_occ import BEVDetOcc, occ_loss
from .inference import mapped_apply, sharded_apply
from .view_transformer import LSSViewTransformer

__all__ = ["bev_pool_v2", "BEVDetOcc", "occ_loss", "LSSViewTransformer",
           "mapped_apply", "sharded_apply"]
