"""Stage-3 online-mapping stack (StreamMapNet consuming chain), TPU-native.

Reference: the StreamMapNet fork under /root/reference/online-mapping —
priors flow through the shared consume path (prior/consume.py) into
PriorFusion2D on the BEV features (plugin/models/mapers/StreamMapNet.py:
192-197), with the ConvGRU streaming BEV memory (necks/gru.py), the
DETR-style MapDetectorHead, the RasterMapper baseline, and the
chamfer-distance AP evaluator (datasets/evaluation/vector_eval.py).
"""

from .bev_encoder import BEVEncoder
from .conv_gru import ConvGRU, warp_bev
from .inference import sharded_streams_apply
from .map_head import MapDetectorHead, map_losses
from .stream_mapnet import RasterMapper, StreamMapNet, raster_loss
from .vector_eval import (VectorEvaluate, average_precision, chamfer_distance,
                          instance_match, interp_fixed_num, raster_evaluate)

__all__ = [
    "BEVEncoder", "ConvGRU", "warp_bev", "MapDetectorHead", "map_losses",
    "StreamMapNet", "RasterMapper", "raster_loss", "VectorEvaluate",
    "average_precision", "chamfer_distance", "instance_match",
    "interp_fixed_num", "raster_evaluate", "sharded_streams_apply",
]
