"""Network zoo: feature towers, 3D regularizer, ConvGRU, refinement nets,
and the five end-to-end MVS graphs."""

from mvsnet_tpu.models.feature_net import UNetDS2GN, UniNetDS2, UniNetDS2GN  # noqa: F401
from mvsnet_tpu.models.regnet import RegNetUS0  # noqa: F401
from mvsnet_tpu.models.gru import ConvGRUCell, GRURegularizer  # noqa: F401
from mvsnet_tpu.models.refine import (  # noqa: F401
    RefineNet,
    RefineNetConv,
    RefineUNet,
    RefineUNetConv,
)
from mvsnet_tpu.models.mvsnet import MVSNet  # noqa: F401
