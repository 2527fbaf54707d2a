"""Data plane: mvs-training session datasets (covisibility clusters)."""

from mvsnet_tpu.data.cluster import Cluster  # noqa: F401
from mvsnet_tpu.data.generator import ClusterGenerator  # noqa: F401
from mvsnet_tpu.data.loader import PrefetchingLoader, batch_iterator  # noqa: F401
