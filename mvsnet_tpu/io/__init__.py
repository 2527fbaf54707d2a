"""File-format IO: PFM, cam.txt, camera.json, Gipuma .dmb, PLY, depth PNGs."""

from mvsnet_tpu.io.pfm import load_pfm, write_pfm  # noqa: F401
from mvsnet_tpu.io.cams import (  # noqa: F401
    load_cam_txt,
    write_cam_txt,
    cam_from_camera_json,
    load_camera_json,
)
from mvsnet_tpu.io.dmb import read_dmb, write_dmb  # noqa: F401
from mvsnet_tpu.io.ply import write_ply  # noqa: F401
from mvsnet_tpu.io.images import (  # noqa: F401
    load_image,
    load_depth_png,
    write_depth_png,
    write_confidence_png,
    write_image,
)
