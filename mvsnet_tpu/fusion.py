"""Depth-map fusion to point clouds — TPU/JAX native.

Replaces the reference pipeline's external CUDA `fusibile` executable
(reference: depthfusion.py:194-214, README.md:54-74) with an in-framework
reprojection-consistency fusion:

  1. probability filter: depth := 0 where prob < threshold
     (reference: depthfusion.py:172-191)
  2. for every reference view, backproject its depth map to world points,
     reproject into every other view, and accept pixels observed
     consistently by >= num_consistent other views (reprojection error
     < disp_threshold pixels and relative depth agreement); accepted
     positions are averaged over the agreeing views.
  3. write points + colors to points_mvsnet/consistencyCheck/final3d_model.ply
     (same artifact path shape as fusibile's output,
     reference: scripts/utils.py:31-39).

The Gipuma-format export (P matrices, .dmb depths, fake normals —
reference: depthfusion.py:76-169) is preserved for anyone who still wants
to run the external tool.

The consistency check is one jitted einsum/gather pipeline per view pair —
on TPU the projections are batched matmuls on the MXU; scene-block
sharding over hosts is a straight data split over reference views.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvsnet_tpu.io.cams import load_cam_txt, projection_matrix
from mvsnet_tpu.io.dmb import write_dmb
from mvsnet_tpu.io.images import load_image
from mvsnet_tpu.io.pfm import load_pfm, write_pfm
from mvsnet_tpu.io.ply import write_ply
from mvsnet_tpu.utils.logging import setup_logger
from mvsnet_tpu.utils.paths import mkdir_p

logger = setup_logger("mvsnet_tpu.fusion")


# ---------------------------------------------------------------------------
# probability filter
# ---------------------------------------------------------------------------

def probability_filter(dense_folder: str, prob_threshold: float) -> List[str]:
    """Zero low-confidence depths; writes *_prob_filtered.pfm
    (reference: depthfusion.py:172-191)."""
    depth_folder = os.path.join(dense_folder, "depths_mvsnet")
    names = _image_names(depth_folder)
    for name in names:
        prefix = os.path.splitext(name)[0]
        depth = load_pfm(os.path.join(depth_folder, prefix + "_init.pfm"))
        prob = load_pfm(os.path.join(depth_folder, prefix + "_prob.pfm"))
        depth = np.where(prob < prob_threshold, 0.0, depth).astype(np.float32)
        write_pfm(os.path.join(depth_folder, prefix + "_prob_filtered.pfm"), depth)
    return names


def _image_names(depth_folder: str) -> List[str]:
    return sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(depth_folder, "*.jpg")))


# ---------------------------------------------------------------------------
# native consistency fusion
# ---------------------------------------------------------------------------

@jax.jit
def _backproject(depth, K_inv, R_T, t):
    """Depth map (H, W) -> world points (H, W, 3).

    x_cam = K^-1 (u+0.5, v+0.5, 1) * d ; X = R^T (x_cam - t).
    """
    H, W = depth.shape
    u = jnp.arange(W, dtype=jnp.float32) + 0.5
    v = jnp.arange(H, dtype=jnp.float32) + 0.5
    uu, vv = jnp.meshgrid(u, v)
    pix = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)      # (H, W, 3)
    x_cam = (pix @ K_inv.T) * depth[..., None]
    return (x_cam - t) @ R_T.T


@jax.jit
def _project(points, K, R, t):
    """World points (..., 3) -> (pixel u, pixel v, cam-space depth)."""
    x_cam = points @ R.T + t
    z = x_cam[..., 2]
    uv = x_cam @ K.T
    u = uv[..., 0] / jnp.where(z == 0, 1e-6, z) - 0.5
    v = uv[..., 1] / jnp.where(z == 0, 1e-6, z) - 0.5
    return u, v, z


@jax.jit
def _pair_consistency(ref_points, ref_depth, ref_valid, ref_K, ref_R, ref_t,
                      src_depth, src_K, src_R, src_t, src_K_inv,
                      disp_threshold, depth_rel_threshold):
    """Two-way reprojection consistency of one ref view vs one source view.

    Standard dynamic-consistency check (MVSNet-paper fusion): project each
    ref-view world point into the source, sample the source depth at the hit
    pixel, backproject that source observation to world, reproject it into
    the *reference* camera, and accept when it lands within disp_threshold
    pixels of the original pixel with relative depth agreement.

    Returns (ok mask (H,W), source-observation world points (H,W,3)).
    """
    Hr, Wr = ref_depth.shape
    Hs, Ws = src_depth.shape
    u, v, z = _project(ref_points, src_K, src_R, src_t)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < Ws) & (vi >= 0) & (vi < Hs) & (z > 0)
    ui = jnp.clip(ui, 0, Ws - 1)
    vi = jnp.clip(vi, 0, Hs - 1)
    d_src = src_depth[vi, ui]                                   # (H, W)

    # world point of the matched source observation
    src_points = _backproject(src_depth, src_K_inv, src_R.T, src_t)
    hit = src_points[vi, ui]                                    # (H, W, 3)

    # reproject the source observation back into the reference camera
    u2, v2, z2 = _project(hit, ref_K, ref_R, ref_t)
    uu = jax.lax.broadcasted_iota(jnp.float32, (Hr, Wr), 1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (Hr, Wr), 0)
    pix_ok = (jnp.abs(u2 - uu) <= disp_threshold) & (jnp.abs(v2 - vv) <= disp_threshold)
    rel_ok = jnp.abs(z2 - ref_depth) <= depth_rel_threshold * jnp.abs(ref_depth)
    ok = ref_valid & inb & (d_src > 0) & rel_ok & pix_ok
    return ok, hit


def fuse_session(dense_folder: str, prob_threshold: float = 0.8,
                 disp_threshold: float = 0.25, num_consistent: int = 3,
                 depth_rel_threshold: float = 0.01,
                 output_path: Optional[str] = None,
                 voxel_size: float = 0.0,
                 min_neighbors: int = 0,
                 shard_index: int = 0,
                 shard_count: int = 1) -> str:
    """Probability-filter + consistency-fuse one session; returns PLY path.

    shard_index/shard_count: scene-block parallelism across hosts (SURVEY
    §7.8) — each process fuses a disjoint subset of REFERENCE views against
    all source views and writes final3d_model.shard<k>.ply; merge with
    merge_shards()."""
    depth_folder = os.path.join(dense_folder, "depths_mvsnet")
    names = probability_filter(dense_folder, prob_threshold)
    if not names:
        raise FileNotFoundError(f"no predictions under {depth_folder}")

    views = []
    for name in names:
        prefix = os.path.splitext(name)[0]
        depth = load_pfm(os.path.join(depth_folder, prefix + "_prob_filtered.pfm"))
        cam = load_cam_txt(os.path.join(depth_folder, prefix + ".txt"))
        image = load_image(os.path.join(depth_folder, name))
        if image.shape[:2] != depth.shape[:2]:
            import cv2
            image = cv2.resize(image, (depth.shape[1], depth.shape[0]),
                               interpolation=cv2.INTER_LINEAR)
        views.append({
            "depth": jnp.asarray(depth),
            "K": jnp.asarray(cam[1, :3, :3], jnp.float32),
            "K_inv": jnp.asarray(np.linalg.inv(cam[1, :3, :3]), jnp.float32),
            "R": jnp.asarray(cam[0, :3, :3], jnp.float32),
            "t": jnp.asarray(cam[0, :3, 3], jnp.float32),
            "image": image,
        })

    all_points, all_colors = [], []
    for i, ref in enumerate(views):
        if shard_count > 1 and i % shard_count != shard_index:
            continue
        ref_points = _backproject(ref["depth"], ref["K_inv"], ref["R"].T, ref["t"])
        ref_valid = ref["depth"] > 0
        count = jnp.zeros(ref["depth"].shape, jnp.int32)
        accum = ref_points.astype(jnp.float32)
        for j, src in enumerate(views):
            if i == j:
                continue
            ok, hit = _pair_consistency(
                ref_points, ref["depth"], ref_valid, ref["K"], ref["R"],
                ref["t"], src["depth"], src["K"], src["R"], src["t"],
                src["K_inv"], disp_threshold, depth_rel_threshold)
            count = count + ok.astype(jnp.int32)
            accum = accum + jnp.where(ok[..., None], hit, 0.0)

        keep = np.asarray(ref_valid & (count >= num_consistent))
        if not keep.any():
            continue
        avg = np.asarray(accum) / (np.asarray(count)[..., None] + 1.0)
        all_points.append(avg[keep])
        all_colors.append(ref["image"][keep])
        logger.info("view %d/%d: %d fused points", i + 1, len(views),
                    int(keep.sum()))

    if output_path is None:
        out_dir = os.path.join(dense_folder, "points_mvsnet", "consistencyCheck")
        mkdir_p(out_dir)
        name = ("final3d_model.ply" if shard_count == 1
                else f"final3d_model.shard{shard_index}.ply")
        output_path = os.path.join(out_dir, name)
    if all_points:
        points = np.concatenate(all_points, axis=0)
        colors = np.concatenate(all_colors, axis=0)
    else:
        points = np.zeros((0, 3), np.float32)
        colors = np.zeros((0, 3), np.uint8)

    # native consolidation (the stage fusibile ran on GPU): density-based
    # outlier rejection, then voxel-grid dedup/merge.
    if len(points) and min_neighbors > 0 and voxel_size > 0:
        from mvsnet_tpu import native  # noqa: PLC0415
        keep = native.radius_outlier_removal(points, voxel_size * 3.0, min_neighbors)
        logger.info("outlier removal kept %d/%d points", int(keep.sum()), len(points))
        points, colors = points[keep], colors[keep]
    if len(points) and voxel_size > 0:
        from mvsnet_tpu import native  # noqa: PLC0415
        points, colors = native.voxel_downsample(points, colors, voxel_size)
        logger.info("voxel downsample -> %d points (voxel %.3f)", len(points), voxel_size)

    write_ply(output_path, points, colors=colors)
    logger.info("Wrote %d points to %s", len(points), output_path)
    return output_path


def merge_shards(dense_folder: str, output_path: Optional[str] = None) -> str:
    """Concatenate shard PLYs (from multi-host fusion) into the final cloud."""
    from mvsnet_tpu.io.ply import read_ply  # noqa: PLC0415
    out_dir = os.path.join(dense_folder, "points_mvsnet", "consistencyCheck")
    shard_paths = sorted(glob.glob(os.path.join(out_dir, "final3d_model.shard*.ply")))
    if not shard_paths:
        raise FileNotFoundError(f"no shard PLYs under {out_dir}")
    points, colors = [], []
    for p in shard_paths:
        pts, cols = read_ply(p)
        points.append(pts)
        if cols is not None:
            colors.append(cols)
    points = np.concatenate(points, axis=0)
    colors = np.concatenate(colors, axis=0) if colors else None
    if output_path is None:
        output_path = os.path.join(out_dir, "final3d_model.ply")
    write_ply(output_path, points, colors=colors)
    logger.info("Merged %d shards -> %d points at %s",
                len(shard_paths), len(points), output_path)
    return output_path


# ---------------------------------------------------------------------------
# gipuma export (compat with the external fusibile tool)
# ---------------------------------------------------------------------------

def mvsnet_to_gipuma(dense_folder: str, gipuma_point_folder: str) -> None:
    """(reference: depthfusion.py:124-169)"""
    depth_folder = os.path.join(dense_folder, "depths_mvsnet")
    names = _image_names(depth_folder)
    cam_folder = os.path.join(gipuma_point_folder, "cams")
    image_folder = os.path.join(gipuma_point_folder, "images")
    for d in (gipuma_point_folder, cam_folder, image_folder):
        mkdir_p(d)

    for name in names:
        prefix = os.path.splitext(name)[0]
        cam = load_cam_txt(os.path.join(depth_folder, prefix + ".txt"))
        P = projection_matrix(cam)
        with open(os.path.join(cam_folder, name + ".P"), "w") as f:
            for r in range(3):
                f.write(" ".join(str(P[r, c]) for c in range(4)) + " \n")
            f.write("\n")
        shutil.copy(os.path.join(depth_folder, name),
                    os.path.join(image_folder, name))

    gipuma_prefix = "2333__"
    for name in names:
        prefix = os.path.splitext(name)[0]
        sub = os.path.join(gipuma_point_folder, gipuma_prefix + prefix)
        mkdir_p(sub)
        depth = load_pfm(os.path.join(depth_folder, prefix + "_prob_filtered.pfm"))
        write_dmb(os.path.join(sub, "disp.dmb"), depth)
        # constant fake normals (1,1,1)/sqrt(3), masked by valid depth
        normal = np.ones((depth.shape[0], depth.shape[1], 3), np.float32) / 1.732050808
        normal *= (depth > 0)[..., None].astype(np.float32)
        write_dmb(os.path.join(sub, "normals.dmb"), normal)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dense_folder", required=True)
    p.add_argument("--prob_threshold", type=float, default=0.8)
    p.add_argument("--disp_threshold", type=float, default=0.25)
    p.add_argument("--num_consistent", type=int, default=3)
    p.add_argument("--depth_rel_threshold", type=float, default=0.01)
    p.add_argument("--voxel_size", type=float, default=0.0,
                   help="voxel edge (scene units) for native point consolidation; 0 = off")
    p.add_argument("--min_neighbors", type=int, default=0,
                   help="density outlier filter: min points within 3*voxel_size; 0 = off")
    p.add_argument("--mode", default="native",
                   choices=["native", "gipuma-export", "merge-shards"],
                   help="native: in-framework fusion to PLY; gipuma-export: "
                        "write fusibile-compatible inputs; merge-shards: "
                        "combine multi-host shard PLYs")
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--shard_count", type=int, default=1)
    args = p.parse_args(argv)

    if args.mode == "native":
        fuse_session(args.dense_folder, args.prob_threshold, args.disp_threshold,
                     args.num_consistent, args.depth_rel_threshold,
                     voxel_size=args.voxel_size, min_neighbors=args.min_neighbors,
                     shard_index=args.shard_index, shard_count=args.shard_count)
    elif args.mode == "merge-shards":
        merge_shards(args.dense_folder)
    else:
        point_folder = os.path.join(args.dense_folder, "points_mvsnet")
        mkdir_p(point_folder)
        probability_filter(args.dense_folder, args.prob_threshold)
        mvsnet_to_gipuma(args.dense_folder, point_folder)
    return 0


if __name__ == "__main__":
    sys.exit(main())
