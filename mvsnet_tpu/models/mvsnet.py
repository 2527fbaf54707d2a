"""MVSNet / R-MVSNet end-to-end graphs.

TPU-native re-design of the reference's five graph builders
(reference: mvsnet/model.py:257-811):

  forward_3dcnn        <- `inference` + `inference_mem` (one implementation:
                          the scanned cost-volume builder already gives the
                          memory-optimized behaviour; no Variable/while_loop
                          contortions needed on TPU)
  gru_cost_sweep       <- shared GRU depth sweep (lax.scan over planes)
  forward_prob_recurrent <- `inference_prob_recurrent` (training, softmax
                            prob volume for cross-entropy)
  forward_gru_wta      <- `inference_winner_take_all` (decode; running
                          argmax over the scanned reg costs)
  refine               <- `depth_refine` (+ RefineNet variants)

Feature extraction folds the V views into the batch axis — one conv stack
application instead of V reuse-scoped towers (GN statistics are per-sample,
so this is numerically identical to the reference's weight-shared towers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvsnet_tpu.config import ModelConfig
from mvsnet_tpu.models.feature_net import UNetDS2GN
from mvsnet_tpu.models.gru import GRURegularizer
from mvsnet_tpu.models.layers import cw_pipeline_enabled
from mvsnet_tpu.models.refine import RefineNetConv, RefineUNetConv
from mvsnet_tpu.models.regnet import RegNetUS0
from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
from mvsnet_tpu.ops.depth import soft_argmin_prob_map, winner_take_all_update
from mvsnet_tpu.ops.geometry import (
    depth_values,
    homographies_for_views,
    inv_depth_values,
)
from mvsnet_tpu.parallel.mesh import constrain


def _resize_bilinear(x, height, width):
    """Bilinear resize on (B, H, W, C) (reference: tf.image.resize_bilinear)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, height, width, C), method="bilinear")


class _GRUStep(nn.Module):
    """One depth plane: cost slice -> 3-cell GRU -> 1-channel projection.

    cw: the whole step runs in the Pallas kernels' channel-second-minor
    (B, h, C, w) layout — cost slices arrive in it straight from the fused
    cost kernel and the GRU states stay in it across the scan; only the
    1-channel reg output swaps back (free: (…, 1, w) and (…, w, 1) share
    one data order)."""

    cfg: ModelConfig
    cw: bool = False

    @nn.compact
    def __call__(self, carry, cost_d):
        reg, states = GRURegularizer(self.cfg.network_mode, dtype=self.cfg.compute_dtype,
                                     name="gru")(-cost_d, carry, cw=self.cw)
        if self.cw:
            reg = jnp.swapaxes(reg, -1, -2)
        return states, reg.astype(jnp.float32)


def apply_forward_3dcnn(model: "MVSNet", variables, images, cams,
                        depth_start, depth_interval):
    """Eval 3DCNN forward incl. optional refinement, shared by the
    single-device and both multi-device inference paths (predict.py /
    parallel/infer_step.py) so refinement dispatch — including the
    stereo-view channel — cannot drift between them.

    Returns (depth_or_refined, prob_map, residual); residual is zeros
    when refinement is off (computed in-graph: callers are jitted and
    eager ops on the remote backend are a round trip each)."""
    cfg = model.cfg
    depth_map, prob_map = model.apply(
        variables, images, cams, depth_start, depth_interval,
        training=False, method=MVSNet.forward_3dcnn)
    if not cfg.refinement:
        return depth_map, prob_map, jnp.zeros_like(depth_map)
    stereo = (images[:, 1] if (cfg.refine_with_stereo and images.shape[1] > 1)
              else None)
    refined, residual = model.apply(
        variables, depth_map, images[:, 0], prob_map, depth_start,
        depth_interval, stereo_image=stereo, training=False,
        method=MVSNet.refine)
    return refined, prob_map, residual


class MVSNet(nn.Module):
    """Flagship module bundling the feature tower + regularizers + refiner."""

    cfg: ModelConfig

    def _extract_features(self, images, training: bool = False):
        """(B, V, H, W, 3) -> ref (B,h,w,C), views (V-1,B,h,w,C)."""
        cfg = self.cfg
        B, V, H, W, _ = images.shape
        flat = images.reshape(B * V, H, W, 3)
        # eval towers chain in the Pallas kernels' CW layout (zero
        # inter-layer relayouts); training keeps the differentiable path
        cw = (not training) and cw_pipeline_enabled()
        feats = UNetDS2GN(cfg.network_mode, dtype=cfg.compute_dtype,
                          name="feature_net")(flat, cw=cw)
        h, w, C = feats.shape[1:]
        feats = feats.reshape(B, V, h, w, C)
        ref = constrain(feats[:, 0], "data", "space")
        views = constrain(jnp.moveaxis(feats[:, 1:], 1, 0), None, "data", "space")
        return ref, views

    @nn.compact
    def forward_3dcnn(self, images, cams, depth_start, depth_interval,
                      training: bool = False):
        """MVSNet 3D-CNN graph (reference: model.py:257-372,374-502).

        Args:
          images: (B, V, H, W, 3) centered images; view 0 = reference.
          cams: (B, V, 2, 4, 4) cam tensors scaled to the cost-volume
            resolution (sample_scale applied by the data plane).
          depth_start, depth_interval: (B,).
        Returns:
          depth_map (B, h, w, 1) f32, prob_map (B, h, w, 1) f32.
        """
        cfg = self.cfg
        B = images.shape[0]
        depth_start = jnp.broadcast_to(jnp.asarray(depth_start, jnp.float32), (B,))
        depth_interval = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (B,))
        depth_end = depth_start + (cfg.max_d - 1) * depth_interval

        ref_f, view_f = self._extract_features(images, training)
        fh, fw = ref_f.shape[1:3]
        # The 3-level encoder/decoder of RegNetUS0 needs every halving to
        # stay even, i.e. (D, h, w) divisible by 8 => input H, W divisible
        # by 32. All reference operating points satisfy this (640x480,
        # 1152x864, 1600x1200); the data plane crops accordingly.
        for dim, name in ((cfg.max_d, "max_d"), (fh, "feature height"), (fw, "feature width")):
            if dim % 8 != 0:
                raise ValueError(
                    f"{name}={dim} must be divisible by 8 for the 3D U-Net "
                    f"regularizer (input H/W divisible by 32)")

        homs = homographies_for_views(
            cams, cfg.max_d, depth_start, depth_interval, depth_end,
            inverse_depth=cfg.inverse_depth)

        # Training differentiates the sweep: the custom-VJP Pallas warp
        # (transposed-warp backward kernel) handles it; inference gets the
        # fully fused cost kernel.
        if training:
            build = jax.checkpoint(
                lambda r, v, h_: plane_sweep_cost_volume(
                    r, v, h_, use_pallas=cfg.use_pallas, differentiable=True))
            cost_volume = build(ref_f, view_f, homs)
            cw = False
        else:
            # CW handoff: the fused cost kernel natively emits
            # channel-second-minor (B, D, h, C, w), which the eval RegNet
            # pipeline consumes without any relayout (models/regnet.py).
            cw = cw_pipeline_enabled()
            cost_volume = plane_sweep_cost_volume(ref_f, view_f, homs,
                                                  use_pallas=cfg.use_pallas,
                                                  cw_out=cw)

        # depth-slab + spatial sharding of the cost volume: GSPMD inserts
        # halo exchanges for the 3D U-Net and a collective softmax along D.
        # (CW only reorders the two minor axes, so the named-axis prefix
        # (data, depth, space) is layout-independent.)
        cost_volume = constrain(cost_volume, "data", "depth", "space")

        reg = RegNetUS0(cfg.network_mode, dtype=cfg.compute_dtype,
                        name="regnet")(cost_volume, training, x_cw=cw)
        reg = jnp.squeeze(reg, axis=-1).astype(jnp.float32)     # (B, D, h, w)
        reg = constrain(reg, "data", "depth", "space")

        # fused tail: never materializes the (B, D, h, w) f32 softmax
        # volume (ops/depth.py:soft_argmin_prob_map) — same math as the
        # composed soft_argmin + probability_map reference path
        # (model.py:343-366 + 45-144), ~2x less HBM traffic over the
        # regularized volume.
        depth_map, prob_map = soft_argmin_prob_map(
            reg, depth_start, depth_interval, cfg.max_d,
            inverse_depth=cfg.inverse_depth, depth_end=depth_end,
            num_buckets=cfg.prob_num_buckets)
        return depth_map, prob_map

    @nn.compact
    def gru_cost_sweep(self, images, cams, depth_start, depth_interval,
                       depth_end=None, differentiable: bool = False):
        """Scan the 3-cell ConvGRU over depth planes.

        Returns (B, D, h, w) regularized costs (pre-softmax / pre-exp).
        (reference: model.py:505-599 forward sweep)
        """
        cfg = self.cfg
        B = images.shape[0]
        depth_start = jnp.broadcast_to(jnp.asarray(depth_start, jnp.float32), (B,))
        if depth_end is None:
            depth_interval = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (B,))
            depth_end = depth_start + (cfg.max_d - 1) * depth_interval

        ref_f, view_f = self._extract_features(images,
                                               training=differentiable)
        h, w = ref_f.shape[1:3]

        homs = homographies_for_views(
            cams, cfg.max_d, depth_start, depth_interval, depth_end,
            inverse_depth=cfg.inverse_depth)

        # Cost slices for ALL planes via the batched warp (one big gather /
        # Pallas sweep instead of D sequential small warps — the reference's
        # O(1)-memory per-plane loop, model.py:565-599, trades severe warp
        # inefficiency for memory the TPU doesn't need to save at 1/4 res).
        # Eval rides the CW pipeline end to end: the fused cost kernel
        # emits (B, D, h, C, w) natively and every GRU-cell conv/norm runs
        # in that layout (models/gru.py) — zero relayouts per plane.
        cw = (not differentiable) and cw_pipeline_enabled()
        cost_volume = plane_sweep_cost_volume(
            ref_f, view_f, homs, use_pallas=self.cfg.use_pallas,
            differentiable=differentiable, cw_out=cw)
        # (D is the sequential scan axis — only batch/space shard here)
        cost_by_depth = jnp.moveaxis(cost_volume, 1, 0)  # (D, B, h, w, C) / CW (D, B, h, C, w)
        cost_by_depth = constrain(cost_by_depth, None, "data", "space")

        init = GRURegularizer.init_states(B, h, w, cfg.network_mode,
                                          jnp.float32, cw=cw)
        scan = nn.scan(
            nn.remat(_GRUStep, static_argnums=()),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(self.cfg, cw, name="gru_sweep")
        _, regs = scan(init, cost_by_depth)                  # (D, B, h, w, 1)
        return jnp.moveaxis(jnp.squeeze(regs, -1), 0, 1)     # (B, D, h, w)

    def forward_prob_recurrent(self, images, cams, depth_start, depth_interval):
        """R-MVSNet training graph: softmax probability volume
        (reference: model.py:505-599). Gradients flow -> custom-VJP warp."""
        regs = self.gru_cost_sweep(images, cams, depth_start, depth_interval,
                                   differentiable=True)
        return jax.nn.softmax(regs, axis=1)

    def forward_gru_wta(self, images, cams, depth_start, depth_interval=None,
                        depth_end=None):
        """R-MVSNet decode: winner-take-all over the GRU sweep
        (reference: model.py:601-751).

        Returns depth_map (B,h,w,1), prob_map (B,h,w,1) = max_prob/sum_prob.
        """
        cfg = self.cfg
        B = images.shape[0]
        depth_start = jnp.broadcast_to(jnp.asarray(depth_start, jnp.float32), (B,))
        if depth_end is None:
            depth_interval = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (B,))
            depth_end = depth_start + (cfg.max_d - 1) * depth_interval
        else:
            depth_end = jnp.broadcast_to(jnp.asarray(depth_end, jnp.float32), (B,))
            depth_interval = (depth_end - depth_start) / (cfg.max_d - 1)

        regs = self.gru_cost_sweep(images, cams, depth_start, depth_interval,
                                   depth_end)                 # (B, D, h, w)
        h, w = regs.shape[2:]

        if cfg.inverse_depth:
            samples = inv_depth_values(depth_start, depth_end, cfg.max_d)
        else:
            samples = depth_values(depth_start, depth_interval, cfg.max_d)

        prob = jnp.exp(regs)                                  # (B, D, h, w)
        carry = (jnp.zeros((B, h, w, 1)), jnp.zeros((B, h, w, 1)), jnp.zeros((B, h, w, 1)))

        def step(c, xs):
            p, d = xs
            return winner_take_all_update(c, p[..., None], d), None

        (max_prob, depth_image, exp_sum), _ = jax.lax.scan(
            step, carry, (jnp.moveaxis(prob, 1, 0), jnp.moveaxis(samples, 1, 0)))
        return depth_image, max_prob / (exp_sum + 1e-7)

    @nn.compact
    def refine(self, init_depth_map, image, prob_map, depth_start, depth_interval,
               stereo_image=None, training: bool = False):
        """Depth refinement (reference: model.py:753-811).

        Returns (refined_depth_map, residual_depth_map).
        """
        cfg = self.cfg
        B = init_depth_map.shape[0]
        depth_start = jnp.broadcast_to(jnp.asarray(depth_start, jnp.float32), (B,))
        depth_interval = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (B,))
        depth_end = depth_start + (cfg.max_d - 1) * depth_interval
        scale = (depth_end - depth_start)[:, None, None, None]
        start = depth_start[:, None, None, None]

        norm_depth = (init_depth_map - start) / scale

        if cfg.upsample_before_refinement:
            H, W = image.shape[1:3]
            norm_depth = _resize_bilinear(norm_depth, H, W)
            init_depth_map = _resize_bilinear(init_depth_map, H, W)
            if cfg.refine_with_confidence:
                prob_map = _resize_bilinear(prob_map, H, W)
        else:
            dh, dw = init_depth_map.shape[1:3]
            image = _resize_bilinear(image, dh, dw)
            if stereo_image is not None:
                stereo_image = _resize_bilinear(stereo_image, dh, dw)

        data = norm_depth
        if cfg.refine_with_confidence:
            data = jnp.concatenate([data, prob_map], axis=-1)
        if stereo_image is not None:
            data = jnp.concatenate([data, stereo_image], axis=-1)

        if cfg.refinement_network == "unet":
            net = RefineUNetConv(cfg.network_mode, dtype=cfg.compute_dtype,
                                 name="refine_net")
        elif cfg.refinement_network == "original":
            net = RefineNetConv(cfg.network_mode, dtype=cfg.compute_dtype,
                                name="refine_net")
        else:
            raise NotImplementedError(cfg.refinement_network)

        residual_norm = net(image, data, training).astype(jnp.float32)
        residual = residual_norm * scale
        if cfg.residual_refinement:
            refined = residual + init_depth_map
        else:
            refined = residual
        return refined, residual

    def __call__(self, images, cams, depth_start, depth_interval,
                 training: bool = False):
        """Default graph for init/jit: regularization-dispatched forward."""
        if self.cfg.regularization == "GRU":
            if training:
                return self.forward_prob_recurrent(images, cams, depth_start, depth_interval)
            return self.forward_gru_wta(images, cams, depth_start, depth_interval)
        depth_map, prob_map = self.forward_3dcnn(
            images, cams, depth_start, depth_interval, training)
        if self.cfg.refinement:
            ref_image = images[:, 0]
            stereo = images[:, 1] if (self.cfg.refine_with_stereo and images.shape[1] > 1) else None
            refined, residual = self.refine(
                depth_map, ref_image, prob_map, depth_start, depth_interval,
                stereo_image=stereo, training=training)
            return depth_map, prob_map, refined, residual
        return depth_map, prob_map
