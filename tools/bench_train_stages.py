"""Per-stage fwd+bwd breakdown of the training step on the real chip.

Times jax.grad of each stage of the 3DCNN training graph in isolation at
the reference training operating point (640x480, D=192, V=3, lite,
bf16 compute — reference train.py:53-109), plus the full train step for
the end-to-end number. The stage sum won't exactly match the full step
(no cross-stage fusion, no optimizer), but it shows where the backward
milliseconds live — round 3 optimized inference 36% while training sat
untouched at 0.180 s/step (VERDICT r3 weak #6).

Usage: python tools/bench_train_stages.py [--stage STAGE]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import json
import time

import numpy as np


def timed(fn, *args, iters=6):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, *a):
        def body(_, carry):
            perturbed = jax.tree.map(
                lambda t: (t + carry * 1e-30).astype(t.dtype), a[0])
            out = fn(*((perturbed,) + a[1:]))
            # reduce EVERY leaf: fetching only leaves[0] lets XLA dead-
            # code-eliminate the rest of the computation (a param-grad
            # pytree measured as "-0.07 ms" in r4e because only the last
            # layer's dk survived DCE)
            sums = jax.tree.leaves(jax.tree.map(
                lambda t: jnp.sum(t.astype(jnp.float32)), out))
            total = sums[0]
            for s in sums[1:]:
                total = total + s
            return total.astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(1, *args))
    float(loop(1 + iters, *args))
    t0 = time.perf_counter()
    float(loop(1, *args))
    t1 = time.perf_counter()
    float(loop(1 + iters, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["all", "features", "cost", "regnet", "tail",
                             "loss", "opt", "transfer", "modelfb", "step"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from mvsnet_tpu.config import ModelConfig
    from mvsnet_tpu.models.feature_net import UNetDS2GN
    from mvsnet_tpu.models.regnet import RegNetUS0
    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.depth import soft_argmin
    from mvsnet_tpu.ops.geometry import homographies_for_views

    W, H, D, V = 640, 480, 192, 3
    h, w = H // 4, W // 4
    C = 16                                   # lite feature width
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = {}
    want = lambda s: args.stage in ("all", s)

    def grad_time(f, x, *rest):
        """fwd+bwd wall time of sum(f(x)) wrt x (params or activations)."""
        g = jax.grad(lambda a, *r: jnp.sum(
            jnp.asarray(jax.tree.leaves(
                jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)),
                             f(a, *r)))[0])))
        return timed(g, x, *rest)

    if want("features"):
        net = UNetDS2GN("lite", dtype=dt)
        imgs = jnp.asarray(rng.standard_normal((V, H, W, 3)), dt)
        params = jax.jit(net.init)(jax.random.PRNGKey(0), imgs[:1, :64, :64])
        t = grad_time(lambda p, x: net.apply(p, x), params, imgs)
        print(f"features fwd+bwd (3 views)  {t*1e3:7.2f} ms", flush=True)
        results["features_fb_s"] = round(t, 5)

    cams = bench_mod.make_rig(V, W, H, 425.0, 2.5, D)
    cams_s = cams.copy()
    cams_s[:, :, 1, :2] /= 4.0
    depth_start = jnp.full((1,), 425.0, jnp.float32)
    depth_interval = jnp.full((1,), 2.5, jnp.float32)
    depth_end = depth_start + (D - 1) * depth_interval

    if want("cost"):
        ref_f = jnp.asarray(rng.standard_normal((1, h, w, C)), dt)
        view_f = jnp.asarray(rng.standard_normal((V - 1, 1, h, w, C)), dt)
        homs = homographies_for_views(jnp.asarray(cams_s), D, depth_start,
                                      depth_interval, depth_end)

        def cost(rv, h_):
            r, v = rv
            return plane_sweep_cost_volume(r, v, h_, use_pallas=True,
                                           differentiable=True)

        t = grad_time(cost, (ref_f, view_f), homs)
        print(f"cost volume fwd+bwd         {t*1e3:7.2f} ms", flush=True)
        results["cost_fb_s"] = round(t, 5)

    if want("regnet"):
        net = RegNetUS0("lite", dtype=dt)
        cv = jnp.asarray(rng.standard_normal((1, D, h, w, C)), dt)
        variables = jax.jit(lambda k, x: net.init(k, x, True))(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, C), dt))

        def reg_fb(x, v):
            out, _ = net.apply(v, x, True, mutable=["batch_stats"])
            return out

        t = grad_time(reg_fb, cv, variables)
        print(f"RegNetUS0 fwd+bwd (dx)      {t*1e3:7.2f} ms", flush=True)
        results["regnet_fb_s"] = round(t, 5)

        # dk visibility: grad wrt params adds the per-layer XLA wgrads on
        # top of the dx chain (the cotangent chain is shared)
        t2 = grad_time(lambda v, x: reg_fb(x, v), variables, cv)
        print(f"RegNetUS0 fwd+bwd (dk+dx)   {t2*1e3:7.2f} ms", flush=True)
        results["regnet_fb_dk_s"] = round(t2, 5)

        # (an eval-BN grad probe was removed: eval mode dispatches the
        # FUSED conv kernels, which are non-differentiable by contract —
        # jax.grad through them crashes in the pallas JVP rule)

    if want("tail"):
        reg = jnp.asarray(rng.standard_normal((1, D, h, w)), jnp.float32)
        gt = jnp.asarray(
            rng.uniform(425.0, 425.0 + 190 * 2.5, (1, h, w, 1)), jnp.float32)

        def tail(r):
            depth_map, _ = soft_argmin(r, depth_start, depth_interval, D)
            return jnp.mean(jnp.abs(depth_map - gt))

        t = grad_time(tail, reg)
        print(f"soft-argmin+L1 fwd+bwd      {t*1e3:7.2f} ms", flush=True)
        results["tail_fb_s"] = round(t, 5)

    if want("loss"):
        # loss + both metrics, fwd+bwd wrt the depth map (VERDICT r4 #3:
        # the ~80 ms "loss/opt/glue" residual was never measured)
        from mvsnet_tpu.losses import mvsnet_regression_loss

        gt = jnp.asarray(
            rng.uniform(425.0, 425.0 + 190 * 2.5, (1, h, w, 1)), jnp.float32)
        d_end = depth_start + 191 * depth_interval

        def loss_all(est):
            loss, l1, l3, dbg = mvsnet_regression_loss(
                est, gt, depth_start, d_end, loss_type="power",
                grad_loss=True)
            return loss + l1 + l3 + dbg

        est0 = jnp.asarray(
            rng.uniform(425.0, 425.0 + 190 * 2.5, (1, h, w, 1)), jnp.float32)
        t = grad_time(loss_all, est0)
        print(f"loss+metrics fwd+bwd        {t*1e3:7.2f} ms", flush=True)
        results["loss_fb_s"] = round(t, 5)

    if want("opt") or want("transfer") or want("modelfb") or want("step"):
        from mvsnet_tpu import train_lib
        from mvsnet_tpu.config import TrainConfig
        from mvsnet_tpu.models import MVSNet

        cfg_ = ModelConfig(view_num=V, max_d=D, width=W, height=H,
                           network_mode="lite", compute_dtype="bfloat16",
                           depth_chunk=16)
        tcfg_ = TrainConfig(loss_type="power", grad_loss=True)
        model_ = MVSNet(cfg_)
        images_ = rng.standard_normal((1, V, H, W, 3)).astype(np.float32)
        cams_b_ = cams.copy()
        cams_b_[:, :, 1, :3, :3] *= 0.25
        cams_b_[:, :, 1, 2, 2] = 1.0
        gt_ = rng.uniform(425.0, 425.0 + 190 * 2.5,
                          (1, h, w, 1)).astype(np.float32)
        gt_full_ = rng.uniform(425.0, 425.0 + 190 * 2.5,
                               (1, H, W, 1)).astype(np.float32)
        batch_ = (images_, cams_b_, gt_, gt_full_)
        state_ = train_lib.create_train_state(model_, cfg_, tcfg_,
                                              jax.random.PRNGKey(0), batch_)

    if want("opt"):
        # optimizer update alone: apply_gradients on a synthetic grads
        # pytree the same shape as params
        grads0 = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6,
                              state_.params)

        def opt_step(g):
            ns = state_.apply_gradients(grads=g,
                                        batch_stats=state_.batch_stats)
            return sum(jnp.sum(p.astype(jnp.float32))
                       for p in jax.tree.leaves(ns.params))

        t = timed(opt_step, grads0)
        nparam = sum(int(np.prod(p.shape))
                     for p in jax.tree.leaves(state_.params))
        print(f"optimizer update ({nparam/1e6:.2f}M)  {t*1e3:7.2f} ms",
              flush=True)
        results["opt_s"] = round(t, 5)

    if want("transfer"):
        # host->device batch transfer (images dominate: V*H*W*3 f32).
        # Differenced (N puts + 1 fetch) - (1 put + 1 fetch) to cancel the
        # variable per-fetch tunnel latency.
        nbytes = sum(a.nbytes for a in batch_)
        touch = jax.jit(lambda bs: sum(jnp.sum(b[0].astype(jnp.float32))
                                       for b in bs))
        # distinct host arrays each put — defeats any device_put caching
        host = [tuple(a + np.float32(i * 1e-6) for a in batch_)
                for i in range(7)]

        def put_n(n):
            devs = [jax.device_put(host[i]) for i in range(n)]
            return float(touch(devs))

        put_n(2)                                  # warm compile both arities
        put_n(7)
        t0 = time.perf_counter(); put_n(2); t1 = time.perf_counter()
        put_n(7); t2 = time.perf_counter()
        t = ((t2 - t1) - (t1 - t0)) / 5
        print(f"batch transfer ({nbytes/1e6:.1f} MB)   {t*1e3:7.2f} ms",
              flush=True)
        results["transfer_s"] = round(t, 5)

    if want("modelfb"):
        # full loss_fn grad wrt params (model fwd+bwd + loss, NO optimizer,
        # NO batch_stats donation): step_s - modelfb_s isolates opt+glue
        batch_dev = jax.device_put(batch_)

        def model_fb(params, imgs):
            def loss_fn(p):
                return train_lib.compute_loss(
                    model_, cfg_, tcfg_, p, state_.batch_stats,
                    (imgs,) + batch_dev[1:], True)[0]
            g = jax.grad(loss_fn)(params)
            return sum(jnp.sum(p.astype(jnp.float32))
                       for p in jax.tree.leaves(g))

        t = timed(lambda im: model_fb(state_.params, im),
                  jnp.asarray(images_))
        print(f"model fwd+bwd (no opt)      {t*1e3:7.2f} ms", flush=True)
        results["modelfb_s"] = round(t, 5)

    if want("step"):
        # full train step at the bench.py operating point, for reference
        from mvsnet_tpu import train_lib
        from mvsnet_tpu.config import TrainConfig
        from mvsnet_tpu.models import MVSNet

        cfg = ModelConfig(view_num=V, max_d=D, width=W, height=H,
                          network_mode="lite", compute_dtype="bfloat16",
                          depth_chunk=16)
        tcfg = TrainConfig(loss_type="power", grad_loss=True)
        model = MVSNet(cfg)
        images = rng.standard_normal((1, V, H, W, 3)).astype(np.float32)
        cams_b = cams.copy()
        cams_b[:, :, 1, :3, :3] *= 0.25
        cams_b[:, :, 1, 2, 2] = 1.0
        gt = rng.uniform(425.0, 425.0 + 190 * 2.5,
                         (1, h, w, 1)).astype(np.float32)
        gt_full = rng.uniform(425.0, 425.0 + 190 * 2.5,
                              (1, H, W, 1)).astype(np.float32)
        batch = (images, cams_b, gt, gt_full)
        state = train_lib.create_train_state(model, cfg, tcfg,
                                             jax.random.PRNGKey(0), batch)
        step_fn = train_lib.make_train_step(model, cfg, tcfg, donate=False)

        def step(imgs):
            # must depend on new_state or XLA DCEs the whole backward
            # (see bench.py bench_train)
            new_state, metrics = step_fn(state, (imgs,) + batch[1:])
            psum = sum(jnp.sum(p.astype(jnp.float32))
                       for p in jax.tree.leaves(new_state.params))
            return metrics["loss"] + 0.0 * psum

        t = timed(step, jnp.asarray(images))
        print(f"full train step             {t*1e3:7.2f} ms", flush=True)
        results["step_s"] = round(t, 5)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
