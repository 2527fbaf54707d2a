"""Host-side union-span distribution for the group cost kernel.

Quantifies BAND-row matmul waste at a bench point: what fraction of
(group, view, depth) instances need the second static vertical block
(nextra >= 1). Motivates MVSNET_TPU_SWEEP_COND2 (38% skippable at the
3DCNN point).
"""
import os
os.environ["MVSNET_TPU_PLATFORM"]="cpu"
import sys; sys.path.insert(0,"/root/repo")
import numpy as np, jax.numpy as jnp
from bench import make_rig
from mvsnet_tpu.ops.geometry import homographies_for_views
from mvsnet_tpu.ops.warp import projected_coords
from mvsnet_tpu.ops.pallas.sweep import BAND

H, W, D, V = 216, 288, 192, 3
G = 4
depth_start, depth_interval = 425.0, 2.5*1.06
cams = make_rig(V, 1152, 864, depth_start, depth_interval, D)
cams_s = cams.copy(); cams_s[:, :, 1, :3, :3] *= 0.25; cams_s[:,:,1,2,2]=1.0
homs = homographies_for_views(jnp.asarray(cams_s), D,
    jnp.array([depth_start]), jnp.array([depth_interval]),
    jnp.array([depth_start + (D-1)*depth_interval]))
print("homs", homs.shape)
# homs: (B, V-1, D, 3, 3)?
h = np.asarray(homs)[0]          # (Vm1, D, 3, 3)
Vm1 = h.shape[0]
x, y = projected_coords(jnp.asarray(h.reshape(-1,3,3)), H, W)
x = np.asarray(x).reshape(Vm1, D, H, W); y = np.asarray(y).reshape(Vm1, D, H, W)
# group rows by G, compute per (v,d,group) union span of floor(y)..floor(y)+1
y2 = y.reshape(Vm1, D, H//G, G, W)
rlo = np.clip(np.floor(y2).min(axis=(3,4)), 0, H-1)
rhi = np.clip(np.floor(y2).max(axis=(3,4))+1, 0, H-1)
span = rhi - rlo + 1
rbase = np.minimum(rlo.astype(int), H-BAND)
nextra = (rhi.astype(int) - rbase)//BAND
print("BAND", BAND, "span mean/med/p90/max:", span.mean(), np.median(span), np.percentile(span,90), span.max())
vals, cnt = np.unique(nextra, return_counts=True)
print("nextra dist:", dict(zip(vals.tolist(), (cnt/cnt.sum()).round(3).tolist())))
