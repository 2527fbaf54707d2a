"""TPU lowerings for small-channel convolutions.

The 3D U-Net regularizer (models/regnet.py; reference topology:
cnn_wrapper/mvsnetworks.py:122-158) runs 3x3x3 convs at 8-64 channels.
XLA's TPU conv lowering pads BOTH the contraction (Cin) and the output
(Cout) channel dims to the 128-lane MXU width, so a 32->8 conv wastes
~98% of the MXU (measured ~2% MFU at the 1152x864 D192 operating point,
tools/bench_conv.py).

`conv3d_wide_n` re-expresses the conv so the MXU dims are filled:

    out[z,y,x,co] = sum_{dz,dy,dx,ci} k[dz,dy,dx,ci,co] * x[z+dz-1,y+dy-1,x+dx-1,ci]

becomes a 1x1x3 conv whose output channels are the (dz, dy, co) triples —
N = 9*Cout (72->128 for Cout=8 instead of 8->128) with K = (dx, Cin) in
the contraction — followed by 9 shifted adds over (dz, dy) that XLA fuses
into a single output pass (the 9 channel blocks partition the partial
tensor, so it is read exactly once).

The math is exact (a reassociation of the same sum); only bf16 rounding
order differs from the direct conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wide_n_applicable(ndim: int, kernel, stride, dilation, cout: int) -> bool:
    """Whether conv3d_wide_n covers this conv and is expected to win.

    3x3x3 only, stride 1 or 2, no dilation. Above Cout=32 the direct
    lowering already fills ~half the lanes and the partial-tensor traffic
    stops paying for itself.
    """
    k = kernel if isinstance(kernel, (tuple, list)) else (kernel,) * ndim
    s = stride if isinstance(stride, (tuple, list)) else (stride,) * ndim
    d = dilation if isinstance(dilation, (tuple, list)) else (dilation,) * ndim
    return (ndim == 3
            and tuple(k) == (3, 3, 3)
            and len(set(s)) == 1 and s[0] in (1, 2)
            and tuple(d) == (1, 1, 1)
            and cout <= 32)


def deconv3d_wide_n(x, kernel):
    """SAME 3x3x3 stride-2 transposed conv at wide-N MXU utilization.

    Matches nn.ConvTranspose(features, (3,3,3), (2,2,2), 'SAME') exactly:
    the x axis runs through lax.conv_transpose itself (1x1x3 kernel, stride
    (1,1,2)) with the (dz, dy) taps folded into N = 9*Cout; the z and y
    axes are reconstructed by polyphase interleave. Probing SAME k=3 s=2:
    source m scatters w[2]->out[2m], w[1]->out[2m+1], w[0]->out[2m+2], so

      out[2m]   = p[m, dz=2] + p[m-1, dz=0]
      out[2m+1] = p[m, dz=1]
    """
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3), kernel.shape
    k2 = jnp.transpose(kernel, (2, 3, 0, 1, 4)).reshape(1, 1, kw, cin,
                                                        kd * kh * cout)
    p = jax.lax.conv_transpose(x, k2, (1, 1, 2), "SAME",
                               dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    B, D, H, W2, _ = p.shape

    def interleave(even, odd, axis):
        st = jnp.stack([even, odd], axis=axis + 1)
        sh = list(st.shape)
        sh[axis:axis + 2] = [sh[axis] * 2]
        return st.reshape(sh)

    def polyphase(axis, taps):
        # taps: (t0, t1, t2) partials indexed by tap offset along `axis`
        t0, t1, t2 = taps
        pad = [(0, 0)] * t0.ndim
        pad[axis] = (1, 0)
        t0_prev = jnp.pad(t0, pad)
        idx = [slice(None)] * t0.ndim
        idx[axis] = slice(0, t0.shape[axis])
        even = t2 + t0_prev[tuple(idx)]
        return interleave(even, t1, axis)

    # channel blocks: index (dz*3 + dy)
    blk = lambda dz, dy: p[..., (dz * 3 + dy) * cout:(dz * 3 + dy + 1) * cout]
    # y axis first (per dz), then z
    per_dz = [polyphase(2, (blk(dz, 0), blk(dz, 1), blk(dz, 2)))
              for dz in range(3)]
    return polyphase(1, tuple(per_dz))


def conv3d_wide_n(x, kernel, stride: int = 1):
    """SAME 3x3x3 conv, (B, D, H, W, Cin) @ (3, 3, 3, Cin, Cout).

    Equivalent to lax.conv_general_dilated(..., 'SAME') with NDHWC/DHWIO,
    stride (s, s, s), at wide-N MXU utilization. Differentiable (pure XLA).
    """
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3), kernel.shape
    s = stride
    k2 = jnp.transpose(kernel, (2, 3, 0, 1, 4)).reshape(1, 1, kw, cin,
                                                        kd * kh * cout)
    dn = jax.lax.conv_dimension_numbers(x.shape, k2.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    p = jax.lax.conv_general_dilated(x, k2, (1, 1, s), "SAME",
                                     dimension_numbers=dn)
    B, D, H, W, _ = p.shape
    pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    # SAME pad_low for k=3 is 1 at stride 1 but 0 at stride 2.
    o = s - 1
    out = None
    for dz in range(3):
        for dy in range(3):
            i = dz * 3 + dy
            term = pp[:, dz + o:dz + o + D:s, dy + o:dy + o + H:s, :,
                      i * cout:(i + 1) * cout]
            out = term if out is None else out + term
    return out
