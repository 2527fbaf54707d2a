"""Probe the remote-TPU tunnel once: tiny jit + scalar fetch under a timeout.

Exit 0 and print latency if the chip answers; exit 1 on hang/failure.
Used by the round driver loop to know when chip benchmarking is possible
(the tunnel is observed to go down for hours at a stretch — CLAUDE.md).
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    v = float(jnp.sum(jnp.ones((8, 8))))
    dt = time.time() - t0
    dev = jax.devices()[0]
    print(f"tunnel up: sum={v} in {dt:.2f}s on {dev.platform}:{dev.device_kind}")
    return 0 if v == 64.0 else 1


if __name__ == "__main__":
    sys.exit(main())
