"""mvsnet_tpu — a TPU-native multi-view-stereo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
ubiquity6/MVSNet reference (TF1 / CUDA): plane-sweep MVS depth inference
(MVSNet 3D-CNN and R-MVSNet ConvGRU variants), production data plane,
training/benchmark/inference drivers and distributed depth fusion — all
engineered for TPU hardware: static shapes, `lax.scan` depth streaming,
bf16 MXU convolutions, SPMD sharding over a named device mesh, and Pallas
kernels for the hot plane-sweep/variance path.

Package map (reference parity noted per module):
  ops/       geometry, homography warping, cost volumes, soft-argmin
  models/    feature towers, 3D regularizer, ConvGRU, refinement nets
  data/      cluster/session data plane (mvs_data_generation equivalent)
  io/        PFM / cam.txt / camera.json / dmb / PLY IO
  parallel/  mesh + sharding helpers, distributed train/infer steps
  losses.py  regression & classification losses + metrics
  train.py / test.py / infer.py / fusion.py   drivers
"""

__version__ = "0.1.0"


def _honor_platform_env() -> None:
    """Honor MVSNET_TPU_PLATFORM as a platform override with top priority.

    Some environments pin `jax_platforms` via jax.config at interpreter
    start (sitecustomize) AND export JAX_PLATFORMS globally, so the
    standard JAX env vars cannot redirect a subprocess to CPU — with an
    unreachable remote TPU such a subprocess (fusion CLI, driver tests)
    hangs at backend init. MVSNET_TPU_PLATFORM is this package's own
    knob: applied at import time, before any backend initialization a
    CLI would trigger, and never set by the environment itself.
    """
    import os  # noqa: PLC0415

    plat = os.environ.get("MVSNET_TPU_PLATFORM")
    if not plat:
        return
    try:
        import jax  # noqa: PLC0415

        if jax.config.jax_platforms != plat:
            jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover - jax absent or already initialized
        pass


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (default on; MVSNET_TPU_COMPILE_CACHE
    sets the directory, =0 disables).

    Every first compile on the remote-TPU backend pays a 30-150 s
    remote-compile round trip; the Pallas-heavy graphs here recompile
    identically across processes and sessions (benchmarks, drivers, the
    round-end bench), so a disk cache pays for itself immediately. Only
    compilations over 5 s are cached (toy CPU-test jits stay out).
    """
    import os  # noqa: PLC0415

    val = os.environ.get("MVSNET_TPU_COMPILE_CACHE", "")
    if val == "0":
        return
    cache_dir = val or os.path.expanduser("~/.cache/mvsnet_tpu/jax_cache")
    try:
        import jax  # noqa: PLC0415

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - unsupported jax/plugin combo
        pass


_honor_platform_env()
_enable_compile_cache()
