"""`python -m mvsnet_tpu` — list the framework's entry points."""

COMMANDS = {
    "mvsnet_tpu.train": "train MVSNet / R-MVSNet on session datasets",
    "mvsnet_tpu.test": "benchmark a model against GT depths (results CSV)",
    "mvsnet_tpu.infer": "compute depth + probability maps for sessions",
    "mvsnet_tpu.fusion": "fuse depth maps to a point cloud (native, no CUDA)",
    "mvsnet_tpu.visualize": "view pfm/dmb/npy/png depth maps",
    "scripts.test_and_fuse": "inference -> fusion -> PLY collection pipeline",
}

if __name__ == "__main__":
    print("mvsnet_tpu — TPU-native multi-view stereo\n")
    for mod, desc in COMMANDS.items():
        print(f"  python -m {mod:<24} {desc}")
    print("\nSee README.md and PARITY.md for details.")
