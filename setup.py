"""Package setup (reference analog: setup.py)."""

from setuptools import find_packages, setup

setup(
    name="mvsnet_tpu",
    version="0.1.0",
    description="TPU-native multi-view stereo framework (MVSNet / R-MVSNet)",
    packages=find_packages(include=["mvsnet_tpu", "mvsnet_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "imageio",
        "opencv-python",
    ],
    extras_require={
        "tools": ["boto3", "requests", "matplotlib"],
        "test": ["pytest"],
    },
)
