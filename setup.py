from setuptools import find_packages, setup

setup(
    name="puppax",
    version="0.1.0",
    description=(
        "TPU-native quadruped locomotion RL framework: pure-JAX MuJoCo-"
        "semantics physics, batched Pupper v3 joystick env, mesh-sharded PPO"
    ),
    packages=find_packages(include=["puppax", "puppax.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "mujoco",
        "numpy",
        "ml_collections",
    ],
    extras_require={
        "train": ["orbax-checkpoint"],
        "dev": ["pytest"],
    },
)
