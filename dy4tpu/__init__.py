"""dy4tpu — a TPU-native real-time software-defined FM broadcast receiver
framework.

Re-designed from scratch for TPU (JAX / XLA / Pallas / shard_map) with the
capabilities of the reference C++/Python implementation
(ghotrs4/3DY4-Real-Time-Software-defined-Radio-): RF front end, mono and
stereo audio paths, and the full RDS/RBDS digital data chain, scaled over
many IQ channels and device meshes.
"""

__version__ = "0.2.0"

from dy4tpu.config import MODES, ModeConfig, get_mode  # noqa: F401


def __getattr__(name):
    # lazy subpackage access (keeps `import dy4tpu` jax-free for the CLI's
    # platform pinning); e.g. dy4tpu.receiver, dy4tpu.ShardedReceiver
    if name == "receiver":
        from dy4tpu.pipeline import receiver
        return receiver
    if name == "ShardedReceiver":
        from dy4tpu.parallel import ShardedReceiver
        return ShardedReceiver
    if name == "make_mesh":
        from dy4tpu.parallel import make_mesh
        return make_mesh
    raise AttributeError(f"module 'dy4tpu' has no attribute {name!r}")
