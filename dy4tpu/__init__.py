"""dy4tpu — a TPU-native real-time software-defined FM broadcast receiver
framework.

Re-designed from scratch for TPU (JAX / XLA / Pallas / shard_map) with the
capabilities of the reference C++/Python implementation
(ghotrs4/3DY4-Real-Time-Software-defined-Radio-): RF front end, mono and
stereo audio paths, and the full RDS/RBDS digital data chain, scaled over
many IQ channels and device meshes.
"""

__version__ = "0.1.0"

from dy4tpu.config import MODES, ModeConfig, get_mode  # noqa: F401
