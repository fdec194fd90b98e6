"""Scale-out: device meshes, sharded receiver, halo collectives.

The reference scales with two host threads and a mutex queue
(src/threadSafeQ.cpp, src/project.cpp:289-305).  Here scaling is a
``jax.sharding.Mesh`` with two axes:

* ``ch``  — data parallelism over independent IQ channels (stations /
  antenna streams); embarrassingly parallel.
* ``time`` — sequence parallelism over the sample stream: consecutive
  stream chunks are processed concurrently, made consistent by a halo
  exchange (``ppermute``) of trailing raw-IQ samples plus an overlap
  warm-up region (see ``sharded.ShardedReceiver``).
"""

from dy4tpu.parallel.mesh import make_mesh  # noqa: F401
from dy4tpu.parallel.sharded import (  # noqa: F401
    ExactCarry, ShardedCarry, ShardedOutputs, ShardedReceiver)
