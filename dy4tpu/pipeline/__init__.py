"""Receiver pipeline: the whole per-block signal-flow graph as one pure
jittable function with an explicit carried-state pytree."""

from dy4tpu.pipeline.receiver import (  # noqa: F401
    ReceiverParams, ReceiverState, StepOutputs,
    init_state, make_params, receiver_step, receiver_step_if,
    receiver_step_jit, run_blocks)
