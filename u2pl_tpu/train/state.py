"""Train state pytree: student, EMA teacher, optimizer, memory bank.

Replaces the reference's scattered mutable state (two DDP-wrapped modules,
a torch optimizer, CPU list-of-tensor memobank, a global `prototype`
tensor — train_semi.py:81-179) with one replicated pytree threaded through
the compiled step.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp

from u2pl_tpu.memobank import MemoryBank


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # scalar int32, global iteration (i_iter)
    params: Any
    batch_stats: Any
    opt_state: Any
    teacher_params: Any = None
    teacher_batch_stats: Any = None
    bank: Optional[MemoryBank] = None
    prototype: Optional[jax.Array] = None


def create_train_state(
    model,
    tx,
    rng: jax.Array,
    input_shape,
    with_teacher: bool,
    bank: Optional[MemoryBank] = None,
    prototype: Optional[jax.Array] = None,
) -> TrainState:
    dummy = jnp.zeros(input_shape, jnp.float32)
    variables = model.init(rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    teacher_params = jax.tree_util.tree_map(jnp.copy, params) if with_teacher else None
    teacher_bs = (
        jax.tree_util.tree_map(jnp.copy, batch_stats) if with_teacher else None
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        teacher_params=teacher_params,
        teacher_batch_stats=teacher_bs,
        bank=bank,
        prototype=prototype,
    )


# jitted so it also works on multi-process replicated global arrays (eager
# jnp.copy cannot touch arrays whose devices span other processes); on a
# single process this is the same aliasing device copy as before
_copy_params = jax.jit(lambda p: jax.tree_util.tree_map(jnp.copy, p))


def copy_student_to_teacher(state: TrainState) -> TrainState:
    """One-time parameter copy at the first semi epoch
    (reference train_semi.py:309-315; parameters only, BN buffers keep the
    running stats the teacher accumulated during warmup dummy forwards)."""
    return state.replace(teacher_params=_copy_params(state.params))
