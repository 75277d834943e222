"""Train state: params + batch stats + optimizer state, one pytree."""
from __future__ import annotations

from typing import Any

import jax
import flax
from flax import struct
import optax


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)


def create_train_state(model, tx, sample_batch, rng, cam_height=None):
    """Initialise variables from a sample batch and wrap them in TrainState."""
    import jax.numpy as jnp

    variables = model.init(rng, sample_batch, cam_height)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
