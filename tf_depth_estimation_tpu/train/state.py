"""Train state: params + batch-norm running stats + optimizer state.

Replaces the reference's TF1 graph variables + ``slim.create_train_op`` (which wires
batch-norm update ops into the train op, e.g. ``train_depth_only.py:345-349``): here the
state is an explicit pytree, the batch-stats update is returned by the model apply, and
Adam comes from optax (``tf.train.AdamOptimizer(lr, beta1)`` parity: b1 from config,
b2=0.999, eps=1e-8).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
        )


def adam(learning_rate, beta1: float = 0.9) -> optax.GradientTransformation:
    """TF1 AdamOptimizer parity (epsilon 1e-8, beta2 0.999)."""
    return optax.adam(learning_rate, b1=beta1, b2=0.999, eps=1e-8)


def create_train_state(
    model,
    example_input,
    tx: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 2e-4,
    beta1: float = 0.9,
    rng: Optional[jax.Array] = None,
) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    inputs = example_input if isinstance(example_input, tuple) else (example_input,)
    # jitted: an unjitted init dispatches the whole traced forward op-by-op — on the
    # axon TPU tunnel that is one remote compile per op on a cold cache (minutes)
    variables = jax.jit(lambda r: model.init(r, *inputs, train=True))(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = tx or adam(learning_rate, beta1)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
