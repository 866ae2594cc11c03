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


class CriticNet(nn.Module):
    """Q(ob, action) critic for the DDPG path. Conv encoder over the
    observation, fused with the flat action vector after global pooling
    (tfpnp's MDDPG critic is the same shape at larger scale)."""

    features: int = 64

    @nn.compact
    def __call__(self, ob, action_vec):
        x = nn.Conv(self.features, (3, 3), strides=(2, 2))(ob)
        x = nn.relu(x)
        for _ in range(2):
            r = nn.Conv(self.features, (3, 3))(x)
            r = nn.relu(r)
            r = nn.Conv(self.features, (3, 3))(r)
            x = nn.relu(x + r)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))
        h = jnp.concatenate([x, action_vec], axis=1)
        h = nn.relu(nn.Dense(128)(h))
        h = nn.relu(nn.Dense(128)(h))
        return nn.Dense(1)(h)[:, 0]


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
        placeholder values (observations, masks, ...).

        The episode runs as ONE jitted program with encoded-complex
        boundaries (eager complex state ops and complex host<->device
        transfers are UNIMPLEMENTED on the axon TPU backend); a complex
        solution is recombined on the HOST from its fetched {re, im}
        planes."""
        from ..base import _COMPLEX_TAG, encode_complex, decode_complex

        x0 = to_jax_array(x0, batch=True).astype(jnp.float32)
        if not hasattr(self, "_solve_jit"):
            def run(pp, x0_, sp_enc, aux):
                out = self._episode(pp, x0_,
                                    solve_params=decode_complex(sp_enc),
                                    aux_state=aux)
                return encode_complex(out)

            self._solve_jit = jax.jit(run)
        out = self._solve_jit(
            params if params is not None else self.policy_params, x0,
            encode_complex(dict(solve_params or {})), aux_state)
        out = jax.device_get(out)
        if isinstance(out, dict) and (_COMPLEX_TAG + "re") in out:
            return (np.asarray(out[_COMPLEX_TAG + "re"])
                    + 1j * np.asarray(out[_COMPLEX_TAG + "im"]))
        return out

    # ---------------------------------------------------------------- #

    def train(self, dataset, valid_datasets=None, placeholders=None, epochs: int = 1,
              lr: float = 3e-4, log_every: int = 10, loop_penalty: float = 0.05,
              savedir: Optional[str] = None, loss_kind: str = "mse",
              eval_fn=None, eval_every: int = 0):
        """Direct-backprop policy optimization over solve episodes.

        ``dataset`` yields dicts with 'x0', 'gt' (+ any placeholder
        values). Returns trained policy params.

        ``loss_kind``: 'mse' (reference-style) or 'logmse'. Plain MSE
        under-weights easy (noiseless / mild-degradation) problems —
        their squared error is orders of magnitude smaller, so the
        policy converges to schedules tuned for the hard cells and
        loses several dB to aggressive hand schedules exactly where
        reconstruction is easiest (measured on deconv: -9 dB on the
        easiest held-out cells). log-MSE equalizes the per-problem
        weighting (it optimizes mean PSNR up to a constant).

        ``eval_fn``/``eval_every``: optional held-out best-iterate
        selection — every ``eval_every`` steps ``eval_fn(params)`` is
        scored (higher is better) and the best-scoring params are
        returned instead of the last ones. Training length for
        bi-level/unrolled objectives is NOT monotone in quality
        (weights/README findings 18 and 20c), so selection must be on
        a validation objective, never the final step or a train EMA.
        """
        tx = optax.adam(lr)
        params = self.policy_params
        opt_state = tx.init(params)

        def loss_fn(policy_params, batch):
            x0 = batch["x0"]
            gt = batch["gt"]
            # '__aux__': observation-only side channel (e.g. a noise-
            # level map) consumed by custom_policy_ob_pack_fn — the
            # reference's CSMRI env packs sigma_n into the policy obs
            # the same way (contrib/csmri.py:174-227 there)
            aux = batch.get("__aux__")
            solve_params = {k: v for k, v in batch.items()
                            if k not in ("x0", "gt", "__aux__")}
            out = self._episode(policy_params, x0, solve_params,
                                aux_state=aux)
            mse = jnp.mean((jnp.real(out) - gt) ** 2)
            if loss_kind == "logmse":
                return jnp.log(mse + 1e-10)
            return mse

        @jax.jit
        def update(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        step = 0
        best = None  # (score, host params) under eval_fn selection
        for epoch in range(epochs):
            for batch in dataset:
                params, opt_state, loss = update(params, opt_state, batch)
                step += 1
                if log_every and step % log_every == 0:
                    print(f"[autotune] epoch {epoch} step {step} loss {float(loss):.5f}")
                if eval_fn is not None and eval_every and \
                        step % eval_every == 0:
                    score = float(eval_fn(params))
                    if best is None or score > best[0]:
                        best = (score, jax.device_get(params))
                    print(f"[autotune] step {step} heldout {score:+.3f} "
                          f"best {best[0]:+.3f}", flush=True)
        if eval_fn is not None and eval_every:
            score = float(eval_fn(params))
            if best is None or score > best[0]:
                best = (score, jax.device_get(params))
            params = best[1]
            print(f"[autotune] selected heldout {best[0]:+.3f}", flush=True)
        self.policy_params = params
        if savedir:
            from .training import save_checkpoint

            save_checkpoint(f"{savedir}/policy.ckpt", params, opt_state, epochs, step, 0.0)
        return params

    # ------------------------------------------------------------------ #
    # Model-free DDPG path (reference: tfpnp MDDPGTrainer wiring at
    # rl/solver.py:349-395). Useful when the episode is not end-to-end
    # differentiable (e.g. non-smooth rewards or black-box proxes).
    # ------------------------------------------------------------------ #

    def _flat_action(self, action):
        B = action["rho"].shape[0]
        stop = jnp.reshape(action["idx_stop"], (B, 1))
        return jnp.concatenate([action["rho"].reshape(B, -1),
                                action["sigmas"].reshape(B, -1), stop], axis=1)

    def _action_from_flat(self, vec):
        pack = self.action_pack
        npsi = self.policy.num_psi
        rho = jnp.clip(vec[:, :pack], 1e-6, None)
        sig = jnp.clip(vec[:, pack:pack + npsi * pack], 1e-8, None)
        return {"rho": rho, "sigmas": sig.reshape(-1, npsi, pack),
                "idx_stop": jnp.clip(vec[:, -1], 0.0, 1.0)}

    def train_ddpg(self, dataset, epochs: int = 1, actor_lr: float = 1e-4,
                   critic_lr: float = 3e-4, gamma: float = 0.99,
                   tau: float = 0.005, noise_scale: float = 0.05,
                   batch_size: int = 16, buffer_size: int = 2048,
                   warmup: int = 8, updates_per_step: int = 1,
                   loop_penalty: float = 0.05, reward_clip: float = 10.0,
                   grad_clip: float = 1.0, log_every: int = 0,
                   seed: int = 0):
        """Off-policy DDPG: replay buffer + target networks + Polyak
        averaging. Reward per macro-step is the PSNR gain of the solver
        state minus ``loop_penalty`` (tfpnp's reward shaping). Returns the
        trained policy params (also stored on ``self.policy_params``)."""
        rng = np.random.RandomState(seed)
        from ..base import decode_complex, encode_complex

        critic = CriticNet()

        def psnr(x, gt):
            mse = jnp.mean((jnp.real(x) - gt) ** 2, axis=(1, 2, 3))
            return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

        # Every eager touch of the (possibly complex) solver state is
        # UNIMPLEMENTED on the axon TPU backend — the whole episode
        # machinery runs as two jitted functions with encoded-complex
        # boundaries (cf. DEQSolver.solve).
        @jax.jit
        def _episode_init(x0, sp_enc, gt):
            sp = decode_complex(sp_enc)
            state = self.solver.initialize(x0, sp)
            return (encode_complex(tuple(state)), self._policy_ob(state, 0, x0),
                    psnr(state[0], gt))

        def _macro_fn(ap, state_enc, x0, sp_enc, gt, i, noise):
            sp = decode_complex(sp_enc)
            state = decode_complex(state_enc)
            ob = self._policy_ob(state, i, x0)
            a = self._flat_action(self.policy.apply(ap, ob)) + noise
            action = self._action_from_flat(a)
            lams = [action["sigmas"][:, j]
                    for j in range(len(self.solver.psi_fns))]
            state = self.solver.iters(tuple(state), action["rho"], lams,
                                      self.action_pack, params=sp, x_ref=x0)
            return (encode_complex(tuple(state)), a, psnr(state[0], gt),
                    self._policy_ob(state, i + 1, x0))

        _macro = jax.jit(_macro_fn, static_argnums=(5,))

        # materialize (single-pass iterators would lose the probe sample
        # and be exhausted after the first epoch)
        dataset = list(dataset)

        def _prep(sample):
            x0 = to_jax_array(sample["x0"], batch=True).astype(jnp.float32)
            gt = to_jax_array(sample["gt"], batch=True).astype(jnp.float32)
            gt = jnp.reshape(gt, x0.shape)
            sp_enc = encode_complex({k: v for k, v in sample.items()
                                     if k not in ("x0", "gt")})
            return x0, gt, sp_enc

        # Probe one sample to shape the networks.
        x0, gt0, sp_enc0 = _prep(dataset[0])
        _, ob0, _ = _episode_init(x0, sp_enc0, gt0)
        a0 = self._flat_action(self.policy.apply(self.policy_params, ob0))

        actor_params = self.policy_params
        critic_params = critic.init(jax.random.key(seed), ob0, a0)
        actor_target, critic_target = actor_params, critic_params
        # grad clipping: at task scale (CSMRI, 128^2) unclipped critic
        # losses diverged to 1e13 within ~200 updates — PSNR-gain rewards
        # can spike (phantom cells reach near-exact recon) and the
        # Q-bootstrap amplifies them; clip both the reward magnitude and
        # the update norms (tfpnp likewise scales its rewards)
        def _tx(lr):
            return optax.chain(optax.clip_by_global_norm(grad_clip),
                               optax.adam(lr))

        actor_tx, critic_tx = _tx(actor_lr), _tx(critic_lr)
        actor_opt = actor_tx.init(actor_params)
        critic_opt = critic_tx.init(critic_params)

        @jax.jit
        def critic_update(cp, c_opt, at, ct, ob, act, rew, nob, done):
            na = self._flat_action(self.policy.apply(at, nob))
            q_next = critic.apply(ct, nob, na)
            y = rew + gamma * (1.0 - done) * q_next
            # TD-target clamp: with clipped per-step rewards |r| <=
            # reward_clip and an H-step horizon, any |y| far outside
            # H * reward_clip is bootstrap divergence, not signal
            # (task-scale runs drifted to |Q| ~ 1e4 without this)
            ymax = reward_clip * self.max_episode_step
            y = jnp.clip(y, -ymax, ymax)

            def loss_fn(p):
                q = critic.apply(p, ob, act)
                return jnp.mean((q - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(cp)
            upd, c_opt = critic_tx.update(grads, c_opt)
            return optax.apply_updates(cp, upd), c_opt, loss

        @jax.jit
        def actor_update(ap, a_opt, cp, ob):
            def loss_fn(p):
                a = self._flat_action(self.policy.apply(p, ob))
                return -jnp.mean(critic.apply(cp, ob, a))

            loss, grads = jax.value_and_grad(loss_fn)(ap)
            upd, a_opt = actor_tx.update(grads, a_opt)
            return optax.apply_updates(ap, upd), a_opt, loss

        @jax.jit
        def polyak(target, online):
            return jax.tree.map(lambda t, p: (1 - tau) * t + tau * p,
                                target, online)

        buf = {"ob": [], "act": [], "rew": [], "nob": [], "done": []}

        def buf_push(ob, act, rew, nob, done):
            for k, v in zip(buf, (ob, act, rew, nob, done)):
                buf[k].extend(np.asarray(v))
                if len(buf[k]) > buffer_size:
                    buf[k] = buf[k][-buffer_size:]

        step = 0
        for epoch in range(epochs):
            for sample in dataset:
                x0, gt, sp_enc = _prep(sample)
                state_enc, ob, last_psnr = _episode_init(x0, sp_enc, gt)
                last_psnr = np.asarray(last_psnr)
                for i in range(self.max_episode_step):
                    noise = jnp.asarray(
                        noise_scale * rng.randn(*a0.shape), jnp.float32)
                    state_enc, a, new_psnr, nob = _macro(
                        actor_params, state_enc, x0, sp_enc, gt, i, noise)
                    new_psnr = np.asarray(new_psnr)
                    rew = np.clip(new_psnr - last_psnr - loop_penalty,
                                  -reward_clip, reward_clip)
                    last_psnr = new_psnr
                    # the episode ends by TRUNCATION (time limit); pure
                    # bootstrap-through (done=0 everywhere) is unbiased
                    # in theory but unstable with function approximation
                    # — at task scale the unterminated value chain drove
                    # |Q| to 1e4. Treat the horizon as terminal: returns
                    # are bounded by the H-step reward sum, matching the
                    # finite-horizon objective the policy actually faces.
                    last = float(i == self.max_episode_step - 1)
                    done = np.full((ob.shape[0],), last, np.float32)
                    buf_push(ob, a, rew, nob, done)
                    ob = nob
                    step += 1

                    if len(buf["ob"]) >= max(warmup, batch_size):
                        for _ in range(updates_per_step):
                            idx = rng.randint(0, len(buf["ob"]), batch_size)
                            batch = {k: jnp.asarray(
                                np.stack([buf[k][j] for j in idx]))
                                for k in buf}
                            critic_params, critic_opt, c_loss = critic_update(
                                critic_params, critic_opt, actor_target,
                                critic_target, batch["ob"], batch["act"],
                                batch["rew"], batch["nob"], batch["done"])
                            actor_params, actor_opt, a_loss = actor_update(
                                actor_params, actor_opt, critic_params,
                                batch["ob"])
                            actor_target = polyak(actor_target, actor_params)
                            critic_target = polyak(critic_target, critic_params)
                            if log_every and step % log_every == 0:
                                print(f"[ddpg] step {step} critic "
                                      f"{float(c_loss):.4f} actor "
                                      f"{float(a_loss):.4f}")
        self.policy_params = actor_params
        return actor_params

    def load(self, path: str):
        import pickle

        from flax import serialization

        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.policy_params = serialization.from_bytes(self.policy_params,
                                                      blob["params"])
