"""Optimizer assembly: Adam + Noam warmup + the reference's guard rails.

Reference training uses torch Adam (lr 1.0) scaled per *step* by NoamLR
(espnet2/schedulers/noam_lr.py:12):

    lr(step) = base_lr * model_size^-0.5 * min(step^-0.5, step * warmup^-1.5)

plus global-norm gradient clipping (trainer.py:630-657, grad_clip 1.0),
optional gradient noise (trainer.py:620-628), and a skip-step guard when
gradients are non-finite (trainer.py:640-657) — reproduced here with
``optax.apply_if_finite``.
"""

from __future__ import annotations

import dataclasses

import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    scheduler: str = "noamlr"  # "noamlr" | "warmuplr" | "constant"
    lr: float = 1.0
    model_size: int = 384
    warmup_steps: int = 4000
    grad_clip: float = 1.0
    accum_grad: int = 1
    adam_b1: float = 0.9
    adam_b2: float = 0.999  # torch.optim.Adam defaults (betas, eps)
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    # gradient noise (trainer.py:620-628 / add_gradient_noise): variance
    # eta / (1 + step)^gamma added to grads; 0 disables
    grad_noise_eta: float = 0.0
    grad_noise_gamma: float = 0.55
    # steps with non-finite grads to tolerate before erroring
    max_consecutive_nonfinite: int = 1000


def noam_schedule(model_size: int, warmup_steps: int, base_lr: float = 1.0):
    import jax.numpy as jnp

    factor = base_lr * model_size ** -0.5

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0  # NoamLR counts from 1
        return factor * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)

    return schedule


def warmup_lr_schedule(warmup_steps: int, base_lr: float):
    """espnet2 WarmupLR: lr * warmup^0.5 * min(step^-0.5, step*warmup^-1.5)
    — Noam without the model-size factor."""
    import jax.numpy as jnp

    factor = base_lr * warmup_steps ** 0.5

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0
        return factor * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)

    return schedule


def make_optimizer(config: OptimConfig = OptimConfig()) -> optax.GradientTransformation:
    if config.scheduler == "noamlr":
        sched = noam_schedule(config.model_size, config.warmup_steps,
                              config.lr)
    elif config.scheduler == "warmuplr":
        sched = warmup_lr_schedule(config.warmup_steps, config.lr)
    else:
        sched = lambda step: config.lr  # noqa: E731
    chain = []
    if config.grad_noise_eta > 0:
        chain.append(optax.add_noise(
            config.grad_noise_eta, config.grad_noise_gamma, key=0))
    chain.append(optax.clip_by_global_norm(config.grad_clip))
    if config.weight_decay > 0:
        chain.append(optax.add_decayed_weights(config.weight_decay))
    chain += [
        optax.scale_by_adam(
            b1=config.adam_b1, b2=config.adam_b2, eps=config.adam_eps
        ),
        optax.scale_by_schedule(lambda step: -sched(step)),
    ]
    tx = optax.chain(*chain)
    if config.accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.accum_grad)
    return optax.apply_if_finite(tx, config.max_consecutive_nonfinite)
