"""Fine-tuning step for Whisper (teacher-forced cross-entropy).

The reference is inference-only; training support is part of making this a
complete framework: the same model/partition machinery serves a pjit-sharded
train step (dp over batch on "data", tp over heads/MLP on "model"). Used by
the multi-chip dry run and available for ASR fine-tuning.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from .models.whisper import Whisper


def cross_entropy_loss(logits, targets, mask):
    """Mean token NLL over positions where mask=1."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(model: Whisper, optimizer: optax.GradientTransformation):
    """Returns train_step(params, opt_state, mel, tokens, loss_mask)."""

    def loss_fn(params, mel, tokens, mask):
        # Teacher forcing: predict tokens[:, 1:] from tokens[:, :-1].
        logits = model.apply({"params": params}, mel, tokens[:, :-1])
        return cross_entropy_loss(logits, tokens[:, 1:], mask[:, 1:])

    def train_step(params, opt_state, mel, tokens, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, mel, tokens, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)
