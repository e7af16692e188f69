"""CosyVoice speech-LM SFT: pjit data-parallel training step.

Reproduces the reference's Greek SFT semantics (train_greek.sh:13-28,
greek_sft.yaml:94-103): AdamW lr 1e-5 constant, grad accumulation 4, global
clip 5, mixed precision, per-step loss/accuracy metrics, save every 1000 steps
— re-designed TPU-first:

- torch DDP (gloo) → pjit over a (dp, tp) Mesh; the gradient all-reduce is the
  XLA collective inserted by sharding propagation, not an explicit call.
- AMP + GradScaler → bf16 activations with f32 params/optimizer state; no loss
  scaling needed on TPU.
- ``accum_grad`` microbatches ride a ``lax.scan`` INSIDE one compiled step, so
  one dispatch does the whole effective batch.

The trained objective is the speech-token LM (``--model llm``): next-token
cross-entropy over ``[sos] text [task] speech…eos`` with loss masked to the
speech segment, plus token accuracy (the metrics the reference logs as "TRAIN
Batch … loss … acc", training_log.txt).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import cosyvoice as cv
from ..models import qwen2 as q2
from ..parallel.mesh import DP_AXIS
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class SFTBatch(NamedTuple):
    """One (micro)batch. Leading dim may be [accum, batch, ...] for scans."""

    text_tokens: jnp.ndarray     # [B, Tt] int32
    text_mask: jnp.ndarray       # [B, Tt] bool
    speech_tokens: jnp.ndarray   # [B, Ts] int32
    speech_mask: jnp.ndarray     # [B, Ts] bool


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def lm_loss(
    params: Any, cfg: cv.SpeechLMConfig, batch: SFTBatch,
    *, compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Teacher-forced next-token CE over the speech segment (+ EOS)."""
    b, ts = batch.speech_tokens.shape
    seq_len = 2 + batch.text_tokens.shape[1] + ts
    if seq_len > cfg.backbone.max_positions:
        # q2.forward slices the RoPE table to seq_len — past the table it
        # would fail with an opaque broadcast error mid-epoch; refuse with
        # the actual culprit instead (bucketed lengths can double past the
        # top bucket, see data.bucket_length)
        raise ValueError(
            f"batch sequence length {seq_len} (2 + text {batch.text_tokens.shape[1]}"
            f" + speech {ts}) exceeds backbone max_positions "
            f"{cfg.backbone.max_positions}")
    p = params
    if compute_dtype != jnp.float32:
        from ..models.common import cast_floats

        p = cast_floats(params, compute_dtype)

    # Input sequence: [sos] text [task] speech; targets shifted onto speech+eos.
    emb, mask = cv.build_prompt_embeddings(
        p, cfg, batch.text_tokens, batch.text_mask,
        batch.speech_tokens, batch.speech_mask,
    )
    hidden = q2.forward(
        p["backbone"], cfg.backbone, emb,
        attn_mask=(
            jnp.asarray(np.tril(np.ones((emb.shape[1],) * 2, bool))[None, None])
            & mask[:, None, None, :]
        ),
    )
    logits = hidden @ p["head"]["kernel"] + p["head"]["bias"]  # [B, L, V]

    # build_prompt_embeddings COMPACTS valid entries to a contiguous prefix,
    # so each row reads [sos, text(n_t), task, speech…] with the speech block
    # starting at 2 + n_t — a per-row offset when texts underfill the bucket,
    # NOT the static 2 + Tt. Gather the prediction positions per row: speech
    # token i is predicted from position 1 + n_t + i (the task slot for
    # i = 0), and EOS from the last speech slot.
    n_t = jnp.sum(batch.text_mask.astype(jnp.int32), axis=1)        # [B]
    pred_pos = (1 + n_t)[:, None] + jnp.arange(ts + 1)[None, :]     # [B, Ts+1]
    speech_logits = jnp.take_along_axis(
        logits, pred_pos[..., None], axis=1)                        # [B, Ts+1, V]
    lengths = jnp.sum(batch.speech_mask.astype(jnp.int32), axis=1)
    eos_col = jnp.full((b, 1), cfg.eos_speech, jnp.int32)
    targets = jnp.concatenate([batch.speech_tokens, eos_col], axis=1)
    # place EOS right after the last real token
    idx = jnp.arange(ts + 1)[None, :]
    tgt_mask = idx <= lengths[:, None]
    targets = jnp.where(idx == lengths[:, None], cfg.eos_speech, targets)

    logp = jax.nn.log_softmax(speech_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(tgt_mask), 1)
    loss = jnp.sum(nll * tgt_mask) / denom
    acc = jnp.sum((jnp.argmax(speech_logits, -1) == targets) & tgt_mask) / denom
    metrics = {"loss": loss, "acc": acc}

    # Multi-token-prediction heads (cfg.mtp > 1): head j predicts token
    # t+2+j from the hidden state at t, trained jointly with the main head so
    # generate_speech_tokens_mtp can emit K tokens per backbone pass.
    if "mtp_heads" in p:
        speech_hidden = jnp.take_along_axis(
            hidden, pred_pos[..., None], axis=1)              # [B, Ts+1, H]
        mtp_total = jnp.float32(0.0)
        for j, head in enumerate(p["mtp_heads"]):
            shift = j + 1
            h_j = speech_hidden[:, : ts + 1 - shift, :]
            logits_j = h_j @ head["kernel"] + head["bias"]
            t_j = targets[:, shift:]
            m_j = tgt_mask[:, shift:]
            logp_j = jax.nn.log_softmax(logits_j.astype(jnp.float32), axis=-1)
            nll_j = -jnp.take_along_axis(logp_j, t_j[..., None], axis=-1)[..., 0]
            mtp_total = mtp_total + jnp.sum(nll_j * m_j) / jnp.maximum(jnp.sum(m_j), 1)
        mtp_loss = mtp_total / len(p["mtp_heads"])
        metrics["mtp_loss"] = mtp_loss
        loss = loss + mtp_loss
        metrics["loss"] = loss
    return loss, metrics


def make_optimizer(
    learning_rate: float = 1e-5,
    *,
    grad_clip: float = 5.0,
    scheduler: str = "constant",
    warmup_steps: int = 0,
    total_steps: int = 0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW + global-norm clip (greek_sft.yaml:94-103 'constantlr', clip 5)."""
    if scheduler == "constant":
        lr = optax.constant_schedule(learning_rate)
    elif scheduler == "warmup_cosine":
        if total_steps <= warmup_steps:
            # decay_steps = warmup+1 silently collapses LR to ~0 right after
            # warmup — a config that "trains" while making no progress
            raise ValueError(
                "scheduler='warmup_cosine' requires total_steps > "
                f"warmup_steps (got total_steps={total_steps}, "
                f"warmup_steps={warmup_steps}); set train.total_steps")
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps
        )
    elif scheduler == "warmuplr":
        # ESPnet-style warmup: lr * min(step^-0.5, step * warmup^-1.5) scaled
        def warmup(step):
            s = jnp.maximum(step.astype(jnp.float32), 1.0)
            w = float(max(warmup_steps, 1))
            return learning_rate * jnp.minimum(s ** -0.5, s * w ** -1.5) * w ** 0.5
        lr = warmup
    else:
        raise ValueError(f"unknown scheduler {scheduler!r}")
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )


def init_train_state(key, cfg: cv.SpeechLMConfig, optimizer) -> TrainState:
    params = cv.init_speech_lm(key, cfg)
    return TrainState(jnp.zeros((), jnp.int32), params, optimizer.init(params))


def make_train_step(
    cfg: cv.SpeechLMConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    accum_grad: int = 4,
    compute_dtype=jnp.bfloat16,
):
    """Build the jitted train step.

    The batch carries a leading accum dim: leaves are [accum, B, ...]; the step
    scans over microbatches accumulating grads, then applies one update. Under
    a mesh, params/opt state are replicated and batches are dp-sharded on the
    (micro)batch dim; XLA inserts the gradient psum.
    """
    step_fn = build_step_fn(cfg, optimizer, accum_grad=accum_grad, compute_dtype=compute_dtype)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, DP_AXIS))  # [accum, B, ...] → shard B
    return jax.jit(
        step_fn,
        in_shardings=(repl, SFTBatch(data, data, data, data)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def build_step_fn(
    cfg: cv.SpeechLMConfig,
    optimizer: optax.GradientTransformation,
    *,
    accum_grad: int = 4,
    compute_dtype=jnp.bfloat16,
):
    """The raw (unjitted) train step — for callers that jit with their own
    shardings (e.g. __graft_entry__.dryrun_multichip)."""

    has_mtp = cfg.mtp > 1   # static: decides the scan carry structure

    def step_fn(state: TrainState, batch: SFTBatch):
        def micro(carry, mb):
            grads_acc, loss_acc, acc_acc, mtp_acc = carry
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: lm_loss(p, cfg, mb, compute_dtype=compute_dtype),
                has_aux=True,
            )(state.params)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            mtp_acc = mtp_acc + (metrics["mtp_loss"] if has_mtp else 0.0)
            return (grads_acc, loss_acc + loss, acc_acc + metrics["acc"],
                    mtp_acc), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, loss_sum, acc_sum, mtp_sum), _ = jax.lax.scan(
            micro, (zero_grads, 0.0, 0.0, 0.0), batch
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum_grad, grads)
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        metrics = {
            "loss": loss_sum / accum_grad,
            "acc": acc_sum / accum_grad,
            "grad_norm": gnorm,
        }
        if has_mtp:
            metrics["mtp_loss"] = mtp_sum / accum_grad
        return new_state, metrics

    return step_fn


def eval_step(cfg: cv.SpeechLMConfig, *, compute_dtype=jnp.bfloat16):
    """CV metrics (the reference's ``CV info`` lines)."""

    @jax.jit
    def fn(params, batch: SFTBatch):
        _, metrics = lm_loss(params, cfg, batch, compute_dtype=compute_dtype)
        return metrics

    return fn
