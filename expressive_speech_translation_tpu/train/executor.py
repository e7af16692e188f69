"""Training executor: the epoch/step loop gluing data, step fn, CV, checkpoints.

Behavioural parity with the CosyVoice executor the reference drives through
``torchrun … cosyvoice/bin/train.py`` (train_greek.sh:13, SURVEY.md §3.4):
"TRAIN Batch E/S loss … acc … grad_norm" lines every ``log_interval`` steps,
CV at each epoch end + every ``save_per_step`` steps, checkpoint per CV point,
deterministic resume from the latest checkpoint.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Iterable, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from ..models import cosyvoice as cv
from .checkpoint import CheckpointManager
from .data import DynamicFrameBatcher, filter_samples, pad_batch, shuffle_buffer, sort_buffer
from .sft import SFTBatch, TrainState, eval_step, init_train_state, make_optimizer, make_train_step

log = logging.getLogger(__name__)

LENGTH_BUCKETS = (32, 64, 128, 200, 256, 512)


def batches_from_samples(
    samples: Iterable[dict],
    cfg: TrainConfig,
    *,
    accum: int,
    seed: int,
    rows_multiple: int = 1,
) -> Iterator[SFTBatch]:
    """samples (dicts with text_tokens / speech_tokens) → padded SFTBatches with
    a leading accum dim, mirroring the yaml pipeline stages (shuffle → sort →
    dynamic batch → padding)."""
    stream = filter_samples(
        samples, max_frames=cfg.max_frames_in_batch, token_max_length=cfg.token_max_length,
    )
    stream = shuffle_buffer(stream, cfg.shuffle_buffer, seed=seed)
    stream = sort_buffer(stream, cfg.sort_buffer)
    batcher = DynamicFrameBatcher(cfg.max_frames_in_batch, pad_to_bucket=LENGTH_BUCKETS)

    # Microbatches inside one step must share shapes (they ride a lax.scan), so
    # accumulate per shape signature and emit once `accum` of one shape exist.
    by_shape: dict = {}
    emitted = 0
    for group in batcher(stream):
        if rows_multiple > 1 and len(group) % rows_multiple:
            # dp sharding needs batch rows divisible by the mesh size; repeat
            # samples cyclically to the next multiple (loss is mean-reduced,
            # so duplicates only reweight slightly)
            deficit = rows_multiple - len(group) % rows_multiple
            group = group + [group[i % len(group)] for i in range(deficit)]
        arrays = pad_batch(group, ("text_tokens", "speech_tokens"), buckets=LENGTH_BUCKETS)
        mb = SFTBatch(
            text_tokens=arrays["text_tokens"].astype(np.int32),
            text_mask=arrays["text_tokens_mask"],
            speech_tokens=arrays["speech_tokens"].astype(np.int32),
            speech_mask=arrays["speech_tokens_mask"],
        )
        sig = mb.text_tokens.shape + mb.speech_tokens.shape
        by_shape.setdefault(sig, []).append(mb)
        if len(by_shape[sig]) == accum:
            yield SFTBatch(*[np.stack(x) for x in zip(*by_shape.pop(sig))])
            emitted += 1
    # flush leftovers: CYCLE the real microbatches up to `accum` so small
    # datasets and epoch tails still train with evenly weighted gradients
    # (indexing by the growing length repeated micros[0] only, tripling its
    # gradient weight at every epoch tail)
    for sig, micros in by_shape.items():
        n_real = len(micros)
        while len(micros) < accum:
            micros.append(micros[len(micros) % n_real])
        yield SFTBatch(*[np.stack(x) for x in zip(*micros[:accum])])


class Executor:
    """Minimal, deterministic epoch loop."""

    def __init__(
        self,
        lm_cfg: cv.SpeechLMConfig,
        train_cfg: TrainConfig,
        *,
        mesh=None,
        checkpoint_dir: Optional[str] = None,
    ):
        self.lm_cfg = lm_cfg
        self.cfg = train_cfg
        self.optimizer = make_optimizer(
            train_cfg.learning_rate,
            grad_clip=train_cfg.grad_clip,
            scheduler=train_cfg.scheduler,
            warmup_steps=train_cfg.warmup_steps,
            total_steps=train_cfg.total_steps,
        )
        self.train_step = make_train_step(
            lm_cfg, self.optimizer, mesh, accum_grad=train_cfg.accum_grad
        )
        self.eval_fn = eval_step(lm_cfg)
        self.ckpt = CheckpointManager(
            checkpoint_dir or train_cfg.checkpoint_dir,
            keep=train_cfg.keep_checkpoints,
            save_interval_steps=train_cfg.save_per_step,
        ) if checkpoint_dir is not False else None

    def init_or_resume(self, key=None) -> TrainState:
        key = key if key is not None else jax.random.PRNGKey(self.cfg.seed)
        state = init_train_state(key, self.lm_cfg, self.optimizer)
        if self.ckpt is not None:
            restored = self.ckpt.restore(state)
            if restored is not None:
                return restored
        return state

    def cv(self, state: TrainState, cv_batches: Iterable[SFTBatch]) -> dict:
        totals, n = {}, 0
        for batch in cv_batches:
            flat = SFTBatch(*[x.reshape(-1, *x.shape[2:]) if x.ndim > 2 else x for x in batch])
            m = self.eval_fn(state.params, flat)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}

    def train(
        self,
        state: TrainState,
        epoch_batches: Callable[[int], Iterable[SFTBatch]],
        *,
        cv_batches: Callable[[], Iterable[SFTBatch]] = lambda: (),
        max_epochs: Optional[int] = None,
        metric_sink: Optional[Callable[[dict], None]] = None,
    ) -> TrainState:
        """``metric_sink``: optional per-log-interval structured-metrics hook
        (an ``obs.kvlogger`` output's ``writekvs``) — the TPU-native stand-in
        for the reference executor's TensorBoard writer (cosyvoice
        train_utils); receives train rows tagged ``phase="train"`` and CV
        rows tagged ``phase="cv"``."""
        max_epochs = max_epochs or self.cfg.max_epochs
        t_last = time.perf_counter()
        for epoch in range(max_epochs):
            for batch in epoch_batches(epoch):
                state, metrics = self.train_step(state, batch)
                step = int(state.step)
                if step % self.cfg.log_interval == 0:
                    rate = self.cfg.log_interval / max(time.perf_counter() - t_last, 1e-9)
                    t_last = time.perf_counter()
                    log.info(
                        "TRAIN Batch %d/%d loss %.6f acc %.6f grad_norm %.4f (%.2f it/s)",
                        epoch, step, float(metrics["loss"]), float(metrics["acc"]),
                        float(metrics["grad_norm"]), rate,
                    )
                    if metric_sink is not None:
                        metric_sink({
                            "phase": "train", "epoch": epoch, "step": step,
                            "loss": float(metrics["loss"]),
                            "acc": float(metrics["acc"]),
                            "grad_norm": float(metrics["grad_norm"]),
                            "it_per_s": round(rate, 3),
                        })
                if self.ckpt is not None and step % self.cfg.save_per_step == 0:
                    cvm = self.cv(state, cv_batches())
                    if cvm:
                        log.info(
                            "Epoch %d Step %d CV info loss %.6f acc %.6f",
                            epoch, step, cvm.get("loss", float("nan")), cvm.get("acc", float("nan")),
                        )
                        if metric_sink is not None:
                            metric_sink({"phase": "cv", "epoch": epoch,
                                         "step": step, **cvm})
                    self.ckpt.save(state, metrics=cvm)
            cvm = self.cv(state, cv_batches())
            if cvm:
                log.info(
                    "Epoch %d Step %d CV info loss %.6f acc %.6f",
                    epoch, int(state.step), cvm.get("loss", float("nan")), cvm.get("acc", float("nan")),
                )
                if metric_sink is not None:
                    metric_sink({"phase": "cv", "epoch": epoch,
                                 "step": int(state.step), **cvm})
            if self.ckpt is not None:
                self.ckpt.save(state, metrics=cvm, force=True)
        if self.ckpt is not None:
            self.ckpt.wait()
        return state
