"""SFT training entry point (train_greek.sh equivalent).

The reference launches ``torchrun --nproc_per_node=$N cosyvoice/bin/train.py
--train_engine torch_ddp --model llm …`` (train_greek.sh:13-28). Here one JAX
process owns all local devices (pjit data parallelism replaces DDP), so the
launcher is just::

    python -m expressive_speech_translation_tpu.train.run \
        --config greek_sft.yaml --data-dir DATA --checkpoint-dir CKPTS

The YAML accepts the unified config schema (core/config.py ``train:`` section);
warm-start, resume, and TensorBoard-style metric logs come from the executor.
Data: Kaldi-style dirs from train/prepare_mcv.py, tokenized on the fly.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

log = logging.getLogger(__name__)


def load_kaldi_dir(data_dir: str | Path) -> List[dict]:
    """wav.scp + text → sample dicts (tokenized text; speech tokens must be
    produced by the speech tokenizer — absent weights, a deterministic proxy
    hash keeps the pipeline runnable end-to-end)."""
    from ..pipeline.tokenizer import ByteTokenizer

    data = Path(data_dir)
    texts = {}
    for line in (data / "text").read_text(encoding="utf-8").splitlines():
        utt, _, sentence = line.partition(" ")
        texts[utt] = sentence
    tok = ByteTokenizer()
    samples = []
    for line in (data / "wav.scp").read_text(encoding="utf-8").splitlines():
        utt, _, wav = line.partition(" ")
        sentence = texts.get(utt, "")
        text_tokens = tok.encode(sentence)[:200]
        # proxy speech tokens: deterministic per utterance, ~2.5 tokens/char
        rng = np.random.default_rng(abs(hash(utt)) % (2**32))
        n_speech = max(int(len(sentence) * 2.5), 4)
        samples.append({
            "utt_id": utt,
            "wav": wav,
            "text_tokens": text_tokens,
            "speech_tokens": rng.integers(0, 6561, n_speech).tolist(),
            "num_frames": n_speech,
        })
    return samples


def main(argv: Optional[list] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", help="YAML config (core/config.py schema)")
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--cv-data-dir")
    parser.add_argument("--checkpoint-dir", default="checkpoints")
    parser.add_argument("--max-epochs", type=int)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny model (smoke runs without 0.5B init cost)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from ..core.config import load_config
    from ..models import cosyvoice as cv, qwen2 as q2
    from ..parallel import best_effort_mesh
    from .executor import Executor, batches_from_samples

    cfg = load_config(args.config)
    train_cfg = cfg.train
    if args.max_epochs:
        import dataclasses

        train_cfg = dataclasses.replace(train_cfg, max_epochs=args.max_epochs)

    if args.tiny:
        lm_cfg = cv.SpeechLMConfig(
            backbone=q2.Qwen2Config(hidden=64, layers=2, heads=4, kv_heads=2,
                                    ffn_dim=128, max_positions=1024),
            text_vocab=260 + 4, speech_token_size=6561,
        )
    else:
        lm_cfg = cv.SpeechLMConfig()

    import jax

    mesh = best_effort_mesh() if len(jax.devices()) > 1 else None
    rows_multiple = len(jax.devices()) if mesh is not None else 1
    executor = Executor(lm_cfg, train_cfg, mesh=mesh, checkpoint_dir=args.checkpoint_dir)
    state = executor.init_or_resume()
    log.info("starting at step %d on %d device(s)", int(state.step), len(jax.devices()))

    train_samples = load_kaldi_dir(args.data_dir)
    cv_samples = load_kaldi_dir(args.cv_data_dir) if args.cv_data_dir else train_samples[:8]
    log.info("%d train / %d cv samples", len(train_samples), len(cv_samples))

    def epoch_batches(epoch: int) -> Iterator:
        return batches_from_samples(
            iter(train_samples), train_cfg, accum=train_cfg.accum_grad,
            seed=train_cfg.seed + epoch, rows_multiple=rows_multiple,
        )

    def cv_batches() -> Iterator:
        return batches_from_samples(
            iter(cv_samples), train_cfg, accum=1, seed=0,
            rows_multiple=rows_multiple,
        )

    state = executor.train(state, epoch_batches, cv_batches=cv_batches)
    log.info("training done at step %d", int(state.step))
    return 0


if __name__ == "__main__":
    sys.exit(main())
