"""Orbax checkpointing with deterministic resume.

Replaces the reference's ``epoch_N_whole.pt`` torch saves (training_log.txt:6,
save_per_step 1000, greek_sft.yaml:103) — including surviving the recorded
crash-resume story (the reference's first run died mid-save with ENOSPC and
was resumed from the last complete checkpoint, SURVEY.md §5.4): Orbax writes
are atomic (temp dir + rename), so a killed save can never corrupt the latest
complete step.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .sft import TrainState

log = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str | Path, *, keep: int = 10, save_interval_steps: int = 1000):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, state: TrainState, *, metrics: Optional[dict] = None, force: bool = False) -> bool:
        step = int(state.step)
        if step in (self._mgr.all_steps() or ()):  # re-saving a step is a no-op
            return False
        saved = self._mgr.save(
            step,
            args=ocp.args.StandardSave(state._asdict()),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
            force=force,
        )
        if saved:
            log.info("saved checkpoint step %d -> %s", step, self.directory)
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    # ------------------------------------------------------- resume position
    #
    # The orbax tree carries params/opt_state/step but not WHERE in the data
    # schedule the run was: without (epoch, epoch_start_step) a crash-resume
    # restarts `for epoch in range(max_epochs)` from 0 and re-trains every
    # completed epoch a second time — double the configured budget and a
    # silently shifted LR schedule. The position rides a tiny JSON sidecar
    # (atomic rename, same crash posture as the orbax writes).

    def save_meta(self, meta: dict) -> None:
        import json as _json
        import os as _os

        tmp = self.directory / ".meta.json.tmp"
        tmp.write_text(_json.dumps(meta))
        _os.replace(tmp, self.directory / "meta.json")

    def load_meta(self) -> dict:
        import json as _json

        path = self.directory / "meta.json"
        if not path.exists():
            return {}
        try:
            return _json.loads(path.read_text())
        except ValueError:
            log.warning("unreadable checkpoint meta at %s — resuming from epoch 0", path)
            return {}

    def restore(self, template: TrainState, step: Optional[int] = None) -> Optional[TrainState]:
        target = step if step is not None else self._mgr.latest_step()
        if target is None:
            return None
        restored = self._mgr.restore(
            target, args=ocp.args.StandardRestore(template._asdict())
        )
        log.info("restored checkpoint step %d from %s", target, self.directory)
        return TrainState(**restored)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
