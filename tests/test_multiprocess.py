"""True multi-process ``jax.distributed`` coverage (VERDICT r4 missing #4).

All other multi-device tests (and the driver dryrun) run 8 virtual devices in
ONE process, which never exercises cross-process semantics: coordinator
wiring, ``process_index`` logic, non-addressable shards, or the collectives
crossing process boundaries. This test spawns a real coordinator + worker
pair (2 processes × 2 local CPU devices = one 4-device dp×tp global mesh),
runs one SFT step through the production ``make_train_step`` path, and
asserts the distributed loss matches the single-process value — the JAX
replacement for the reference's MPI bootstrap + gloo DDP allreduce
(/root/reference/Backend/diff2lip/guided_diffusion/dist_util.py:20-42,
/root/reference/train_greek.sh:24).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two subprocess compiles: ~30-60 s

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_reports():
    """Spawn the coordinator (rank 0) + worker (rank 1) and collect their
    JSON reports. One spawn serves every assertion below."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("EST_MESH__", "XLA_FLAGS", "JAX_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_mp_worker.py"),
             str(port), str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd=str(REPO),
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err[-3000:]}"
    return [json.loads(out.strip().splitlines()[-1]) for _, out, _ in outs]


def _single_process_loss() -> float:
    """The same step on the in-process virtual mesh (the value the
    cross-process run must reproduce)."""
    import jax
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.train.sft import (
        SFTBatch, init_train_state, make_train_step,
    )
    from tests._mp_common import TINY_LM, make_batch, make_optimizer

    optimizer = make_optimizer()
    state = init_train_state(jax.random.PRNGKey(0), TINY_LM, optimizer)
    step = make_train_step(TINY_LM, optimizer, accum_grad=2,
                           compute_dtype=jnp.float32)
    _, metrics = step(state, SFTBatch(*make_batch()))
    return float(metrics["loss"])


def test_two_process_sft_step_matches_single_process(worker_reports):
    expected = _single_process_loss()
    losses = [r["loss"] for r in worker_reports]
    # the replicated loss is identical on both processes…
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    # …and matches the single-process computation (f32 compute; only the
    # cross-device reduction order differs)
    assert losses[0] == pytest.approx(expected, rel=1e-4), \
        f"distributed {losses[0]} vs single-process {expected}"


def test_two_process_topology(worker_reports):
    for rank, r in enumerate(worker_reports):
        assert r["rank"] == rank
        assert r["process_count"] == 2
        assert r["local_devices"] == 2
        assert r["global_devices"] == 4
        assert r["mesh_shape"] == {"dp": 2, "tp": 2}
