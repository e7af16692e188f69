"""bench.py relay-outage behavior: the driver-facing contract is ONE
parseable, honestly-labeled headline JSON line and rc=0 whenever that line
was printed — even when the TPU relay is down and the init watchdog fires
(the round-2 failure mode was a silent rc=124 with no line at all)."""

import json
import pathlib
import subprocess
import sys
import pytest

pytestmark = pytest.mark.quick

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_watchdog_emits_labeled_fallback_and_exits_zero():
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import time\n"
        "import bench\n"
        "bench._arm_watchdog(0.2, 'TPU backend init')\n"
        "time.sleep(30)\n" % str(REPO)
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    assert payload["metric"] == "audio_s2st_e2e_serve_rtf_1chip"
    assert payload["value"] > 0
    # Provenance must be in the label: a recorded number may never pass
    # itself off as a fresh measurement.
    assert "RECORDED" in payload["unit"]
    assert "NOT a fresh measurement" in payload["unit"]
    assert "relay" in proc.stderr


def test_fallback_is_single_shot(capsys):
    sys.path.insert(0, str(REPO))
    try:
        import bench
    finally:
        sys.path.remove(str(REPO))
    emitted_before = bench._HEADLINE_EMITTED
    try:
        bench._HEADLINE_EMITTED = False
        bench._emit_recorded_fallback("test reason one")
        bench._emit_recorded_fallback("test reason two")
        out = capsys.readouterr().out
        payloads = [json.loads(ln) for ln in out.splitlines() if ln.strip()]
        assert len(payloads) == 1
        assert "test reason one" in payloads[0]["unit"]
        assert bench._HEADLINE_EMITTED is True
    finally:
        bench._HEADLINE_EMITTED = emitted_before


def test_disarmed_watchdog_stays_silent():
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import time\n"
        "import bench\n"
        "disarm = bench._arm_watchdog(0.2, 'TPU backend init')\n"
        "disarm()\n"
        "time.sleep(0.6)\n"
        "print('CLEAN')\n" % str(REPO)
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0
    assert proc.stdout.strip() == "CLEAN"


def _bench():
    sys.path.insert(0, str(REPO))
    try:
        import bench
    finally:
        sys.path.remove(str(REPO))
    return bench


def test_matmul_param_count_counts_only_matrices():
    """MFU numerator (VERDICT r4 weak #2): 2·P·T uses matmul-weight elements
    — vectors (biases, norms) excluded, matrices and embeddings included."""
    import numpy as np

    bench = _bench()
    tree = {
        "w": np.zeros((4, 8)),          # counted: 32
        "emb": np.zeros((10, 4)),       # counted: 40
        "b": np.zeros((8,)),            # excluded: bias
        "scale": np.zeros(()),          # excluded: scalar
        "nested": [{"k": np.zeros((2, 2, 3))}],  # counted: 12 (conv kernel)
    }
    assert bench._matmul_param_count(tree) == 32 + 40 + 12


def test_mfu_arithmetic_bounds():
    """A stage that does 2·P·T FLOPs in t seconds has MFU 2PT/t/peak; the
    constant used is the v5e datasheet bf16 peak."""
    bench = _bench()
    assert bench.V5E_PEAK_BF16_FLOPS == 197e12
    p, t_positions, seconds = 1e9, 500, 0.1
    mfu = 2 * p * t_positions / seconds / bench.V5E_PEAK_BF16_FLOPS
    assert 0.05 < mfu < 0.051  # 1e13 FLOP / 0.1 s / 197e12
