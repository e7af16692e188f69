"""Stage-placement parallelism (parallel/stages.py).

The pipeline-parallel analog of SURVEY.md §2.19: each cascade stage's params
live on a disjoint device group, so threaded serving overlaps concurrent
requests across stages. These tests prove (a) the partitioning contract —
disjoint groups, remainder to TTS, graceful sharing when devices are scarce;
(b) placement really happens — each engine's param arrays live on its own
group; (c) numerical transparency — the stage-placed cascade produces the
same output as the single-mesh cascade (deterministic fixed-seed weights).
"""

import jax
import numpy as np
import pytest

from expressive_speech_translation_tpu.parallel.stages import (
    STAGES, placement_report, stage_meshes,
)


def _device_ids(mesh):
    return sorted(d.id for d in mesh.devices.flat)


def _param_devices(tree):
    out = set()
    jax.tree_util.tree_map(lambda a: out.update(a.devices()), tree)
    return out


class TestStageMeshes:
    def test_disjoint_groups_remainder_to_tts(self):
        meshes = stage_meshes(devices=jax.devices()[:8], tp=1)
        assert set(meshes) == set(STAGES)
        ids = {s: _device_ids(m) for s, m in meshes.items()}
        # disjoint and covering all 8 devices
        all_ids = ids["asr"] + ids["nmt"] + ids["tts"]
        assert len(all_ids) == len(set(all_ids)) == 8
        # even split 8//3=2 each, remainder 2 to the last (heaviest) stage
        assert len(ids["asr"]) == 2 and len(ids["nmt"]) == 2
        assert len(ids["tts"]) == 4
        assert dict(meshes["tts"].shape) == {"dp": 4, "tp": 1}

    def test_tp_groups(self):
        meshes = stage_meshes(devices=jax.devices()[:8], tp=2)
        # 4 tp-groups over 3 stages: 1/1/2 groups -> 2/2/4 devices
        assert dict(meshes["asr"].shape) == {"dp": 1, "tp": 2}
        assert dict(meshes["tts"].shape) == {"dp": 2, "tp": 2}
        tts = set(_device_ids(meshes["tts"]))
        assert not tts & set(_device_ids(meshes["asr"]))
        assert not tts & set(_device_ids(meshes["nmt"]))

    def test_scarce_devices_share_round_robin(self):
        meshes = stage_meshes(devices=jax.devices()[:2], tp=1)
        ids = {s: _device_ids(m) for s, m in meshes.items()}
        assert ids["asr"] != ids["nmt"]          # two groups, three stages
        assert ids["tts"] == ids["asr"]          # stage 2 wraps onto group 0
        single = stage_meshes(devices=jax.devices()[:1], tp=1)
        assert all(_device_ids(m) == _device_ids(single["asr"])
                   for m in single.values())     # degenerates to one chip

    def test_tp_too_large_raises(self):
        with pytest.raises(ValueError):
            stage_meshes(devices=jax.devices()[:2], tp=4)

    def test_report_covers_all_stages(self):
        meshes = stage_meshes(devices=jax.devices()[:8])
        rep = placement_report(meshes)
        for s in STAGES:
            assert s in rep


class TestStagePlacedEngines:
    @pytest.fixture(scope="class")
    def audio(self):
        g = np.random.default_rng(11)
        return (0.2 * g.standard_normal(16_000)).astype(np.float32)

    @pytest.mark.slow

    def test_params_on_disjoint_groups_and_transparent(self, audio):
        from expressive_speech_translation_tpu.pipeline.cascaded import (
            CascadedBackend,
        )
        from expressive_speech_translation_tpu.pipeline.jax_engines import (
            jax_engines,
        )

        meshes = stage_meshes(devices=jax.devices()[:8], tp=1)
        placed = jax_engines(stage_meshes=meshes)
        baseline = jax_engines()

        asr_devs = _param_devices(placed.asr.params)
        nmt_devs = _param_devices(placed.nmt.params)
        tts_devs = _param_devices(placed.tts.params)
        assert asr_devs == set(meshes["asr"].devices.flat)
        assert nmt_devs == set(meshes["nmt"].devices.flat)
        assert tts_devs == set(meshes["tts"].devices.flat)
        assert not (asr_devs & nmt_devs) and not (asr_devs & tts_devs)

        out_p = CascadedBackend(placed).translate_speech(audio, "eng", "fra")
        out_b = CascadedBackend(baseline).translate_speech(audio, "eng", "fra")
        assert out_p["transcripts"] == out_b["transcripts"]
        np.testing.assert_allclose(
            np.asarray(out_p["audio"]).reshape(-1),
            np.asarray(out_b["audio"]).reshape(-1), atol=1e-5)

    def test_stage_parallel_flag(self):
        from expressive_speech_translation_tpu.pipeline.jax_engines import (
            jax_engines,
        )

        eng = jax_engines(stage_parallel=True)
        a = _param_devices(eng.asr.params)
        t = _param_devices(eng.tts.params)
        assert a and t and not (a & t)

    @pytest.mark.slow

    def test_stage_placed_with_micro_batchers_concurrent(self, audio):
        """The production multi-chip combo: stage-placed engines wrapped in
        serving micro-batchers, hit by concurrent cascade requests (the
        composition class that shipped the r2 weightless regression)."""
        from concurrent.futures import ThreadPoolExecutor

        from expressive_speech_translation_tpu.pipeline.cascaded import (
            CascadedBackend,
        )
        from expressive_speech_translation_tpu.pipeline.jax_engines import (
            jax_engines,
        )

        meshes = stage_meshes(devices=jax.devices()[:8], tp=1)
        eng = jax_engines(stage_meshes=meshes, batch_asr=True,
                          batch_nmt=True, batch_tts=True, max_batch=4,
                          batch_wait_ms=5.0)
        assert eng.weights_info() == "random"  # unwrap works through wrappers
        backend = CascadedBackend(eng)
        ref = backend.translate_speech(audio, "eng", "fra")
        with ThreadPoolExecutor(max_workers=4) as ex:
            outs = list(ex.map(
                lambda _: backend.translate_speech(audio, "eng", "fra"),
                range(4)))
        for out in outs:
            # ASR + NMT are deterministic across calls; TTS audio varies by
            # design (per-call RAS sampling seed), so assert shape/sanity
            assert out["transcripts"] == ref["transcripts"]
            wave = np.asarray(out["audio"]).reshape(-1)
            assert wave.size > 0 and np.isfinite(wave).all()

    def test_placement_info_surfaces_groups(self):
        from expressive_speech_translation_tpu.pipeline.engines import (
            fake_engines,
        )
        from expressive_speech_translation_tpu.pipeline.jax_engines import (
            jax_engines,
        )

        meshes = stage_meshes(devices=jax.devices()[:8], tp=1)
        info = jax_engines(stage_meshes=meshes).placement_info()
        assert set(info) == {"asr", "nmt", "tts"}
        assert info["asr"] == _device_ids(meshes["asr"])
        assert info["tts"] == _device_ids(meshes["tts"])
        assert not set(info["asr"]) & set(info["tts"])
        # host-side engines have no device-resident params
        assert fake_engines().placement_info() == {
            "asr": [], "nmt": [], "tts": []}

    def test_config_knob_reaches_engine_config(self):
        from expressive_speech_translation_tpu.core.config import load_config

        cfg = load_config(env={"EST_ENGINES__STAGE_PARALLEL": "1",
                               "EST_ENGINES__STAGE_TP": "2"})
        assert cfg.engines.stage_parallel is True
        assert cfg.engines.stage_tp == 2
