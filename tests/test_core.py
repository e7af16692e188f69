"""Core config / registry / errors / mesh tests."""

import dataclasses

import jax
import pytest

import expressive_speech_translation_tpu as est
from expressive_speech_translation_tpu.core import (
    AppConfig,
    ConfigError,
    Registry,
    ValidationError,
    error_id,
    load_config,
)
from expressive_speech_translation_tpu.parallel import MeshSpec, host_cpu_mesh, make_mesh

pytestmark = pytest.mark.quick


def test_defaults_match_reference_constants():
    cfg = AppConfig()
    # Backend/app.py:181-184
    assert cfg.audio.sample_rate == 16000
    assert cfg.audio.max_audio_seconds == 300.0
    assert cfg.audio.max_podcast_seconds == 3600.0
    assert cfg.audio.max_video_mb == 150.0
    # cascaded_backend.py:38,:40-41,:468
    assert cfg.audio.target_lufs == -23.0
    assert cfg.endpoints.cosyvoice_url == "http://localhost:8002"
    assert cfg.endpoints.tts_timeout_seconds == 3600.0
    # greek_sft.yaml:94-103
    assert cfg.train.learning_rate == 1e-5
    assert cfg.train.accum_grad == 4
    assert cfg.train.grad_clip == 5.0
    assert cfg.train.seed == 1986


def test_env_layering_and_legacy_aliases(tmp_path):
    yaml_file = tmp_path / "cfg.yaml"
    yaml_file.write_text("serve:\n  port: 6001\naudio:\n  sample_rate: 22050\n")
    cfg = load_config(
        yaml_file,
        env={
            "COSYVOICE_API_URL": "http://tts:9000",
            "EST_SERVE__PORT": "7001",
            "EST_AUDIO__MAX_AUDIO_SECONDS": "120.5",
            "SAVE_DEBUG_AUDIO_FILES": "true",
        },
    )
    assert cfg.endpoints.cosyvoice_url == "http://tts:9000"
    assert cfg.serve.port == 7001  # env beats yaml
    assert cfg.audio.sample_rate == 22050  # yaml beats default
    assert cfg.audio.max_audio_seconds == 120.5
    assert cfg.serve.save_debug_audio is True


def test_overrides_and_unknown_key():
    cfg = load_config(env={}, **{"serve.port": 9999})
    assert cfg.serve.port == 9999
    with pytest.raises(ConfigError):
        load_config(env={}, **{"serve.bogus": 1})
    with pytest.raises(ConfigError):
        load_config(env={"EST_SERVE__PORT": "not_an_int"})


def test_config_frozen():
    cfg = AppConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.default_backend = "x"  # type: ignore[misc]


def test_registry_fallback_semantics():
    reg = Registry("backend")
    reg.register("cascaded", "A", is_default=True)
    reg.register("seamless", "B")
    assert reg.get() == "A"
    assert reg.get("seamless") == "B"
    # unknown name falls back to default (translation_strategy.py:60-66 parity)
    assert reg.get("nope") == "A"
    with pytest.raises(ValueError):
        reg.register("cascaded", "dup")


def test_error_ids_stable():
    e = ValidationError("Audio too long")
    assert e.http_status == 400
    assert e.error_id == error_id("Audio too long")
    assert len(e.error_id) == 8
    assert e.to_payload()["error"] == "Audio too long"


def test_mesh_8_devices():
    mesh = host_cpu_mesh(8)
    assert mesh.shape == {"dp": 8, "tp": 1}
    mesh2 = make_mesh(MeshSpec(dp=-1, tp=2), devices=jax.devices()[:8])
    assert mesh2.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        MeshSpec(dp=3, tp=3).resolve(8)


def test_lazy_subpackage_access():
    assert est.core is not None
    assert "ops" in dir(est)


def test_runtime_env_vars_are_not_config_keys(tmp_path):
    """EST_MODELS_DIR / EST_BENCH_* / EST_TOKENIZER are documented runtime
    asset/bench knobs, not config keys — load_config must skip them
    (regression: EST_MODELS_DIR alone crashed startup with ConfigError)."""
    cfg = load_config(env={
        "EST_MODELS_DIR": "/models",
        "EST_TOKENIZER": "/tok.model",
        "EST_SER_MODEL": "/ser",
        "EST_COMPILE_CACHE": "/cache",
        "EST_BENCH_SCALE": "small",
        "EST_SERVE__PORT": "8123",          # real config keys still apply
    })
    assert cfg.serve.port == 8123


def test_mesh_multihost_env_wiring():
    """The tpu-pod compose exports EST_MESH__COORDINATOR / NUM_PROCESSES /
    PROCESS_ID (with `${VAR:-}` empty-string defaults) — values must land in
    MeshConfig, and empty strings must count as unset instead of crashing
    (regression: unknown-key ConfigError killed the orchestrator at boot)."""
    cfg = load_config(env={
        "EST_MESH__COORDINATOR": "worker0:8476",
        "EST_MESH__NUM_PROCESSES": "4",
        "EST_MESH__PROCESS_ID": "2",
    })
    assert cfg.mesh.coordinator == "worker0:8476"
    assert cfg.mesh.num_processes == 4 and cfg.mesh.process_id == 2

    # compose empty-string defaults = single host
    cfg = load_config(env={
        "EST_MESH__COORDINATOR": "",
        "EST_MESH__NUM_PROCESSES": "",
        "EST_MESH__PROCESS_ID": "",
        "COSYVOICE_API_URL": "",            # empty legacy alias too
    })
    assert cfg.mesh.coordinator == "" and cfg.mesh.num_processes == 0

    # no coordinator → the bootstrap is a no-op (must not try to connect)
    from expressive_speech_translation_tpu.parallel.mesh import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed(cfg.mesh)


def test_yaml_sequences_become_tuples(tmp_path):
    """Tuple-annotated fields must hold tuples even when set from a YAML
    sequence (frozen-config hashability / tuple-concatenation contract)."""
    y = tmp_path / "c.yaml"
    y.write_text(
        "serve:\n  cors_origins: [http://a, http://b]\n"
        "engines:\n  asr_context_buckets: [10, 30]\n")
    cfg = load_config(y, env={})
    assert cfg.serve.cors_origins == ("http://a", "http://b")
    assert isinstance(cfg.serve.cors_origins, tuple)
    assert cfg.engines.asr_context_buckets == (10, 30)
    assert isinstance(cfg.engines.asr_context_buckets, tuple)
