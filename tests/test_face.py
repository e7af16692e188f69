"""Face/mouth localization (pipeline/face.py) — VERDICT r1 item 5.

The reference's MediaPipe FaceMesh / DWPose / S3FD roles are filled by a
classical skin×motion + chroma-lip-map detector. Tests run against BOTH the
committed real speaking-head fixture (the reference's own demo video) and
synthetic clips with known face/mouth geometry.
"""

import numpy as np
import pytest

from expressive_speech_translation_tpu.pipeline import face as F
from expressive_speech_translation_tpu.pipeline.visual_speech_detector import (
    VisualSpeechDetector,
)

FIXTURE = "/root/reference/Frontend/public/videos/man-speaking-into-the-microphone.mp4"


@pytest.fixture(scope="module")
def fixture_frames():
    from expressive_speech_translation_tpu.media import native

    frames, fps = native.decode_video(FIXTURE, max_frames=240)
    return frames, fps


# --------------------------------------------------------------- synthetic

SKIN = (195, 130, 105)   # passes the YCbCr skin box
LIPS = (185, 70, 85)     # redder: passes the lip map
WALL = (226, 176, 140)   # skin-toned but brighter static background


def synthetic_clip(n=48, h=180, w=240, mouth_open_every=12):
    """Skin-toned wall + a moving 'head' with articulating dark mouth."""
    g = np.random.default_rng(0)
    frames = []
    for t in range(n):
        f = np.empty((h, w, 3), np.uint8)
        f[:] = WALL
        f += g.integers(0, 3, f.shape, dtype=np.uint8)  # sensor noise
        # head: skin ellipse, oscillating horizontally (speaking head sway)
        cy, cx = h // 2, w // 2 + int(6 * np.sin(t / 2.0))
        yy, xx = np.mgrid[:h, :w]
        head = ((yy - cy) / 45.0) ** 2 + ((xx - cx) / 30.0) ** 2 < 1.0
        f[head] = SKIN
        # lips at the lower face; mouth opens (dark interior) periodically
        ly, lx = cy + 24, cx
        f[ly - 3: ly + 3, lx - 9: lx + 9] = LIPS
        if (t // (mouth_open_every // 2)) % 2 == 1:
            f[ly - 2: ly + 2, lx - 6: lx + 6] = (20, 10, 10)
        frames.append(f)
    return np.stack(frames)


def test_synthetic_face_bbox():
    frames = synthetic_clip()
    box = F.detect_face_bbox(frames)
    assert box is not None
    y0, x0, y1, x1 = box
    # head centre (90, ~120) inside the detected box; wall not swallowed
    assert y0 <= 90 <= y1 and x0 <= 120 <= x1
    assert (y1 - y0) * (x1 - x0) < 0.6 * 180 * 240


def test_synthetic_mouth_bbox_on_lips():
    frames = synthetic_clip()
    face = F.detect_face_bbox(frames)
    mouth = F.detect_mouth_bbox(frames, face)
    assert mouth is not None
    my0, mx0, my1, mx1 = mouth
    # lips drawn at y=114, x=120
    assert my0 <= 114 <= my1
    assert mx0 <= 120 <= mx1


def test_synthetic_speech_segments_follow_mouth():
    frames = list(synthetic_clip(n=120, mouth_open_every=12))
    det = VisualSpeechDetector(fps=24.0)
    segments = det.detect_speech_segments(frames)
    assert len(segments) >= 1
    assert all(s.duration >= 0.5 for s in segments)


def test_no_face_returns_none():
    g = np.random.default_rng(1)
    frames = g.integers(0, 40, (16, 64, 64, 3), dtype=np.uint8)  # dark noise
    assert F.detect_face_bbox(frames) is None


def test_grayscale_frames_no_crash():
    g = np.random.default_rng(2)
    frames = g.integers(0, 255, (8, 64, 64), dtype=np.uint8)
    F.detect_face_bbox(frames)  # motion-only path; must not raise


# ------------------------------------------------------------ real fixture


def test_real_fixture_face_and_mouth(fixture_frames):
    frames, _ = fixture_frames
    det = F.FaceLandmarkDetector()
    track = det.track(frames)
    assert track is not None
    fy0, fx0, fy1, fx1 = track.face
    # the speaker's head occupies roughly x 560-840, y 0-400 in this shot
    assert 400 < fx0 < 700 and 700 < fx1 < 1000
    assert fy1 < 550
    assert track.mouth is not None
    my0, mx0, my1, mx1 = track.mouth
    # mouth (lips ~y 245-280, x 740-800) inside the detected mouth box
    assert my0 <= 255 <= my1
    assert mx0 <= 770 <= mx1


def test_real_fixture_detection_stable_across_halves(fixture_frames):
    frames, _ = fixture_frames
    half = len(frames) // 2
    b1 = F.detect_face_bbox(frames[:half])
    b2 = F.detect_face_bbox(frames[half:])
    assert b1 is not None and b2 is not None
    # IoU of the two halves' face boxes > 0.4 (stable detection)
    y0 = max(b1[0], b2[0]); x0 = max(b1[1], b2[1])
    y1 = min(b1[2], b2[2]); x1 = min(b1[3], b2[3])
    inter = max(0, y1 - y0) * max(0, x1 - x0)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    assert inter / (a1 + a2 - inter) > 0.4


def test_real_fixture_mouth_area_series_nonempty(fixture_frames):
    frames, fps = fixture_frames
    det = F.FaceLandmarkDetector()
    areas = det.mouth_area_series(frames)
    assert len(areas) == len(frames[::3])
    assert areas.std() > 1e-3  # articulating mouth: the signal varies


def test_real_fixture_speech_segments(fixture_frames):
    frames, fps = fixture_frames
    det = VisualSpeechDetector(fps=fps)
    segments = det.detect_speech_segments(list(frames))
    assert len(segments) >= 1  # the man is speaking
    total = sum(s.duration for s in segments)
    assert total > 1.0


def test_lipsync_bbox_without_caller_bbox(fixture_frames):
    frames, _ = fixture_frames
    box = F.frames_face_detector(frames)
    y0, x0, y1, x1 = box
    assert (y1 - y0) == (x1 - x0)  # square crop for the 256x256 models
    assert x0 < 770 < x1  # covers the face


# ------------------------------------------------- full-frame lip-sync paths


@pytest.mark.slow


def test_musetalk_pipeline_full_frames_no_bbox():
    """MuseTalk end-to-end on raw frames: detection → crop → render → blend
    (VERDICT r1: lip-sync must run on arbitrary frames without a bbox)."""
    import jax
    from expressive_speech_translation_tpu.models import musetalk as mt
    from expressive_speech_translation_tpu.pipeline.musetalk_pipeline import (
        MuseTalkPipeline, musetalk_lipsync_fn,
    )

    cfg = mt.MuseTalkConfig(image_size=32, vae_channels=(8, 16, 32),
                            vae_layers=1, unet_channels=(8, 16, 32),
                            unet_layers=1, audio_dim=48, heads=2, norm_groups=4)
    params = mt.init_musetalk(jax.random.PRNGKey(3), cfg)
    frames = synthetic_clip(n=6)
    sr = 16_000
    t = np.arange(int(sr * 6 / 24.0)) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    pipe = MuseTalkPipeline(params, cfg, batch_size=4)
    out = pipe.render(frames, 24.0, audio)
    assert out.shape == frames.shape and out.dtype == np.uint8
    # only the face region is re-rendered; the wall corner is untouched
    np.testing.assert_array_equal(out[:, :8, :8], frames[:, :8, :8])
    assert (out != frames).any()

    # NativeVideoIO adapter seam (resamples 24k dub audio)
    fn = musetalk_lipsync_fn(params, cfg, batch_size=4)
    out2 = fn(frames, 24.0, np.resize(audio, int(24_000 * 0.25)), 24_000)
    assert out2.shape == frames.shape


def test_diff2lip_default_detector_uses_face():
    """Diff2LipPipeline with no detector arg localizes the face itself."""
    import jax
    from expressive_speech_translation_tpu.pipeline.diff2lip import (
        Diff2LipConfig, Diff2LipPipeline,
    )

    cfg = Diff2LipConfig(image_size=32, model_channels=8, channel_mult=(1, 2),
                         attention_ds=(2,), heads=2, norm_groups=4,
                         audio_model_channels=8, audio_channel_mult=(1, 2),
                         audio_init_spatial=16,
                         diffusion_steps=8, sampling_steps="ddim2")
    pipe = Diff2LipPipeline(cfg)
    frames = synthetic_clip(n=4)
    sr = 16_000
    audio = np.zeros(int(sr * 4 / 24.0), np.float32)
    out = pipe.generate(frames, audio, 24.0, key=jax.random.PRNGKey(0),
                        batch_size=4)
    assert out.shape == frames.shape
    np.testing.assert_array_equal(out[:, :8, :8], frames[:, :8, :8])


# ----------------------------------------------------- windowed tracking


def test_track_face_windows_real_fixture(fixture_frames):
    frames, fps = fixture_frames
    tracks = F.track_face_windows(frames, fps, window_s=2.0)
    assert len(tracks) == -(-len(frames) // max(int(2.0 * fps), 4))
    # every window localizes the same speaker (head around x 560-840)
    for t in tracks:
        assert t is not None
        y0, x0, y1, x1 = t.face
        assert x0 < 780 < x1 and y0 < 250


def test_per_frame_face_boxes_interpolate(fixture_frames):
    frames, fps = fixture_frames
    boxes = F.per_frame_face_boxes(frames, fps)
    assert len(boxes) == len(frames)
    # boxes vary smoothly: consecutive-frame center drift < 20 px
    centers = np.asarray([((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in boxes])
    drift = np.abs(np.diff(centers, axis=0)).max()
    assert drift < 20
    # and every box covers the mouth region
    assert all(b[1] < 770 < b[3] for b in boxes)


def test_track_windows_no_face_falls_back():
    g = np.random.default_rng(4)
    frames = g.integers(0, 40, (30, 64, 64, 3), dtype=np.uint8)
    tracks = F.track_face_windows(frames, 15.0)
    assert all(t is None for t in tracks)
    boxes = F.per_frame_face_boxes(frames, 15.0)
    assert len(boxes) == 30 and boxes[0] == (0, 0, 64, 64)  # centre fallback


def fast_pan_clip(n=50, h=180, w=320, speed=4.0):
    """Head panning fast across the frame (speed px/frame) — faster than the
    2 s windowed detector alone can follow between window centres."""
    g = np.random.default_rng(1)
    frames, centers = [], []
    for t in range(n):
        f = np.empty((h, w, 3), np.uint8)
        f[:] = WALL
        f += g.integers(0, 3, f.shape, dtype=np.uint8)
        cy, cx = h // 2, int(50 + speed * t)
        yy, xx = np.mgrid[:h, :w]
        head = ((yy - cy) / 42.0) ** 2 + ((xx - cx) / 28.0) ** 2 < 1.0
        f[head] = SKIN
        ly, lx = cy + 22, cx
        f[ly - 3: ly + 3, lx - 8: lx + 8] = LIPS
        frames.append(f)
        centers.append((cy, cx))
    return np.stack(frames), centers


def _center_errors(boxes, centers):
    errs = []
    for (y0, x0, y1, x1), (cy, cx) in zip(boxes, centers):
        errs.append(np.hypot((y0 + y1) / 2 - cy, (x0 + x1) / 2 - cx))
    return np.asarray(errs)


def test_fast_pan_flow_refinement_tracks_mouth():
    """VERDICT r2 #9: phase-correlation refinement between detection windows
    keeps the box on a fast-panning head (the bar: diff2lip's 5-frame bbox
    smoothing of per-frame detections, api_inference_logic.py:89-97)."""
    frames, centers = fast_pan_clip()
    refined = F.per_frame_face_boxes(frames, fps=25.0, refine=True)
    plain = F.per_frame_face_boxes(frames, fps=25.0, refine=False)
    assert len(refined) == len(frames)

    e_ref = _center_errors(refined, centers)
    e_plain = _center_errors(plain, centers)
    # the tracked box stays on the head everywhere (≤ half the head radius;
    # ~8 px of the residual is the anchor detection box's own asymmetry)
    assert e_ref.max() <= 16.0, f"refined max err {e_ref.max():.1f}px"
    assert e_ref.mean() <= 12.0, f"refined mean err {e_ref.mean():.1f}px"
    # and decisively beats pure window interpolation on this motion
    assert e_ref.mean() < 0.5 * e_plain.mean()


def test_refinement_is_noop_on_static_head():
    """A static head must not be disturbed by the flow pass."""
    frames = synthetic_clip(n=30)
    refined = F.per_frame_face_boxes(frames, fps=25.0, refine=True)
    plain = F.per_frame_face_boxes(frames, fps=25.0, refine=False)
    d = _center_errors(refined, [((p[0] + p[2]) / 2, (p[1] + p[3]) / 2)
                                 for p in plain])
    assert d.mean() <= 4.0


def test_smooth_boxes_parity():
    """Centered 5-frame smoothing (api_inference_logic.py:27-38 smooth_bbox:
    window [i−2, i+3], out-of-place)."""
    boxes = [(i, i * 2, i + 10, i * 2 + 10) for i in range(12)]
    sm = F.smooth_boxes(boxes, window=5)
    assert len(sm) == 12
    assert sm[0] == (1, 2, 11, 12)          # mean of boxes[0:3]
    assert sm[5] == (5, 10, 15, 20)         # mean of boxes[3:8]
    assert sm[-1] == tuple(int(round(v)) for v in
                           np.mean(np.asarray(boxes[-3:], np.float32), axis=0))


# -------------------------------------------------- learned-detector seam
# VERDICT r4 #2: the production lip-sync path needs the same learned-model
# discovery seam the eval battery got (evals/visual_models.py) — DWPose's
# role for MuseTalk (Docker/api_inference_logic.py:42-73), S3FD's for
# diff2lip (Backend/diff2lip/face_detection/).


@pytest.fixture(autouse=True)
def _isolate_learned_detector():
    F._reset_learned()
    yield
    F._reset_learned()


def test_injected_learned_detector_carries_all_consumers():
    """provide_learned_detector → detect_face_bbox, frames_face_detector,
    per_frame_face_boxes, and FaceLandmarkDetector all dispatch to it."""
    calls = {"n": 0}

    def det(frame):
        calls["n"] += 1
        return (30, 40, 110, 120)  # (y0, x0, y1, x1)

    F.provide_learned_detector(det)
    frames = synthetic_clip(n=12)
    assert F.detect_face_bbox(frames) == (30, 40, 110, 120)
    assert calls["n"] > 0

    # the clip-level track uses the learned face box; mouth stays classical
    track = F.FaceLandmarkDetector().track(frames)
    assert track.face == (30, 40, 110, 120)

    # the square lip-sync crop derives from the learned box
    box = F.frames_face_detector(frames)
    y0, x0, y1, x1 = box
    assert (y1 - y0) == (x1 - x0)
    assert y0 <= 70 <= y1 and x0 <= 80 <= x1  # centred on the learned box

    boxes = F.per_frame_face_boxes(frames, fps=24.0)
    assert len(boxes) == len(frames)


def test_learned_detector_no_detection_falls_back_to_classical():
    F.provide_learned_detector(lambda frame: None)
    frames = synthetic_clip()
    box = F.detect_face_bbox(frames)
    assert box is not None              # classical still finds the head
    y0, x0, y1, x1 = box
    assert y0 <= 90 <= y1 and x0 <= 120 <= x1


def test_learned_detector_crash_falls_back_to_classical():
    def boom(frame):
        raise RuntimeError("bad input shape")

    F.provide_learned_detector(boom)
    frames = synthetic_clip()
    assert F.detect_face_bbox(frames) is not None


def test_torchscript_face_detector_discovery(tmp_path, monkeypatch):
    """A mounted checkpoint under $EST_MODELS_DIR/face_detector with the
    documented contract ([1,3,H,W] float in [0,1] → [N,5] (x0,y0,x1,y1,score))
    loads and takes over localization."""
    torch = pytest.importorskip("torch")

    class Det(torch.nn.Module):
        def forward(self, x):
            # assert the documented NCHW [0,1] contract, then return two
            # boxes: a low-score decoy and the real face
            assert x.shape[1] == 3
            assert float(x.max()) <= 1.0 + 1e-6
            return torch.tensor([[5.0, 5.0, 20.0, 20.0, 0.3],
                                 [40.0, 30.0, 120.0, 110.0, 0.9]])

    d = tmp_path / "face_detector"
    d.mkdir()
    torch.jit.script(Det()).save(str(d / "model.pt"))
    (d / "config.json").write_text(
        '{"format": "torchscript", "min_score": 0.5}')
    monkeypatch.setenv("EST_MODELS_DIR", str(tmp_path))
    F._reset_learned()
    assert F.learned_detector() is not None
    frames = synthetic_clip(n=6)
    # (x0,y0,x1,y1)=(40,30,120,110) → ours (y0,x0,y1,x1)=(30,40,110,120);
    # the 0.3-score decoy is filtered by min_score
    assert F.detect_face_bbox(frames) == (30, 40, 110, 120)


def test_unknown_detector_format_degrades_to_classical(tmp_path, monkeypatch):
    d = tmp_path / "face_detector"
    d.mkdir()
    (d / "config.json").write_text('{"format": "onnx-nope"}')
    monkeypatch.setenv("EST_MODELS_DIR", str(tmp_path))
    F._reset_learned()
    assert F.learned_detector() is None
    assert F.detect_face_bbox(synthetic_clip()) is not None


# ------------------------------------------- localization-quality metric
# VERDICT r4 weak #4: face-finding quality must be measured, not asserted.


def _iou(a, b):
    y0 = max(a[0], b[0]); x0 = max(a[1], b[1])
    y1 = min(a[2], b[2]); x1 = min(a[3], b[3])
    inter = max(0, y1 - y0) * max(0, x1 - x0)
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])  # noqa: E731
    return inter / max(area(a) + area(b) - inter, 1)


# Hand-labeled face box on the committed speaking-head fixture (frame ~0-240:
# the speaker's head — hair included — sits at roughly y 30-420, x 550-870
# in the 720p shot).
FIXTURE_FACE_BOX = (30, 550, 420, 870)


def test_real_fixture_face_iou_vs_labeled_box(fixture_frames):
    """Classical localization quality on the committed fixture: IoU vs the
    hand-labeled head box — a measured regression gate for the one component
    bounding lip-sync quality."""
    frames, _ = fixture_frames
    box = F.detect_face_bbox(frames)
    assert box is not None
    iou = _iou(box, FIXTURE_FACE_BOX)
    assert iou >= 0.35, f"face IoU vs labeled box {iou:.2f} (box={box})"


def test_real_fixture_per_frame_drift_bounded(fixture_frames):
    """Per-frame boxes never wander off the labeled head. Window detections
    vary in tightness (a tight lower-face box is correct localization), so
    the per-frame gate is CONTAINMENT — ≥ 85 % of every smoothed box inside
    the labeled head region — plus bounded centre drift between consecutive
    frames (stability under motion)."""
    frames, fps = fixture_frames
    boxes = F.per_frame_face_boxes(frames, fps)

    def containment(b):
        y0 = max(b[0], FIXTURE_FACE_BOX[0]); x0 = max(b[1], FIXTURE_FACE_BOX[1])
        y1 = min(b[2], FIXTURE_FACE_BOX[2]); x1 = min(b[3], FIXTURE_FACE_BOX[3])
        inter = max(0, y1 - y0) * max(0, x1 - x0)
        return inter / max((b[2] - b[0]) * (b[3] - b[1]), 1)

    cont = [containment(b) for b in boxes]
    assert min(cont) >= 0.85, f"min containment in labeled head {min(cont):.2f}"
    centers = np.asarray([((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in boxes])
    assert np.abs(np.diff(centers, axis=0)).max() < 12.0


def test_per_frame_boxes_use_learned_detector_per_frame():
    """With a learned detector mounted, per_frame_face_boxes runs TRUE
    per-frame detection + 5-frame smoothing (api_inference_logic.py:89-97
    shape) — one call per frame, misses inherit the previous detection."""
    calls = []

    def det(frame):
        i = len(calls)
        calls.append(i)
        if i % 5 == 2:
            return None              # simulated per-frame miss
        return (10 + i, 20 + i, 60 + i, 70 + i)   # drifting box

    F.provide_learned_detector(det)
    frames = synthetic_clip(n=12)
    boxes = F.per_frame_face_boxes(frames, fps=24.0)
    assert len(calls) == 12          # per-frame, not per-window
    assert len(boxes) == 12
    # smoothing: centres drift ~1 px/frame, smoothed boxes monotone-ish
    ys = [b[0] for b in boxes]
    assert ys == sorted(ys)
    assert ys[0] >= 10 and ys[-1] <= 22


def test_per_frame_boxes_learned_total_miss_falls_back():
    F.provide_learned_detector(lambda f: None)
    frames = synthetic_clip(n=12)
    boxes = F.per_frame_face_boxes(frames, fps=24.0)
    assert len(boxes) == 12          # classical windowed path carried it
    assert all(b[1] < 120 < b[3] for b in boxes)


# ---------------------------------------------------------- round-5 review fixes


def _tiny_cfg():
    from expressive_speech_translation_tpu.models import musetalk as mtm

    return mtm.MuseTalkConfig(image_size=32, vae_channels=(8, 16),
                              unet_channels=(16, 32), heads=2, norm_groups=8,
                              audio_dim=16, audio_ctx=2, latent_channels=4)


def test_blend_face_np_matches_device_blend():
    """The host composite must reproduce models/musetalk.blend_face."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import musetalk as mtm
    from expressive_speech_translation_tpu.pipeline.musetalk_pipeline import blend_face_np

    rng = np.random.default_rng(0)
    frame_u8 = rng.integers(0, 255, (40, 48, 3), np.uint8)
    face = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    box = (8, 10, 28, 30)
    got = blend_face_np(frame_u8, face, box)
    ref_f = jnp.asarray(frame_u8, jnp.float32) / 127.5 - 1.0
    ref = mtm.blend_face(ref_f, jnp.asarray(face), box)
    ref_u8 = np.asarray(jnp.clip((ref + 1.0) * 127.5, 0, 255), np.uint8)
    # same math, different resize kernels/rounding: allow ±2 levels
    assert np.mean(np.abs(got.astype(int) - ref_u8.astype(int))) < 2.0


def test_clamp_box_guards_frame_bounds():
    from expressive_speech_translation_tpu.pipeline.musetalk_pipeline import clamp_box

    assert clamp_box((-5, -3, 20, 25), 40, 40) == (0, 0, 20, 25)
    y0, x0, y1, x1 = clamp_box((35, 35, 60, 60), 40, 40)
    assert y1 <= 40 and x1 <= 40 and (y1 - y0) >= 8 and (x1 - x0) >= 8


def test_render_uses_per_frame_boxes(monkeypatch):
    """The production lip-sync path must consume per-frame boxes (a single
    clip-level box paints the jaw onto background when the speaker moves)."""
    from expressive_speech_translation_tpu.pipeline import musetalk_pipeline as mp

    calls = {}

    def fake_boxes(frames, fps, **kw):
        calls["n"] = len(frames)
        return [(2 + i, 2 + i, 26 + i, 26 + i) for i in range(len(frames))]

    monkeypatch.setattr(mp, "per_frame_face_boxes", fake_boxes)
    pipe = mp.MuseTalkPipeline(cfg=_tiny_cfg(), dtype=np.float32)
    frames = np.random.default_rng(1).integers(0, 255, (3, 32, 32, 3), np.uint8)
    out = pipe.render(frames, 25.0, np.zeros(16000, np.float32))
    assert calls["n"] == 3 and out.shape == frames.shape


def test_render_rejects_empty_frames():
    from expressive_speech_translation_tpu.core.errors import MediaError
    from expressive_speech_translation_tpu.pipeline import musetalk_pipeline as mp

    pipe = mp.MuseTalkPipeline(cfg=_tiny_cfg(), dtype=np.float32)
    with pytest.raises(MediaError, match="no video frames"):
        pipe.render(np.zeros((0, 32, 32, 3), np.uint8), 25.0,
                    np.zeros(1600, np.float32))


def test_wav2lip_mel_family():
    """80 Hz rate, [-4, 4] symmetric range, silence at the floor, and a tone
    exciting the right mel band (the published-checkpoint feature family)."""
    from expressive_speech_translation_tpu.pipeline.diff2lip import wav2lip_mel

    sr = 16000
    t = np.arange(sr * 2) / sr
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    mel = wav2lip_mel(tone)
    assert mel.shape[1] == 80
    assert abs(mel.shape[0] - (2 * 80)) <= 2          # 80 Hz frames
    assert mel.min() >= -4.0 and mel.max() <= 4.0
    sil = wav2lip_mel(np.zeros(sr, np.float32))
    assert float(sil.max()) == -4.0                    # silence at the floor
    # the 1 kHz band dominates its spectrum
    band_energy = mel.mean(axis=0)
    assert 10 <= int(np.argmax(band_energy)) <= 40


def test_gap_filled_windows_are_not_flow_anchors():
    from expressive_speech_translation_tpu.pipeline.face import track_face_windows

    rng = np.random.default_rng(3)
    # window 1 has a bright skin-toned moving blob; window 2 is pure noise
    def face_frame(cx):
        f = rng.integers(0, 40, (64, 64, 3), np.uint8)
        f[20:44, cx:cx + 24] = (200, 140, 120)
        return f

    frames = [face_frame(10 + i) for i in range(8)] + [
        rng.integers(0, 40, (64, 64, 3), np.uint8) for _ in range(8)]
    tracks = track_face_windows(frames, fps=4.0, window_s=2.0)
    assert len(tracks) == 2
    if tracks[1] is not None and tracks[0] is not None:
        # if the second window was gap-filled it must say so
        if tuple(tracks[1].face) == tuple(tracks[0].face):
            assert tracks[1].detected is False
        assert tracks[0].detected is True
