"""Config serialization, profiling utilities, misc metrics."""

import json
import time

import numpy as np

from slam_tpu.config import (
    BundleConfig, FeatureConfig, LoopConfig, SlamConfig,
)
from slam_tpu.utils import metrics
from slam_tpu.utils.profiling import StageTimer, log


def test_enable_compile_cache_sets_stable_key_flags(tmp_path):
    """The persistent compile cache is only useful if its keys are stable
    across processes: Mosaic embeds trace-site tracebacks in the custom
    -call payload (out of reach of strip-debuginfo), so full tracebacks
    MUST be off, and the tunneled backend's ~0.35 s per trivial compile
    means the write threshold must capture fast programs too."""
    import jax

    from slam_tpu.config import RuntimeConfig, enable_compile_cache

    cfg = RuntimeConfig(compile_cache_dir=str(tmp_path / "xla"))
    enable_compile_cache(cfg)
    assert jax.config.jax_compilation_cache_dir == str(
        tmp_path / "xla" / jax.default_backend())
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.1
    assert jax.config.jax_include_full_tracebacks_in_locations is False


def test_config_json_roundtrip(tmp_path):
    cfg = SlamConfig(
        features=FeatureConfig(max_kp=1024, detector="akaze"),
        bundle=BundleConfig(max_poses=16),
        loop=LoopConfig(min_inliers=77),
        seed=42,
    )
    p = tmp_path / "cfg.json"
    cfg.save(p)
    loaded = SlamConfig.load(p)
    assert loaded == cfg
    assert loaded.features.detector == "akaze"
    assert loaded.loop.min_inliers == 77


def test_config_defaults_match_reference_thresholds():
    """The reference's published thresholds must be the defaults
    (BASELINE.md rows)."""
    cfg = SlamConfig()
    assert cfg.loop.mahalanobis_thresh == 220.0   # loop_closure.py:15
    assert cfg.loop.min_inliers == 120            # loop_closure.py:17
    assert cfg.loop.max_candidates == 15          # loop_closure.py:18
    assert cfg.loop.keyframe_gap == 10            # loop_closure.py:19
    assert cfg.keyframes.min_gap == 5             # bundle.py:233
    assert cfg.keyframes.max_gap == 21
    assert cfg.keyframes.max_dist_m == 8.0
    assert cfg.matching.stereo_dy == 2.0          # matching.py:62
    assert cfg.bundle.max_depth == 1000.0         # bundle.py:184
    assert cfg.features.akaze_threshold == 8e-4   # matching.py:20


def test_stage_timer_nesting():
    t = StageTimer()
    with t.span("outer"):
        time.sleep(0.01)
        with t.span("inner"):
            time.sleep(0.01)
    rep = t.report()
    assert "outer" in rep and "outer.inner" in rep
    assert rep["outer"] >= rep["outer.inner"] > 0.005


def test_stage_timer_save(tmp_path):
    t = StageTimer()
    with t.span("a"):
        pass
    t.save(tmp_path / "t.json")
    assert "a" in json.loads((tmp_path / "t.json").read_text())


def test_log_does_not_crash():
    log("event", frames=10, fps=1.5)


def test_dist_traveled():
    T = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    # camera centers at z = 0, 1, 3, 6  (T_w2c: t = -R c = -c)
    for i, z in enumerate([0.0, 1.0, 3.0, 6.0]):
        T[i, 2, 3] = -z
    d = metrics.dist_traveled(T)
    np.testing.assert_allclose(d, [0.0, 1.0, 3.0, 6.0], atol=1e-6)
