"""Unit contracts for bench.py's round-5 additions: the analytic MFU
FLOPs model and the torch TBPTT baseline's loop geometry.  These pin the
bench's *accounting* (the JSON lines the driver records) — the timing
itself is only meaningful on the real chip."""

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
_BENCH = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_BENCH)


def test_train_step_model_flops_conv_dominant():
    """The paper config's analytic FLOPs: conv trunk fwd+dgrad+wgrad
    dominates (>90%), and the per-example total sits in the known
    envelope (~142 GFLOP: 3x the ~47 GFLOP forward)."""
    per_example = _BENCH.train_step_model_flops(1)
    assert 1.30e11 < per_example < 1.55e11, per_example
    # conv share: recompute the trunk term the same way the model does
    frames = 88200 // 256 + 1
    mels, conv_macs = 256, 0
    for cin, cout in zip((2, 64, 64, 64, 64, 64), (64,) * 6):
        conv_macs += cin * cout * 5 * 13 * mels * frames
        mels //= 2
    assert 3 * 2 * conv_macs / per_example > 0.90
    # batch linearity
    assert _BENCH.train_step_model_flops(256) == 256 * per_example


def test_train_step_model_flops_scales_with_frames():
    f1 = _BENCH.train_step_model_flops(1, n_samples=88200)
    f2 = _BENCH.train_step_model_flops(1, n_samples=44100)
    frames1 = 88200 // 256 + 1
    frames2 = 44100 // 256 + 1
    assert abs(f1 / f2 - frames1 / frames2) < 1e-6


def test_tbptt_baseline_loop_geometry():
    """The torch baseline must run the reference's 85 updates per 2 s
    batch (`lightning.py:356-384`: 1024-sample warmup + 85 chunks of
    1024 inside 88200 samples)."""
    t, chunk = 88200, 1024
    n_chunks = (t - chunk) // chunk
    assert n_chunks == 85
    # last chunk must stay in bounds
    assert (1 + n_chunks) * chunk <= t


def test_chorus4_regime_pins():
    """Pin the sim_chorus4 corpus regime (the 0.44x conditioning-win
    bracket, ROUND_NOTES round 5): the effect-corpus seed and the
    GT-control regime tuple must not drift, or the archived bracket
    stops being reproducible."""
    import importlib.util as _ilu

    here = os.path.dirname(__file__)

    def load(name):
        spec = _ilu.spec_from_file_location(
            name, os.path.join(here, "..", "scripts", f"{name}.py")
        )
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    eff = load("make_sim_effect_data")
    assert "sim_chorus4" in eff.ALL_EFFECTS
    assert eff.EFFECT_SEEDS["sim_chorus4"] == 17
    gt = load("make_sim_chorus_gt_control")
    mdw, width, out, seed, delay_mix, trem_mix = gt.REGIMES["chorus4"]
    assert (mdw, width) == (0.367, 0.8)  # the shipped 11-19 ms sweep
    assert out == "data/sim_chorus4_gt" and seed == 1019
    assert (delay_mix, trem_mix) == (0.35, 0.9)  # level-mod dominant
    # the pre-chorus4 regimes keep their original 4-field semantics
    assert gt.REGIMES["chorus"][4:] == (0.9, 0.0)
    assert gt.REGIMES["chorus2"][4:] == (0.9, 0.0)
