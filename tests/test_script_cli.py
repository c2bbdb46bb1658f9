"""Pure arg-parsing contracts of the data-prep script CLIs."""

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "make_sim_effect_data",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "make_sim_effect_data.py"),
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_positional_compat():
    st, sv, out, eff = _MOD.parse_args(["a/train", "a/val", "outdir"])
    assert (st, sv, out) == ("a/train", "a/val", "outdir")
    assert eff == list(_MOD.ALL_EFFECTS)


def test_flags_and_effect_selection():
    st, sv, out, eff = _MOD.parse_args(
        ["sim_phaser", "--src-train", "t", "--src-val", "v"]
    )
    assert (st, sv, out) == ("t", "v", "data")
    assert eff == ["sim_phaser"]


def test_trailing_flag_errors():
    with pytest.raises(SystemExit, match="--out-root needs a value"):
        _MOD.parse_args(["--out-root"])


def test_defaults():
    st, sv, out, eff = _MOD.parse_args([])
    assert (st, sv, out) == ("data/idmt_4/train", "data/idmt_4/val", "data")
    assert eff == list(_MOD.ALL_EFFECTS)


# --- bench_streaming.py ---

_BS_SPEC = importlib.util.spec_from_file_location(
    "bench_streaming",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "bench_streaming.py"),
)
_BS = importlib.util.module_from_spec(_BS_SPEC)
_BS_SPEC.loader.exec_module(_BS)


def test_bench_streaming_defaults():
    a = _BS.parse_args([])
    assert a.buffer_sizes == "128,512,2048"
    assert a.channels == 2
    assert a.seconds == 2.0
    assert a.weights.endswith(".npz")


def test_bench_streaming_flags():
    a = _BS.parse_args(
        ["--buffer-sizes", "64", "--seconds", "0.25", "--channels", "1",
         "--weights", "w.npz"]
    )
    assert [int(s) for s in a.buffer_sizes.split(",")] == [64]
    assert (a.seconds, a.channels, a.weights) == (0.25, 1, "w.npz")
