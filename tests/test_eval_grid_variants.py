"""Variant-generation contracts of scripts/run_eval_grid.py: the
rand-anchor suite must produce the reference's 23-table layout
(eval_lfo_rand.txt) and the unseen-audio sweep its 6-group
effect x domain x condition matrix (eval_lfo_unseen_audio.txt)."""

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "run_eval_grid",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "run_eval_grid.py"),
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)

SHAPES = ["cos", "tri", "rect_cos", "inv_rect_cos", "saw", "rsaw"]


def _rand_variants():
    from mod_extraction_tpu.cli import load_yaml_with_includes

    cfg = load_yaml_with_includes("eval_lfo_rand.yml")
    return list(_MOD._rand_suite_variants(cfg))


def test_rand_suite_matches_reference_layout():
    variants = _rand_variants()
    labels = [lb for lb, _ in variants]
    prefix = _MOD.RAND_PREFIX
    want = [
        f"{prefix} {cond} {s}".replace("  ", " ")
        for cond in ("", "quasi", "distorted")
        for s in SHAPES + ["all"]
    ] + [f"{prefix} combined symmetrical", f"{prefix} combined all"]
    assert labels == want  # 23 tables, reference eval_lfo_rand.txt order


def test_rand_suite_condition_settings():
    by_label = dict(_rand_variants())

    def ms(label):
        cfg = by_label[f"{_MOD.RAND_PREFIX} {label}"]
        return cfg["data"]["init_args"]["fx_config"]["mod_sig"]

    assert ms("quasi all").get("quasiperiodic") is True
    assert ms("quasi all")["rate_hz"] == {"min": 0.5, "max": 2.0}
    assert ms("distorted all")["exp"] == 2.0
    assert ms("combined all").get("combined") is True
    assert ms("combined all")["rate_hz"] == {"min": 1.0, "max": 3.0}
    assert ms("combined symmetrical")["shapes"] == _MOD.SYMMETRICAL_SHAPES
    # per-shape variants pin exactly one shape; the model block (the
    # RandomLFO baseline) is shared across the whole suite
    assert ms("distorted saw")["shapes"] == ["saw"]
    models = {str(c["model"]) for c in by_label.values()}
    assert len(models) == 1


def test_unseen_audio_groups_layout():
    groups = list(_MOD._unseen_audio_groups())
    assert [g for g, _ in groups] == [
        "ph fixed", "ph varying", "fl fixed", "ch fixed",
        "fl varying", "ch varying",
    ]  # reference eval_lfo_unseen_audio.txt block order
    for group, variants in groups:
        eff, cond = group.split()
        assert [lb for lb, _ in variants] == [
            f"eval {eff} {d} {cond}" for d in _MOD.UNSEEN_DOMAINS
        ]
        for lb, cfg in variants:
            if cfg is None:  # corpus not generated in this checkout
                continue
            domain = lb.split()[2]
            da = cfg["data"]["init_args"]
            assert da["train_dir"] == f"data/unseen_{domain}/val"
            assert da["val_dir"] == f"data/unseen_{domain}/val"


def test_config_groups_quasi_distorted_have_chorus_halves():
    """quasi/distorted must yield the reference's 14-table layout: a
    flanger group and a chorus group of 7 labeled tables each, with the
    chorus group carrying eval_lfo_chorus.yml's pinned delay regime and
    the condition's own mod_sig block unchanged."""
    from mod_extraction_tpu.cli import load_yaml_with_includes

    ch_ref = load_yaml_with_includes("eval_lfo_chorus.yml")
    ch_ref = ch_ref["data"]["init_args"]["fx_config"]["flanger"]
    for name, cond_label in (
        ("eval_lfo_quasi.yml", "quasi "),
        ("eval_lfo_distorted.yml", ""),
    ):
        cfg = load_yaml_with_includes(name)
        groups = _MOD._config_groups(name, cfg, per_shape=True)
        assert len(groups) == 2 and all(len(g) == 7 for g in groups)
        fl, ch = groups
        assert [lb for lb, _ in fl] == [
            f"eval exp 2.0 fl {cond_label}{s}" for s in SHAPES + ["all"]
        ]
        assert [lb for lb, _ in ch] == [
            f"eval exp 2.0 ch {cond_label}{s}" for s in SHAPES + ["all"]
        ]
        for lb, c in ch:
            fx = c["data"]["init_args"]["fx_config"]
            assert fx["flanger"] == ch_ref  # pinned chorus delay regime
            # the condition's mod_sig settings survive the regime swap
            base_ms = cfg["data"]["init_args"]["fx_config"]["mod_sig"]
            if lb.endswith(" all"):
                assert fx["mod_sig"] == base_ms


def test_config_groups_combined_layout():
    from mod_extraction_tpu.cli import load_yaml_with_includes

    cfg = load_yaml_with_includes("eval_lfo_combined.yml")
    groups = _MOD._config_groups("eval_lfo_combined.yml", cfg, per_shape=True)
    assert [[lb for lb, _ in g] for g in groups] == [
        ["eval exp 2.0 fl combined 4 shapes", "eval exp 2.0 fl combined all"],
        ["eval exp 2.0 ch combined 4 shapes", "eval exp 2.0 ch combined all"],
    ]
    sym = dict(groups[0])["eval exp 2.0 fl combined 4 shapes"]
    ms = sym["data"]["init_args"]["fx_config"]["mod_sig"]
    assert ms["shapes"] == _MOD.SYMMETRICAL_SHAPES


def test_em_sim_lstm_ckpts_follow_base_config():
    """The em-sim LSTM rows derive their per-effect ckpt from the base
    config's ckpt_path, so repointing eval_em_sim.yml at a new
    conditioning-extractor model family repoints all three rows."""
    from mod_extraction_tpu.cli import load_yaml_with_includes

    cfg = load_yaml_with_includes("eval_em_sim.yml")
    cfg["ckpt_path"] = "models/lstm_64__lfo_2dcnn_r9__sim_chorus.npz"
    pairs = list(_MOD._em_sim_variants(cfg))
    labels = [label for label, _ in pairs]
    effects = (
        "sim_chorus", "sim_chorus2", "sim_chorus3", "sim_chorus4",
        "sim_flanger", "sim_flanger2", "sim_phaser",
    )
    assert labels == [
        f"{eff}__{kind}" for eff in effects for kind in ("lstm", "rand")
    ]
    by_label = dict(pairs)
    for eff in effects:
        assert by_label[f"{eff}__lstm"]["ckpt_path"] == (
            f"models/lstm_64__lfo_2dcnn_r9__{eff}.npz"
        )
        assert by_label[f"{eff}__rand"]["ckpt_path"] == (
            f"models/rand_baseline__{eff}.npz"
        )


def test_gt_control_block(monkeypatch):
    """SKIPPED-with-a-pointer when a regime's control artifacts are
    absent; once present, one GT table + one rand table per regime
    (sim_chorus and the round-4 sim_chorus2), each via its own
    validate_many call (different tasks).  Both states are simulated via
    os.path.exists so the test is independent of which regenerable
    artifacts exist in this checkout."""
    import os as _os

    real_exists = _os.path.exists
    GT_MARKERS = (
        "sim_chorus_gt", "sim_chorus2_gt", "sim_chorus4_gt",
        "rand_baseline__sim_chorus",
    )

    monkeypatch.setattr(
        _os.path, "exists",
        lambda p: False
        if any(m in str(p) for m in GT_MARKERS)
        else real_exists(p),
    )
    blocks = _MOD.build_gt_control_blocks(None, None)
    assert len(blocks) == 3 and all(b.startswith("SKIPPED") for b in blocks)
    assert "train_em_sim_chorus_gtctrl" in blocks[0]
    assert "train_em_sim_chorus2_gtctrl" in blocks[1]
    assert "train_em_sim_chorus4_gtctrl" in blocks[2]

    monkeypatch.setattr(
        _os.path, "exists",
        lambda p: True
        if any(m in str(p) for m in GT_MARKERS)
        else real_exists(p),
    )
    calls = []

    def fake_validate_many(variants):
        calls.append([lb for lb, _ in variants])
        return [(lb, {"esr": 0.2, "l1": 0.02}) for lb, _ in variants]

    blocks = _MOD.build_gt_control_blocks(
        fake_validate_many, lambda m: f"TABLE({sorted(m)})"
    )
    assert calls == [["gt"], ["rand"]] * 3
    assert len(blocks) == 6
    assert blocks[1].splitlines()[-1] == "sim_chorus gt control"
    assert blocks[3].splitlines()[-1] == "sim_chorus2 gt control"
    assert blocks[5].splitlines()[-1] == "sim_chorus4 gt control"
    cfgs = []

    def grab_validate_many(variants):
        cfgs.extend(variants)
        return [(lb, {}) for lb, _ in variants]

    _MOD.build_gt_control_blocks(grab_validate_many, lambda m: "T")
    assert [lb for lb, _ in cfgs] == ["gt", "rand"] * 3
    gt1, rand1, gt2, rand2, gt4, rand4 = (c for _, c in cfgs)
    for gt in (gt1, gt2, gt4):
        assert gt["model"]["init_args"]["lfo_model"] is None
    assert gt1["ckpt_path"].endswith("gt_mod_sig__sim_chorus_gt.npz")
    assert gt2["ckpt_path"].endswith("gt_mod_sig__sim_chorus2_gt.npz")
    assert gt4["ckpt_path"].endswith("gt_mod_sig__sim_chorus4_gt.npz")
    assert rand1["ckpt_path"].endswith("rand_baseline__sim_chorus.npz")
    assert rand2["ckpt_path"].endswith("rand_baseline__sim_chorus2.npz")
    assert rand4["ckpt_path"].endswith("rand_baseline__sim_chorus4.npz")
    for rand in (rand1, rand2, rand4):
        assert rand["model"]["init_args"]["lfo_model"]["class_path"].endswith(
            "RandomLFO"
        )


def test_em_sim_blocks_isolate_missing_effects(tmp_path, monkeypatch):
    """One missing corpus/checkpoint skips only its own block; healthy
    effects still produce their paired lstm/rand tables (the archive
    must never collapse to a single FAILED block)."""
    from mod_extraction_tpu.cli import load_yaml_with_includes

    cfg = load_yaml_with_includes("eval_em_sim.yml")

    calls = []

    def fake_validate_many(variants):
        calls.append([lb for lb, _ in variants])
        return [(lb, {"esr": 0.1, "l1": 0.01}) for lb, _ in variants]

    def fake_table(metrics):
        return f"TABLE({sorted(metrics)})"

    # fake every corpus + checkpoint present (they are regenerable
    # artifacts, not guaranteed in a fresh checkout) -> paired blocks
    import os as _os

    real_isdir, real_isfile = _os.path.isdir, _os.path.isfile

    def all_present(missing_marker=None):
        monkeypatch.setattr(
            _os.path, "isdir",
            lambda p: False
            if missing_marker and missing_marker in str(p)
            else (True if "data/sim_" in str(p) else real_isdir(p)),
        )
        monkeypatch.setattr(
            _os.path, "isfile",
            lambda p: True if str(p).startswith("models/") else real_isfile(p),
        )

    all_present()
    blocks = _MOD.build_em_sim_blocks(cfg, fake_validate_many, fake_table)
    effects = [e for e, _ in _MOD.EM_SIM_EFFECTS]
    assert [b.splitlines()[-1] for b in blocks[1::2]] == effects
    assert len(blocks) == 2 * len(effects)
    # the lstm variants went through ONE grouped call
    assert calls[0] == [f"{e}__lstm" for e in effects]

    # remove one effect's corpus: only its block becomes SKIPPED
    all_present(missing_marker="sim_flanger2")
    blocks = _MOD.build_em_sim_blocks(cfg, fake_validate_many, fake_table)
    skipped = [b for b in blocks if b.startswith("SKIPPED")]
    assert len(skipped) == 1 and "sim_flanger2" in skipped[0]
    assert len(blocks) == 2 * (len(effects) - 1) + 1

    # a rand-variant failure for one effect leaves the others intact
    all_present()

    def flaky_validate_many(variants):
        if any(lb == "sim_phaser__rand" for lb, _ in variants):
            raise RuntimeError("boom")
        return fake_validate_many(variants)

    blocks = _MOD.build_em_sim_blocks(cfg, flaky_validate_many, fake_table)
    failed = [b for b in blocks if b.startswith("FAILED")]
    assert len(failed) == 1 and "sim_phaser" in failed[0]
    assert sum(1 for b in blocks if b.startswith("TABLE")) >= 3


def test_h160_capacity_block(monkeypatch):
    """The LSTM-160 capacity bracket (round-4, VERDICT r3 #5 second
    arm): SKIPPED-with-a-pointer until both checkpoints exist; once
    present, one conditioned table + one rand table, each via its own
    validate_many call, with the rand config carrying n_hidden=160 and a
    RandomLFO conditioning model."""
    import os as _os

    real_exists = _os.path.exists
    MARKERS = ("lstm_160__", "rand_baseline_160__")

    monkeypatch.setattr(
        _os.path, "exists",
        lambda p: False
        if any(m in str(p) for m in MARKERS)
        else real_exists(p),
    )
    blocks = _MOD.build_h160_capacity_blocks(None, None)
    assert len(blocks) == 1 and blocks[0].startswith("SKIPPED")
    assert "train_em_sim_chorus_h160" in blocks[0]

    monkeypatch.setattr(
        _os.path, "exists",
        lambda p: True
        if any(m in str(p) for m in MARKERS)
        else real_exists(p),
    )
    calls, cfgs = [], []

    def fake_validate_many(variants):
        calls.append([lb for lb, _ in variants])
        cfgs.extend(variants)
        return [(lb, {"esr": 0.3, "l1": 0.03}) for lb, _ in variants]

    blocks = _MOD.build_h160_capacity_blocks(
        fake_validate_many, lambda m: f"TABLE({sorted(m)})"
    )
    assert calls == [["h160"], ["h160 rand"]]
    assert len(blocks) == 2
    assert blocks[1].splitlines()[-1] == "sim_chorus h160 capacity bracket"
    lstm_cfg = cfgs[0][1]
    rand_cfg = cfgs[1][1]
    for c in (lstm_cfg, rand_cfg):
        em = c["model"]["init_args"]["effect_model"]["init_args"]
        assert em["n_hidden"] == 160
    assert lstm_cfg["ckpt_path"].endswith(
        "lstm_160__lfo_2dcnn_r6__sim_chorus.npz"
    )
    # the rand arm conditions on a RandomLFO model, not the extractor
    rand_lfo = rand_cfg["model"]["init_args"]["lfo_model"]
    assert "RandomLFO" in str(rand_lfo)
    assert rand_cfg["ckpt_path"].endswith("rand_baseline_160__sim_chorus.npz")


def test_chorus3_s2_block(monkeypatch):
    """The round-5 seed-replication block: SKIPPED with a config pointer
    until both s2 checkpoints exist; once present, one lstm table + one
    rand table under the SAME eval protocol as the main chorus3 block
    (eval_em_sim.yml base, sim_chorus3 val corpus), the rand arm
    switched to the RandomLFO conditioning with post-processing off."""
    import os as _os

    from mod_extraction_tpu.cli import load_yaml_with_includes

    cfg = load_yaml_with_includes("eval_em_sim.yml")
    real_exists = _os.path.exists
    MARKERS = ("sim_chorus3_s2.npz",)

    monkeypatch.setattr(
        _os.path, "exists",
        lambda p: False
        if any(m in str(p) for m in MARKERS)
        else real_exists(p),
    )
    blocks = _MOD.build_chorus3_s2_blocks(None, None, None)
    assert len(blocks) == 1 and blocks[0].startswith("SKIPPED")
    assert "train_em_sim_chorus3_s2" in blocks[0]

    monkeypatch.setattr(
        _os.path, "exists",
        lambda p: True
        if any(m in str(p) for m in MARKERS)
        else real_exists(p),
    )
    calls, cfgs = [], []

    def fake_validate_many(variants):
        calls.append([lb for lb, _ in variants])
        cfgs.extend(variants)
        return [(lb, {"esr": 0.4, "l1": 0.04}) for lb, _ in variants]

    blocks = _MOD.build_chorus3_s2_blocks(
        cfg, fake_validate_many, lambda m: f"TABLE({sorted(m)})"
    )
    assert calls == [["c3s2"], ["c3s2 rand"]]
    assert len(blocks) == 2
    assert blocks[1].splitlines()[-1] == "sim_chorus3 seed-2 replication"
    lstm_cfg, rand_cfg = cfgs[0][1], cfgs[1][1]
    for c in (lstm_cfg, rand_cfg):
        da = c["data"]["init_args"]
        assert da["dry_val_dir"] == "data/sim_chorus3/val/dry"
        assert da["wet_val_dir"] == "data/sim_chorus3/val/wet"
    assert lstm_cfg["ckpt_path"].endswith(
        "lstm_64__lfo_2dcnn_r6__sim_chorus3_s2.npz"
    )
    assert rand_cfg["ckpt_path"].endswith("rand_baseline__sim_chorus3_s2.npz")
    assert "RandomLFO" in str(rand_cfg["model"]["init_args"]["lfo_model"])
    assert rand_cfg["model"]["init_args"]["model_smooth_n_frames"] == 0
