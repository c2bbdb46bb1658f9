"""The em-sim migration config generator must emit configs that build —
the unattended post-lineage chain (scripts/em_sim_final_chain.sh) runs
them without a human in the loop."""

import glob
import os
import sys

import pytest

from mod_extraction_tpu.paths import ROOT_DIR

sys.path.insert(0, os.path.join(ROOT_DIR, "scripts"))

from gen_em_sim_migration import generate  # noqa: E402

RN = "rtest"


@pytest.fixture()
def generated_configs():
    pattern = os.path.join(ROOT_DIR, "configs", f"train_em_sim_*_{RN}.yml")
    generate(RN)
    paths = sorted(glob.glob(pattern))
    try:
        yield paths
    finally:
        for p in paths:
            os.remove(p)


def test_generated_migration_configs_build(generated_configs, tmp_path):
    import jax
    import jax.numpy as jnp

    from mod_extraction_tpu.cli import RunConfig, load_yaml_with_includes
    from mod_extraction_tpu.models import Spectral2DCNN
    from mod_extraction_tpu.train.checkpoints import save_weights

    # flanger, phaser, chorus, flanger2 + the round-5 chorus family
    assert len(generated_configs) == 7

    model = Spectral2DCNN(
        in_ch=2, n_samples=88200, sr=44100, n_fft=1024, hop_len=256,
        n_mels=256, out_channels=(64,) * 6, temp_dilations=(1, 1, 2, 4, 8, 16),
        pool_size=(2, 1),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 88200)))
    weights = str(tmp_path / "lfo.npz")
    save_weights(weights, params["params"])

    seen_effects = set()
    for path in generated_configs:
        cfg = load_yaml_with_includes(path)
        margs = cfg["model"]["init_args"]
        # the new extractor npz does not exist until the lineage ships;
        # swap in a freshly initialised one (same shape contract)
        assert margs["lfo_model_weights_path"].endswith(f"_live_{RN}.npz")
        margs["lfo_model_weights_path"] = weights
        # the warm start must point at a SHIPPED (committed) npz
        warm = cfg["custom"]["init_weights_path"]
        assert os.path.isfile(os.path.join(ROOT_DIR, warm)), warm
        run = RunConfig(cfg)
        assert run.task is not None and run.data_module is not None
        effect = cfg["custom"]["dataset_name"]
        seen_effects.add(effect)
        # data dirs must be the effect's own corpus
        assert f"data/{effect}/" in cfg["data"]["init_args"]["dry_train_dir"]
    assert seen_effects == {
        "sim_flanger", "sim_phaser", "sim_chorus", "sim_flanger2",
        "sim_chorus2", "sim_chorus3", "sim_chorus4",
    }
