"""Write preprocessed (dry, wet, mod_sig, fx_params) triplets to disk
(the recipe the reference keeps commented in `scripts/scratch.py:117-162`;
consumed by the `preproc` / `random_preproc` datasets).

The wet signal is rendered with the on-device kernels in large batches —
this is the TPU replacement for the reference's overnight host-CPU
flanger pre-rendering runs.

Usage:
  python scripts/generate_preproc_datasets.py configs/data/gen_idmt_fl.yml out_dir [n_examples]
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

if __name__ == "__main__":
    import jax

    from mod_extraction_tpu.cli import load_yaml_with_includes, _filter_kwargs
    from mod_extraction_tpu.data.modules import DATA_MODULE_REGISTRY
    from mod_extraction_tpu.data.loader import Loader
    from mod_extraction_tpu.data.wav import wav_write
    from mod_extraction_tpu.train.render import render_batch

    cfg_path = sys.argv[1]
    out_dir = sys.argv[2]
    n_examples = int(sys.argv[3]) if len(sys.argv) > 3 else None

    cfg = load_yaml_with_includes(cfg_path)
    data_cfg = cfg["data"] if "data" in cfg else cfg
    dm_cls = DATA_MODULE_REGISTRY[data_cfg["class_path"]]
    args = dict(data_cfg.get("init_args") or {})
    if n_examples is not None:
        args["train_num_examples_per_epoch"] = n_examples
    dm = dm_cls(**_filter_kwargs(dm_cls, args))
    dm.setup("fit")
    corpus = dm.corpus_payload()  # None unless device_corpus: true
    os.makedirs(out_dir, exist_ok=True)

    loader = Loader(dm.train_dataset, dm.batch_size, seed=int(cfg.get("seed_everything", 42)))
    sr = int(dm.render_cfg.sr)
    count = 0
    for batch in loader.epoch(0):
        dry, wet, mod, fx = render_batch(batch, dm.render_cfg, corpus)
        dry, wet, mod = (np.asarray(a) for a in (dry, wet, mod))
        fx_np = {k: np.asarray(v) for k, v in fx.items()}
        for i in range(dry.shape[0]):
            h = hashlib.sha1(dry[i].tobytes()).hexdigest()[:16]
            wav_write(os.path.join(out_dir, f"{h}_dry.wav"), dry[i], sr)
            wav_write(os.path.join(out_dir, f"{h}_wet.wav"), wet[i], sr)
            fx_params = np.array(
                {k: np.asarray(v[i]).item() for k, v in fx_np.items()},
                dtype=object,
            )
            np.savez(
                os.path.join(out_dir, f"{h}.npz"),
                mod_sig=mod[i],
                fx_params=fx_params,
            )
            count += 1
        print(f"{count} examples written")
