"""Config-driven CLI: `fit` / `validate` from reference-style YAML.

Replaces `CustomLightningCLI` (`mod_extraction/cli.py:21-167`) without
Lightning/jsonargparse.  Kept behaviors:

* `class_path`/`init_args` instantiation with FILE-REFERENCE composition
  (a string value ending in .yml is loaded as a nested config —
  `train_lfo_interwoven_all.yml:16,21,31`),
* the `custom.*` namespace (project/model/dataset names, CPU fallback
  sizes) from `configs/cli_config.yml:1-15`,
* best-effort argument linking: `data.n_samples`/`data.sr` are copied
  into nested model configs when the target accepts them
  (`cli.py:71-107`, link table `configs/cli_config.yml:21-45`),
* CPU fallback: when running on the CPU backend, batch size and epoch
  sizes shrink to the `custom.cpu_*` values (`cli.py:128-143`),
* run naming `{model_name}__{dataset_name}` (`cli.py:145-150`),
* `seed_everything` -> the PRNG seed for data, init, and masking.

Reference torch class paths resolve to our TPU-native classes, so the
reference's experiment YAML grid runs unmodified (minus Lightning
trainer-internals keys, which are ignored with a log line).
"""

from __future__ import annotations

import inspect
import logging
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import optax
import yaml

from mod_extraction_tpu.data.modules import DATA_MODULE_REGISTRY
from mod_extraction_tpu.models import (
    LSTMEffectModel,
    RandomLFO,
    Spectral2DCNN,
    SpectralDSTCN,
    SpectralTCN,
)
from mod_extraction_tpu.paths import CONFIGS_DIR
from mod_extraction_tpu.train.lfo_task import LFOExtractionTask
from mod_extraction_tpu.train.loop import Trainer
from mod_extraction_tpu.train.tbptt_task import TBPTTEffectModelingTask

log = logging.getLogger(__name__)

MODEL_REGISTRY = {
    "mod_extraction.models.Spectral2DCNN": Spectral2DCNN,
    "mod_extraction.models.SpectralTCN": SpectralTCN,
    "mod_extraction.models.SpectralDSTCN": SpectralDSTCN,
    "mod_extraction.models.LSTMEffectModel": LSTMEffectModel,
    "mod_extraction.models.RandomLFO": RandomLFO,
    "Spectral2DCNN": Spectral2DCNN,
    "SpectralTCN": SpectralTCN,
    "SpectralDSTCN": SpectralDSTCN,
    "LSTMEffectModel": LSTMEffectModel,
    "RandomLFO": RandomLFO,
}

TASK_PATHS_LFO = (
    "mod_extraction.lightning.LFOExtraction",
    "LFOExtraction",
)
TASK_PATHS_TBPTT = (
    "mod_extraction.lightning.TBPTTLFOEffectModeling",
    "TBPTTEffectModeling",
)

# model config keys that are tuples in our flax modules
_TUPLE_KEYS = {"kernel_size", "pool_size"}
_LIST_KEYS = {"out_channels", "bin_dilations", "temp_dilations", "dilations", "strides"}


def load_yaml_with_includes(path: str, base_dir: Optional[str] = None) -> Any:
    """Load YAML; any string value ending in .yml/.yaml is itself loaded
    (relative to the including file, the configs dir, or the repo root)."""
    path = resolve_config_path(path, base_dir)
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return _resolve_includes(cfg, os.path.dirname(path))


def resolve_config_path(path: str, base_dir: Optional[str] = None) -> str:
    candidates = []
    if os.path.isabs(path):
        candidates.append(path)
    else:
        if base_dir:
            candidates.append(os.path.join(base_dir, path))
        candidates.append(path)
        candidates.append(os.path.join(CONFIGS_DIR, path))
        # reference configs use ../configs/... relative to scripts/
        candidates.append(os.path.join(CONFIGS_DIR, os.path.basename(path)))
    for c in candidates:
        if os.path.isfile(c):
            return c
    raise FileNotFoundError(f"config not found: {path} (tried {candidates})")


_SCI_FLOAT_RE = re.compile(r"^[+-]?\d+(\.\d*)?[eE][+-]?\d+$")


def _resolve_includes(node: Any, base_dir: str) -> Any:
    if isinstance(node, str) and node.endswith((".yml", ".yaml")):
        try:
            return load_yaml_with_includes(node, base_dir)
        except FileNotFoundError:
            return node  # plain string that happens to end in .yml
    if isinstance(node, str) and _SCI_FLOAT_RE.match(node):
        # PyYAML leaves exponent-without-decimal-point literals like
        # `1e-4` as strings (YAML 1.1 float grammar); configs mean floats
        return float(node)
    if isinstance(node, dict):
        return {k: _resolve_includes(v, base_dir) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_includes(v, base_dir) for v in node]
    return node


def _filter_kwargs(cls, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    sig = inspect.signature(cls.__init__)
    accepted = set(sig.parameters)
    dropped = [k for k in kwargs if k not in accepted]
    if dropped:
        log.info("%s: ignoring config keys %s", cls.__name__, dropped)
    return {k: v for k, v in kwargs.items() if k in accepted}


def build_model(cfg: Dict[str, Any], data_links: Dict[str, Any]):
    """Instantiate a model from {class_path, init_args}, linking n_samples/sr
    from the data config when the model accepts them (`cli.py:71-107`)."""
    cls = MODEL_REGISTRY[cfg["class_path"]]
    args = dict(cfg.get("init_args") or {})
    for key in ("n_samples", "sr"):
        if key in data_links and key not in args:
            args[key] = data_links[key]
    for k in list(args):
        if k in _TUPLE_KEYS and isinstance(args[k], list):
            args[k] = tuple(args[k])
        elif k in _LIST_KEYS and isinstance(args[k], list):
            args[k] = tuple(args[k])
    if cls is RandomLFO and isinstance(args.get("shapes"), list):
        args["shapes"] = tuple(args["shapes"])
    return cls(**_filter_kwargs(cls, args))


def build_lr(cfg: Optional[Dict[str, Any]]):
    """Constant lr, or an optax schedule when `optimizer.lr_schedule` is
    set — a framework extension (the reference trains at constant lr
    only; its CLI has no scheduler hookup).  Schedule config:

        lr_schedule:
          name: cosine | linear   # warmup then decay to end_lr
          warmup_steps: 0         # linear ramp 0 -> lr
          decay_steps: N          # REQUIRED; total optimizer updates
          end_lr: 0.0

    `decay_steps` counts OPTIMIZER UPDATES, not batches: a TBPTT task
    steps the optimizer once per 1024-sample chunk (~85x per batch,
    `train/tbptt_task.py`), so size it accordingly."""
    args = (cfg or {}).get("init_args") or {}
    lr = float(args.get("lr", 1e-4))
    sched = (cfg or {}).get("lr_schedule")
    if not sched:
        return lr
    name = str(sched.get("name", "cosine")).lower()
    warmup = int(sched.get("warmup_steps", 0))
    decay = int(sched["decay_steps"])
    end = float(sched.get("end_lr", 0.0))
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=lr if warmup == 0 else 0.0,
            peak_value=lr, warmup_steps=warmup, decay_steps=decay,
            end_value=end,
        )
    if name == "linear":
        ramp = optax.linear_schedule(0.0 if warmup else lr, lr, max(warmup, 1))
        tail = optax.linear_schedule(lr, end, max(decay - warmup, 1))
        return optax.join_schedules([ramp, tail], [warmup])
    raise KeyError(f"Unknown lr_schedule name: {name}")


def build_optimizer(cfg: Optional[Dict[str, Any]]) -> optax.GradientTransformation:
    """torch.optim.* -> optax (reference default `configs/opt/adam_w.yml`)."""
    if cfg is None:
        return optax.adamw(1e-4, b1=0.8, b2=0.99)
    path = cfg.get("class_path", "torch.optim.AdamW")
    args = cfg.get("init_args") or {}
    lr = build_lr(cfg)
    betas = args.get("betas", (0.8, 0.99))
    wd = float(args.get("weight_decay", 0.01))
    name = path.rsplit(".", 1)[-1].lower()
    if name == "adamw":
        return optax.adamw(lr, b1=float(betas[0]), b2=float(betas[1]), weight_decay=wd)
    if name == "adam":
        return optax.adam(lr, b1=float(betas[0]), b2=float(betas[1]))
    if name == "sgd":
        return optax.sgd(lr, momentum=float(args.get("momentum", 0.0)))
    raise KeyError(f"Unknown optimizer: {path}")


def _load_lfo_weights(model, weights_path: str, example_in_ch: int, n_samples: int):
    """Load frozen extractor weights: .npz (ours) or .pt (reference)."""
    import numpy as np

    if weights_path.endswith(".npz"):
        from mod_extraction_tpu.train.checkpoints import load_weights

        return {"params": load_weights(weights_path)}
    if weights_path.endswith(".pt"):
        import torch

        from mod_extraction_tpu.models.torch_port import port_spectral_2dcnn

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in sd.items()}
        n_layers = len(model._channels())
        return {"params": jax.tree.map(np.asarray, port_spectral_2dcnn(sd, n_layers))}
    raise ValueError(f"unsupported weights format: {weights_path}")


def build_data_module(
    data_cfg: Dict[str, Any], custom: Dict[str, Any], seed: int
) -> Tuple[Any, Dict[str, Any]]:
    """Instantiate a data module from {class_path, init_args}, applying
    the CPU fallback (`cli.py:128-143`); returns (module, data_links)."""
    data_args = dict(data_cfg.get("init_args") or {})

    if jax.default_backend() == "cpu":
        cpu_bs = int(custom.get("cpu_batch_size", 5))
        cpu_train = int(custom.get("cpu_train_num_examples_per_epoch", 10))
        cpu_val = int(custom.get("cpu_val_num_examples_per_epoch", 5))
        log.info("CPU backend: batch_size=%d, epochs sizes=%d/%d",
                 cpu_bs, cpu_train, cpu_val)
        data_args["batch_size"] = cpu_bs
        for k, v in (
            ("train_num_examples_per_epoch", cpu_train),
            ("val_num_examples_per_epoch", cpu_val),
        ):
            if k in data_args:
                data_args[k] = v
        if "shared_train_args" in data_args:
            data_args["shared_train_args"]["num_examples_per_epoch"] = cpu_train
        if "shared_val_args" in data_args:
            data_args["shared_val_args"]["num_examples_per_epoch"] = cpu_val

    dm_cls = DATA_MODULE_REGISTRY[data_cfg["class_path"]]
    data_args.setdefault("seed", seed)
    data_module = dm_cls(**_filter_kwargs(dm_cls, data_args))

    shared = data_args.get("shared_args") or {}
    data_links = {
        "n_samples": data_args.get("n_samples", shared.get("n_samples")),
        "sr": data_args.get("sr", shared.get("sr")),
    }
    return data_module, {k: v for k, v in data_links.items() if v is not None}


class RunConfig:
    """Parsed experiment config + instantiated objects."""

    def __init__(self, cfg: Dict[str, Any]):
        self.raw = cfg
        self.seed = int(cfg.get("seed_everything", 42))
        custom = cfg.get("custom") or {}
        self.project_name = custom.get("project_name", "mod_extraction_tpu")
        self.model_name = custom.get("model_name", "model")
        self.dataset_name = custom.get("dataset_name", "dataset")
        self.run_name = f"{self.model_name}__{self.dataset_name}"
        trainer_cfg = cfg.get("trainer") or {}
        self.max_epochs = int(trainer_cfg.get("max_epochs", 1))
        self.ckpt_path = cfg.get("ckpt_path")

        self.data_module, self.data_links = build_data_module(
            dict(cfg["data"]), custom, self.seed
        )

        self.optimizer = build_optimizer(cfg.get("optimizer"))
        self.lr = build_lr(cfg.get("optimizer"))  # float or schedule fn
        self.task = self._build_task(dict(cfg["model"]))

    def _build_task(self, model_cfg: Dict[str, Any]):
        path = model_cfg["class_path"]
        args = dict(model_cfg.get("init_args") or {})
        render_cfg = self.data_module.render_cfg

        if path in TASK_PATHS_LFO:
            model = build_model(args.pop("model"), self.data_links)
            return LFOExtractionTask(
                model=model,
                render_cfg=render_cfg,
                optimizer=self.optimizer,
                use_dry=args.get("use_dry", True),
                model_smooth_n_frames=args.get("model_smooth_n_frames", 4),
                should_stretch=args.get("should_stretch", False),
                max_n_corners=args.get("max_n_corners", 16),
                stretch_smooth_n_frames=args.get("stretch_smooth_n_frames", 0),
                sub_batch_size=args.get("sub_batch_size"),
                loss_dict=args.get("loss_dict"),
            )
        if path in TASK_PATHS_TBPTT:
            effect_model = build_model(args.pop("effect_model"), self.data_links)
            lfo_model = None
            lfo_params = None
            lfo_cfg = args.pop("lfo_model", None)
            if lfo_cfg is not None:
                lfo_model = build_model(lfo_cfg, self.data_links)
                wp = args.get("lfo_model_weights_path")
                if wp and not isinstance(lfo_model, RandomLFO):
                    lfo_params = _load_lfo_weights(
                        lfo_model, wp, 2, render_cfg.n_samples
                    )
                elif not isinstance(lfo_model, RandomLFO):
                    # init random weights (an unfrozen/untrained extractor)
                    in_ch = 2 if args.get("use_dry", True) else 1
                    import jax.numpy as jnp

                    lfo_params = lfo_model.init(
                        jax.random.PRNGKey(self.seed),
                        jnp.zeros((1, in_ch, render_cfg.n_samples)),
                    )
            param_cfg = args.pop("param_model", None)
            param_model = (
                build_model(param_cfg, self.data_links) if param_cfg else None
            )
            return TBPTTEffectModelingTask(
                effect_model=effect_model,
                render_cfg=render_cfg,
                warmup_n_samples=args.get("warmup_n_samples", 1024),
                step_n_samples=args.get("step_n_samples", 1024),
                lfo_model=lfo_model,
                lfo_params=lfo_params,
                freeze_lfo_model=args.get("freeze_lfo_model", True),
                param_model=param_model,
                optimizer=self.optimizer,
                use_dry=args.get("use_dry", True),
                model_smooth_n_frames=args.get("model_smooth_n_frames", 8),
                should_stretch=args.get("should_stretch", True),
                max_n_corners=args.get("max_n_corners", 16),
                stretch_smooth_n_frames=args.get("stretch_smooth_n_frames", 0),
                discard_invalid_lfos=args.get("discard_invalid_lfos", True),
                loss_dict=args.get("loss_dict"),
            )
        raise KeyError(f"Unknown task class_path: {path}")


def _media_callback_for(run: "RunConfig"):
    """LogSpecAndModSig / LogAudio callback analog (`callbacks.py:37-184`),
    enabled via `custom.log_media` (media goes to out/<run>_media/)."""
    if not (run.raw.get("custom") or {}).get("log_media", False):
        return None
    from mod_extraction_tpu.utils.plotting import (
        em_media_callback,
        lfo_media_callback,
    )

    if isinstance(run.task, TBPTTEffectModelingTask):
        return em_media_callback()
    return lfo_media_callback()


def fit(config_path: str, out_dir: str = "out", resume: bool = False,
        max_epochs: Optional[int] = None):
    cfg = load_yaml_with_includes(config_path)
    run = RunConfig(cfg)
    custom = run.raw.get("custom") or {}
    # `custom.init_weights_path`: warm-start a fresh run from a bare
    # models/*.npz (or reference .pt) export — e.g. continuing a training
    # whose out/ checkpoint dir was cleaned.  `resume` still wins.
    warm_start = None
    init_wp = custom.get("init_weights_path")
    if init_wp and isinstance(run.task, LFOExtractionTask):
        # lazy: loaded only if no resumable `last` checkpoint exists
        warm_start = lambda: _load_lfo_weights(  # noqa: E731
            run.task.model, init_wp, 2, run.data_module.render_cfg.n_samples
        )
    elif init_wp and isinstance(run.task, TBPTTEffectModelingTask) \
            and not run.task.multi_params:
        # bare effect-model export (models/lstm_64__*.npz) -> the simple
        # TBPTT state's params tree, same shape `_load_eval_state` restores.
        # .pt here would hit the Spectral2DCNN porting path with no model
        # — convert reference LSTMs first (scripts/import_reference_weights.py)
        if not init_wp.endswith(".npz"):
            raise ValueError(
                "TBPTT custom.init_weights_path must be a .npz effect-model "
                f"export (got {init_wp}); convert reference .pt weights with "
                "scripts/import_reference_weights.py first"
            )
        warm_start = lambda: _load_lfo_weights(  # noqa: E731
            None, init_wp, 2, run.data_module.render_cfg.n_samples
        )
    elif init_wp:
        log.warning(
            "custom.init_weights_path needs a single-param-tree task; "
            "ignored for %s (TBPTT with param/lfo params resumes from "
            "Orbax checkpoints only)",
            type(run.task).__name__,
        )
    display_lr = run.lr
    if callable(run.lr):
        # the schedule advances once per OPTIMIZER update; the step log
        # counts batches, so rescale for TBPTT's ~85 inner updates/batch
        upb = 1
        if isinstance(run.task, TBPTTEffectModelingTask):
            upb = run.task.updates_per_batch
        display_lr = lambda step, _f=run.lr, _u=upb: float(_f(step * _u))  # noqa: E731
    trainer = Trainer(
        run.task,
        run.data_module,
        max_epochs=max_epochs if max_epochs is not None else run.max_epochs,
        out_dir=out_dir,
        run_name=run.run_name,
        seed=run.seed,
        resume=resume,
        media_callback=_media_callback_for(run),
        media_every_n_epochs=int(custom.get("media_every_n_epochs", 10)),
        steps_per_dispatch=int(custom.get("steps_per_dispatch", 1)),
        log_every_n_steps=int(custom.get("log_every_n_steps", 50)),
        lr=display_lr,
        profile_dir=custom.get("profile_dir"),
        warm_start_params=warm_start,
    )
    return trainer.fit()


def _load_eval_state(run: RunConfig, trainer: Trainer, ckpt_path: Optional[str]):
    """Build the task state for validation, restoring `ckpt_path` if set
    (bare models/*.npz / reference .pt, or an Orbax checkpoint dir)."""
    if not getattr(run.task, "has_params", True):
        return None  # RandomLFO extractor baseline: nothing to restore
    state = run.task.init_state(jax.random.PRNGKey(run.seed))
    if ckpt_path and ckpt_path.endswith((".npz", ".pt")):
        # bare-weights checkpoint (models/*.npz, the reference's `.pt`
        # analog) -> replace the task model's params
        if os.path.isfile(ckpt_path):
            model = getattr(run.task, "model", None)
            loaded = _load_lfo_weights(
                model, ckpt_path, 2, run.data_module.render_cfg.n_samples
            )
            state = state.replace(params=loaded)
        else:
            log.warning(
                "ckpt_path %s not found; validating with random init", ckpt_path
            )
    elif ckpt_path:
        restored = trainer.ckpts.restore(ckpt_path, state)
        if restored is not None:
            state = restored
    return state


def validate(config_path: str, out_dir: str = "out",
             state_override: Any = None) -> Dict[str, float]:
    """Validation run that prints an eval table (reference
    `scripts/validate.py` + the archived `eval/*.txt` format)."""
    cfg = load_yaml_with_includes(config_path)
    run = RunConfig(cfg)
    trainer = Trainer(
        run.task, run.data_module, out_dir=out_dir,
        run_name=run.run_name + "_eval", seed=run.seed,
        media_callback=_media_callback_for(run),
    )
    state = state_override
    if state is None:
        state = _load_eval_state(run, trainer, run.ckpt_path)
    metrics = trainer.validate(state)

    if (run.raw.get("custom") or {}).get("save_latents", False) and hasattr(
        run.task, "_extract"
    ):
        # dump Spectral2DCNN latents of one val batch for
        # scripts/latent_space_visualizations.py (PCA per effect class)
        import numpy as np

        from mod_extraction_tpu.paths import ensure_dir
        from mod_extraction_tpu.train.render import render_batch

        run.data_module.setup("validate")
        batch = next(run.data_module.val_loader().epoch(0))
        dry, wet, _, fx = render_batch(batch, run.task.render_cfg, trainer.corpus)
        params = state.params if hasattr(state, "params") else state
        _, latent = run.task._extract(
            params, dry, wet, fx, jax.random.PRNGKey(0), train=False
        )
        latents_dir = ensure_dir(os.path.join(out_dir, "latents"))
        np.save(
            os.path.join(latents_dir, f"{run.dataset_name}.npy"),
            np.asarray(latent),
        )

    from mod_extraction_tpu.evaluation.tables import format_validate_table

    print(format_validate_table({f"val/{k}": v for k, v in metrics.items()}))
    return metrics


def validate_many(
    variants: list, out_dir: str = "out"
) -> list:
    """Validate several (label, cfg) variants of ONE experiment config
    while reusing the compiled task.

    The jitted val step caches on the task instance, so rebuilding the
    task per variant (what looping `validate` does) recompiles the whole
    step — minutes per variant on remote-TPU hosts.  Here the task is
    built once from the first cfg; each variant may swap the DATA block
    (e.g. per-shape LFO sweeps) and/or `ckpt_path` (e.g. the em-sim
    suite's per-effect checkpoints).  All variants must produce the same
    RenderConfig (asserted) — that is what makes the step reusable.

    Returns [(label, metrics), ...]."""
    assert variants
    results = []
    run: Optional[RunConfig] = None
    first_model_cfg = None
    state = None
    last_ckpt: Any = object()  # sentinel != any real path/None
    for label, cfg in variants:
        custom = cfg.get("custom") or {}
        if run is None:
            run = RunConfig(cfg)
            dm = run.data_module
            first_model_cfg = cfg.get("model")
        else:
            # only data/ckpt may vary: the task (model block) is REUSED,
            # so silently differing model configs would yield tables for
            # the wrong model
            assert cfg.get("model") == first_model_cfg, (
                f"variant {label!r} changes the model block; it needs its "
                "own validate()/validate_many() run"
            )
            dm, _ = build_data_module(dict(cfg["data"]), custom, run.seed)
            assert dm.render_cfg == run.task.render_cfg, (
                f"variant {label!r} changes the render config; it needs its "
                "own validate() run"
            )
        trainer = Trainer(
            run.task, dm, out_dir=out_dir,
            run_name=run.run_name + "_eval", seed=run.seed,
            media_callback=_media_callback_for(run),
        )
        ckpt = cfg.get("ckpt_path")
        if ckpt != last_ckpt:
            run.data_module = dm  # _load_eval_state reads render_cfg off it
            state = _load_eval_state(run, trainer, ckpt)
            last_ckpt = ckpt
        results.append((label, trainer.validate(state)))
    return results
