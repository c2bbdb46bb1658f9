"""mod_extraction_tpu — TPU-native framework for LFO modulation extraction.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
christhetree/mod_extraction (DAFx23, arXiv:2305.13262):

* On-device synthesis of LFO-driven audio effects (phaser / flanger /
  chorus / tremolo) fused into the jitted training step.
* Mel-spectrogram 2D-CNN LFO-extraction models.
* Conditional LSTM black-box effect models trained with TBPTT.
* Streaming (real-time) inference with explicit state pytrees.

Design stance (vs. the torch/Lightning reference):
pure functions + pytrees, explicit PRNG key threading, `lax.scan` for
sample-rate recurrences, Pallas kernels for the hot DSP loops, and
`jax.sharding`-based data parallelism over a device mesh.
"""

__version__ = "0.1.0"
