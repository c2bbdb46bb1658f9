from mod_extraction_tpu.models.spectral_2dcnn import Spectral2DCNN
from mod_extraction_tpu.models.tcn import TCN, TCNBlock, FiLM, SpectralTCN, SpectralDSTCN
from mod_extraction_tpu.models.lstm import LSTMEffectModel, lstm_init_state
from mod_extraction_tpu.models.random_lfo import RandomLFO

__all__ = [
    "Spectral2DCNN",
    "TCN",
    "TCNBlock",
    "FiLM",
    "SpectralTCN",
    "SpectralDSTCN",
    "LSTMEffectModel",
    "lstm_init_state",
    "RandomLFO",
]
