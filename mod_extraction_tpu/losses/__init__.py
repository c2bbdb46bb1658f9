from mod_extraction_tpu.losses.losses import (
    l1_loss,
    mse_loss,
    esr_loss,
    dc_loss,
    first_derivative_l1_loss,
    second_derivative_l1_loss,
    log_mel_l1_loss,
    mr_stft_loss,
    get_loss_func_by_name,
    WeightedLossDict,
)

__all__ = [
    "l1_loss",
    "mse_loss",
    "esr_loss",
    "dc_loss",
    "first_derivative_l1_loss",
    "second_derivative_l1_loss",
    "log_mel_l1_loss",
    "mr_stft_loss",
    "get_loss_func_by_name",
    "WeightedLossDict",
]
