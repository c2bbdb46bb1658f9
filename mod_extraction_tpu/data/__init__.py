from mod_extraction_tpu.data.wav import wav_info, wav_read, wav_write, WavInfo

__all__ = ["wav_info", "wav_read", "wav_write", "WavInfo"]
