from mfm_tpu.optimizers.cocob import cocob

__all__ = ["cocob"]
